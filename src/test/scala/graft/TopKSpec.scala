package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK
import graft.sources.Tables

/** Custom heap-based top-k operator vs the window-based reference. */
class TopKSpec extends AnyFunSuite {
  import TestSession._

  test("custom operator matches the window-based top-k exactly") {
    val p = Tables.part(spark, sf)
    val custom = TopK.topKPerGroup(p, Seq(col("p_brand")),
        struct(negate(col("p_retailprice")), col("p_partkey")), 3,
        ascending = true)
      .select("p_brand", "p_partkey", "p_retailprice")
    val reference = graft.operators.Relational.qTopkPerGroup(spark, sf)
      .select("p_brand", "p_partkey", "p_retailprice")
    assert(custom.count() === reference.count())
    assert(custom.exceptAll(reference).count() === 0)
    assert(reference.exceptAll(custom).count() === 0)
  }

  test("plan uses TopKPerGroupExec with a single hash exchange, no sort") {
    val p = Tables.part(spark, sf)
    val df = TopK.topKPerGroup(p, Seq(col("p_brand")),
      struct(negate(col("p_retailprice")), col("p_partkey")), 3,
      ascending = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerGroup"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("k larger than any group returns every row") {
    val p = Tables.part(spark, sf)
    val all = TopK.topKPerGroup(p, Seq(col("p_brand")),
      struct(negate(col("p_retailprice")), col("p_partkey")), 1000000,
      ascending = true)
    assert(all.count() === p.count())
  }
}
