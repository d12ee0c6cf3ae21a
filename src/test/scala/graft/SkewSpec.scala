package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends AnyFunSuite {
  import TestSession._

  test("salted join returns exactly the rows of the plain join") {
    val ev = Tables.events(spark, sf)
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_n"))
    val plain = ev.join(dim, Seq("user_id"))
      .select("event_id", "user_id", "user_n")
    val salted = Skew.saltedJoin(ev, dim, "user_id",
      saltFrom = col("event_id"), salts = 8)
      .select("event_id", "user_id", "user_n")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted aggregation equals the direct aggregation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        // exact integer payload so the two aggregation orders are
        // trivially comparable (the decimal-routing rules cover sums
        // of doubles; salting itself is value-agnostic)
        (col("event_id") % 97).as("v"))
    val direct = ev.groupBy("user_id")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(ev, "user_id", "v",
      saltFrom = col("event_id"), salts = 8)
    assert(salted.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(salted).count() === 0)
  }

  test("salt actually spreads a hot key over multiple sub-keys") {
    val ev = Tables.events(spark, sf)
    val spread = ev
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8)))
      .groupBy("user_id").agg(countDistinct("_salt").as("n_salts"))
      .agg(min("n_salts")).head.getLong(0)
    assert(spread > 1, "every user's rows should span multiple salts")
  }
}
