package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, Kernels}

/** Custom Catalyst expression kernels: determinism, known values,
  * and interpreted-vs-codegen agreement (the DataFrame path runs
  * codegen; calling Kernels directly is the interpreted reference).
  */
class FunctionsSpec extends AnyFunSuite {
  import TestSession._

  test("simhash64: identical token sets hash identically, disjoint differ") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("spark", "window", "join", "agg")),
      (2L, Seq("spark", "window", "join", "agg")),
      (3L, Seq("zebra", "yak", "xenon", "walrus"))
    ).toDF("id", "toks")
      .select(col("id"), GraftFunctions.simhash64(col("toks")).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
  }

  test("simhash64: near-identical token lists land within small hamming") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i")
    val df = Seq((1L, base), (2L, base.updated(5, "CHANGED")))
      .toDF("id", "toks")
      .select(col("id"), GraftFunctions.simhash64(col("toks")).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 16)
  }

  test("cosine_sim matches a scala-side reference computation") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.cosine_sim(col("a"), col("b")))
      .head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("cosine_sim is 1 on self, 0 on zero vector") {
    import spark.implicits._
    val v = Array(0.3f, -0.7f, 2.2f)
    val z = Array(0.0f, 0.0f, 0.0f)
    val rows = Seq((v, v, z)).toDF("a", "b", "z")
      .select(GraftFunctions.cosine_sim(col("a"), col("b")).as("self"),
        GraftFunctions.cosine_sim(col("a"), col("z")).as("zero"))
      .head
    assert(math.abs(rows.getDouble(0) - 1.0) < 1e-12)
    assert(rows.getDouble(1) === 0.0)
  }

  test("rhp_lsh: equal vectors share buckets; bits bounded by planes") {
    import spark.implicits._
    val v1 = Array.tabulate(16)(i => (i * 0.37f) - 2f)
    val df = Seq((1L, v1), (2L, v1)).toDF("id", "v")
      .select(col("id"), GraftFunctions.rhp_lsh(col("v"), 8).as("b"))
    val bs = df.collect().map(_.getLong(1))
    assert(bs(0) === bs(1))
    assert(bs.forall(b => b >= 0 && b < 256))
  }

  test("kernels are deterministic across calls (hash-derived planes)") {
    val arr = Array(0.5f, -1.5f, 2.5f, 0.1f)
    val d1 = Kernels.cosine(toArrayData(arr), toArrayData(arr.map(_ * 2f)))
    val d2 = Kernels.cosine(toArrayData(arr), toArrayData(arr.map(_ * 2f)))
    assert(d1 === d2)
    assert(math.abs(d1 - 1.0) < 1e-12) // scaled vector keeps cosine 1
  }

  private def toArrayData(a: Array[Float]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a)
}
