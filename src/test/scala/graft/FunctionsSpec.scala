package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, Kernels}
import graft.operators.Similarity

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

  test("dot_product is the exact index-order left fold (MIPS score)") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = a.zip(b)
      .foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val got = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.dot_product(col("a"), col("b")))
      .head.getDouble(0)
    assert(got === expected)
    // reachable from SQL like the rest of the kernel family
    GraftSql.registerFunctions(spark)
    val viaSql = Seq((a, b)).toDF("a", "b").createOrReplaceTempView("dp_t")
    assert(spark.sql("SELECT dot_product(a, b) FROM dp_t")
      .head.getDouble(0) === expected)
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

  test("md5_minhash_bands: band key matches the SQL-re-derivable affine family") {
    import spark.implicits._
    // one shingle, 1 band x 2 rows: independent reference computation
    // of g_j = (a_j*h + b_j) mod (2^31-1) with h / a_j / b_j parsed
    // from md5 hex prefixes — exactly what the DuckDB oracle evaluates
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def p60(s: String) = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val p = 2147483647L
    val h = java.lang.Long.parseLong(md5hex("a b c").take(7), 16)
    def g(j: Int) = ((1 + p60("a:" + j) % (p - 1)) * h + p60("b:" + j) % p) % p
    val expected = p60(s"${g(0)}|${g(1)}") // 60-bit md5 prefix of the minima join
    val got = Seq(Tuple1(Seq("a b c"))).toDF("sh")
      .select(GraftFunctions.md5_minhash_bands(col("sh"), 1, 2).as("b"))
      .collect().head.getSeq[Long](0)
    assert(got === Seq(expected))
  }

  test("md5_simhash60: single token signature IS its 60-bit md5 prefix") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("spark".getBytes("UTF-8")).map(b => f"$b%02x")
      .mkString.take(15)
    val expected = java.lang.Long.parseLong(hex, 16)
    val got = Seq(Tuple1(Seq("spark"))).toDF("toks")
      .select(GraftFunctions.md5_simhash60(col("toks")).as("sig"))
      .collect().head.getLong(0)
    assert(got === expected)
    assert((got >>> 60) === 0L) // signed-BIGINT-safe in any engine
  }

  test("md5_rhp_lsh: deterministic, bounded by planes, scale-invariant") {
    import spark.implicits._
    val v = Array(0.5f, -1.5f, 2.5f, 0.1f)
    val df = Seq((1L, v), (2L, v), (3L, v.map(_ * 3f))).toDF("id", "e")
      .select(col("id"), GraftFunctions.md5_rhp_lsh(col("e"), 6).as("b"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) === m(3L)) // positive scaling preserves every sign bit
    assert(m(1L) >= 0L && m(1L) < 64L)
  }

  test("cosine_argmax picks the nearest centroid, ties to lowest id") {
    import spark.implicits._
    val cents = Seq(
      (5L, Array(1.0f, 0.0f)),  // cos 1 with (2, 0)
      (2L, Array(0.0f, 1.0f)),  // orthogonal
      (9L, Array(2.0f, 0.0f))   // also cos 1 — tie, higher id loses
    )
    val df = Seq(Tuple1(Array(2.0f, 0.0f))).toDF("e")
      .crossJoin(Seq(Tuple1(cents)).toDF("cents"))
      .select(GraftFunctions.cosine_argmax(col("e"),
        col("cents").cast("array<struct<centroid_id:bigint,c_emb:array<float>>>"))
        .as("cid"))
    assert(df.collect().head.getLong(0) === 5L)
  }

  test("quantize_audit matches the HOF reference formula bit-for-bit") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.37f, -1.2f, 127.3f, 0.0f, -0.004f)),
      (2L, Array(-3.5f, 3.5f, 1.75f, -1.75f, 0.875f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f, 0.0f))) // all-zero: excluded
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeAudit(vecs).orderBy("vec_id").collect()
    // HOF reference (the pre-kernel formulation)
    val ref = vecs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xs"))
      .withColumn("max_abs", array_max(transform(col("xs"), x => abs(x))))
      .filter(col("max_abs") > 0)
      .withColumn("scale", col("max_abs") / 127.0)
      .withColumn("qerr", transform(col("xs"), x =>
        abs(x - greatest(lit(-127.0),
          least(lit(127.0), floor(x / col("scale") + 0.5)))
          * col("scale"))))
      .select(col("vec_id"), col("scale"),
        aggregate(col("qerr"), lit(0L),
          (acc, e) => acc + floor(e * 1e9).cast("long")).as("abs_err_scaled"),
        floor(array_max(col("qerr")) * 1e9).cast("long").as("max_err_scaled"))
      .orderBy("vec_id").collect()
    assert(got.length === 2)
    assert(got.map(_.toSeq) === ref.map(_.toSeq))
  }

  private def toArrayData(a: Array[Float]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a)
}
