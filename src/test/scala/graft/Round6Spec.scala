package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.sources.Tables

/** Round-6 additions: scaled-BIGINT money-sum fast path parity. */
class Round6Spec extends AnyFunSuite {
  import TestSession._

  private def withFastSums[A](on: Boolean)(body: => A): A = {
    val key = "spark.graft.fastMoneySums"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("fastMoneySums: q1/q6 value parity between DECIMAL and BIGINT routes") {
    // the two routes differ ONLY in the aggregation buffer; totals
    // must agree to the exact decimal VALUE (types legitimately
    // differ: DECIMAL(28,2) sum vs DECIMAL(38,2) reconstruction, so
    // compare with compareTo, not equals)
    def snapshot() = {
      val q1 = Relational.q1PricingSummary(spark, sf)
        .orderBy("l_returnflag", "l_linestatus").collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getDecimal(2).stripTrailingZeros,
          r.getDecimal(3).stripTrailingZeros,
          r.getDecimal(4).stripTrailingZeros,
          r.getDecimal(5).stripTrailingZeros,
          r.getDouble(6), r.getLong(7)))
      val q6 = Relational.q6Revenue(spark, sf).collect()
        .map(r => r.getDecimal(0).stripTrailingZeros)
      (q1.toSeq, q6.toSeq)
    }
    val slow = withFastSums(false)(snapshot())
    val fast = withFastSums(true)(snapshot())
    assert(slow === fast)
    assert(slow._1.nonEmpty && slow._1.head._8 > 0)
  }

  test("money_scaled ≡ the decimal cast, per row, on adversarial and random doubles") {
    import spark.implicits._
    // 8.165 is the canonical trap: its double prints "8.165" so the
    // decimal cast rounds HALF_UP to 8.17 (817 cents), while raw
    // binary arithmetic sees 816.4999... and a floor(x*100+0.5)
    // shortcut yields 816. The kernel must track the CAST semantics
    // on every row, every scale.
    val rng = new scala.util.Random(42)
    val traps = Seq(8.165, 2.675, 1.005, 0.115, 123.455, 0.01,
      99999.995, -8.165, -2.675, 0.0, 1e-9, -1e-9, 1.23456789e7,
      4.9e-16, 12345678901.235)
    val vals = traps ++ Seq.fill(20000)(
      (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(9)))
    val df = vals.toDF("v")
    for (sc <- Seq(2, 4, 6)) {
      val pow = math.pow(10, sc).toLong
      val bad = df.select(col("v"),
          graft.functions.GraftFunctions.money_scaled(col("v"), sc)
            .as("fast"),
          (col("v").cast(org.apache.spark.sql.types.DecimalType(18, sc))
            * pow).cast("long").as("exact"))
        .filter(col("fast") =!= col("exact"))
        .collect()
      assert(bad.isEmpty,
        s"scale $sc divergence: ${bad.take(5).mkString(", ")}")
    }
    // kernel-level trap check, no Spark in the loop
    assert(graft.functions.Kernels.moneyScaled(8.165, 2) === 817L)
    assert(graft.functions.Kernels.moneyScaled(-8.165, 2) === -817L)
    assert(math.floor(8.165 * 100 + 0.5).toLong === 816L,
      "the trap must actually trap the naive shortcut")
  }

  test("robustScale: approx-percentile scale path parity with the exact route") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val embs = Tables.embeddings(spark, sf)
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
    val exact = collectMap(Similarity.robustScale(embs))
    val approx = collectMap(Similarity.robustScale(embs, exact = false))
    assert(exact.keySet === approx.keySet)
    // percentile_approx returns an actual sample (no interpolation),
    // so even with accuracy >> n the routes differ by up to the local
    // inter-sample gap around each quartile — bounded drift, not
    // equality, is the production contract
    val worst = exact.map { case (k, v) => math.abs(v - approx(k)) }.max
    assert(worst < 0.15, s"approx percentile drifted: $worst")
    val mean = exact.map { case (k, v) => math.abs(v - approx(k)) }.sum /
      exact.size
    assert(mean < 0.02, s"mean drift too large: $mean")
  }

  test("cappedAssign: every vector assigned, no cluster above cap, caps bind") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val embs = Tables.embeddings(spark, sf)
    val n = embs.count()
    val nlist = 16
    val cap = (n * 5 + 4 * nlist - 1) / (4 * nlist)
    val a = Similarity.cappedAssign(embs, nlist).collect()
    assert(a.length.toLong === n, "fixed rounds must empty the corpus here")
    assert(a.map(_.getLong(0)).distinct.length.toLong === n)
    val sizes = a.groupBy(_.getLong(1)).map(_._2.length.toLong)
    assert(sizes.max <= cap, s"cluster above cap: ${sizes.max} > $cap")
    // the cap must actually bind (otherwise the test proves nothing):
    // at least one vector was deflected off its first choice
    assert(a.exists(_.getLong(3) > 1L), "no spill — cap never bound")
  }
}
