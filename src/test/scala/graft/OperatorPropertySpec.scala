package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Reactive, Sampling}

/** ScalaCheck property tests at the OPERATOR level: many random
  * per-key streams ride one DataFrame (key = case index), the
  * operator runs once, and every key's result is compared against a
  * plain-Scala reference implementation. Complements the DuckDB
  * oracle gate with adversarial shapes (empty keys, gap configs,
  * boundary ties) the fixed test tables don't contain. */
class OperatorPropertySpec extends AnyFunSuite {
  import TestSession._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("scalacheck generation failed"))

  /** (user_id, per-user value list) → events rows with globally
    * unique, per-user-ordered event ids; values exact at 2dp. */
  private def eventsDf(streams: Seq[Seq[Int]]) = {
    import spark.implicits._
    var id = 0L
    streams.zipWithIndex.flatMap { case (vals, uid) =>
      vals.map { v =>
        id += 1
        (id, new Timestamp(1700000000000L + id * 1000 + v),
          uid.toLong, "click", v * 0.25)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private val streamGen: Gen[Seq[Int]] =
    Gen.choose(0, 25).flatMap(k => Gen.listOfN(k, Gen.choose(0, 400)))

  test("property: buffer(count, skip) matches the index-arithmetic reference") {
    val streams = sample(streamGen, 30, 101L)
    val df = eventsDf(streams)
    for ((n, skip) <- Seq((3, 1), (4, 4), (2, 5), (5, 3))) {
      val got = Reactive.rxBufferCountSkip(df, n, skip)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("batch_id")) ->
          (r.getAs[Long]("batch_n"),
            r.getAs[java.math.BigDecimal]("batch_sum").doubleValue()))
        .toMap
      val expected = streams.zipWithIndex.flatMap { case (vals, uid) =>
        vals.indices
          .flatMap { p =>
            val bFirst = math.max(0L, math.ceil((p - n + 1).toDouble / skip).toLong)
            val bLast = math.floorDiv(p, skip).toLong
            (bFirst to bLast).map(b => (b, p))
          }
          .groupBy(_._1)
          .map { case (b, ps) =>
            (uid.toLong, b) -> (ps.size.toLong,
              ps.map(x => vals(x._2) * 0.25).sum)
          }
      }.toMap
      assert(got.keySet === expected.keySet, s"n=$n skip=$skip")
      got.foreach { case (k, (cnt, s)) =>
        assert(cnt === expected(k)._1, s"n=$n skip=$skip key=$k")
        assert(math.abs(s - expected(k)._2) < 1e-9, s"n=$n skip=$skip key=$k")
      }
    }
  }

  test("property: exhaustMap admission matches the greedy fold") {
    val streams = sample(streamGen, 30, 202L)
    val df = eventsDf(streams)
    val windowMs = 7000L
    val got = Reactive.rxExhaustMap(df, windowMs, "click")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
      .toSet
    // reference: per user, admit a trigger iff its ts is at-or-after
    // the last admitted trigger's window end
    val rows = df.select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
      .groupBy(_._1)
    val expected = rows.toSeq.flatMap { case (uid, rs) =>
      var end = Long.MinValue
      rs.sortBy(_._2).toSeq.flatMap { case (_, eid, t) =>
        if (t >= end) { end = t + windowMs; Some((uid, eid)) } else None
      }
    }.toSet
    assert(got === expected)
  }

  test("property: nearest as-of matches the brute-force reference") {
    val streams = sample(streamGen, 30, 303L)
    val df = eventsDf(streams)
    // odd event ids are "left" probes, even are "right" payloads
    val left = df.filter(col("event_id") % 2 === 1)
      .select("event_id", "user_id", "value")
    val right = df.filter(col("event_id") % 2 === 0)
      .select("event_id", "user_id", "value")
    val got = AsOf.joinDirectional(left, right, "user_id", "event_id",
        Seq("event_id"), "nearest")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_event_id")).map(_.asInstanceOf[Long]))
      .toMap
    val rights = right.collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = left.collect().map { r =>
      val (o, uid) = (r.getLong(0), r.getLong(1))
      val rs = rights.getOrElse(uid, Array.empty[Long])
      val b = rs.filter(_ <= o).lastOption
      val f = rs.find(_ >= o)
      val pick = (b, f) match {
        case (Some(bb), Some(ff)) =>
          if (o - bb <= ff - o) Some(bb) else Some(ff)
        case (bb, ff) => bb.orElse(ff)
      }
      o -> pick
    }.toMap
    assert(got === expected)
  }

  test("property: tolerance as-of matches the per-side-filtered reference") {
    val streams = sample(streamGen, 30, 505L)
    val df = eventsDf(streams)
    val left = df.filter(col("event_id") % 2 === 1)
      .select("event_id", "user_id", "value")
    val right = df.filter(col("event_id") % 2 === 0)
      .select("event_id", "user_id", "value")
    for (tol <- Seq(1L, 4L, 16L); dir <- Seq("backward", "forward", "nearest")) {
      val got = AsOf.joinDirectional(left, right, "user_id", "event_id",
          Seq("event_id"), dir, Some(tol))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Any]("asof_event_id")).map(_.asInstanceOf[Long]))
        .toMap
      val rights = right.collect().map(r => (r.getLong(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val expected = left.collect().map { r =>
        val (o, uid) = (r.getLong(0), r.getLong(1))
        val rs = rights.getOrElse(uid, Array.empty[Long])
        // pandas semantics: tolerance filters each side's candidate
        // BEFORE nearest picks among survivors
        val b = rs.filter(x => x <= o && o - x <= tol).lastOption
        val f = rs.find(x => x >= o && x - o <= tol)
        val pick = dir match {
          case "backward" => b
          case "forward" => f
          case "nearest" => (b, f) match {
            case (Some(bb), Some(ff)) =>
              if (o - bb <= ff - o) Some(bb) else Some(ff)
            case (bb, ff) => bb.orElse(ff)
          }
        }
        o -> pick
      }.toMap
      assert(got === expected, s"dir=$dir tol=$tol")
    }
  }

  test("property: samplePerKey keeps exactly the k md5-smallest ids") {
    val streams = sample(streamGen, 30, 404L)
    val df = eventsDf(streams)
    val k = 3
    val got = Sampling.samplePerKey(
        df.select("user_id", "event_id", "value"), "user_id", "event_id", k)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
      .toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = df.select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .flatMap { case (_, rs) =>
        rs.sortBy { case (_, eid) => (md5hex(eid.toString), eid) }.take(k).toSeq
      }.toSet
    assert(got === expected)
  }

  test("property: EWMA matches the sequential fold per key") {
    val streams = sample(streamGen, 30, 505L)
    val df = eventsDf(streams)
    val alpha = 0.25
    val got = Reactive.rxEwma(df, alpha).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma"))
      .toMap
    // plain-Scala reference: the same left fold, same IEEE sequence
    var id = 0L
    streams.foreach { vals =>
      var s = Double.NaN
      vals.foreach { v =>
        id += 1
        val x = v * 0.25
        s = if (s.isNaN) x else alpha * x + (1 - alpha) * s
        assert(got(id) === s, s"event $id")
      }
    }
    assert(got.size === streams.map(_.size).sum)
  }

  test("property: upsert is idempotent and keeps base keys complete") {
    import spark.implicits._
    val streams = sample(streamGen, 20, 606L)
    val base = streams.zipWithIndex
      .map { case (vs, i) => (i.toLong, vs.sum.toDouble) }
      .toDF("k", "v")
    val updates = streams.zipWithIndex.collect {
      case (vs, i) if i % 3 != 0 => (i.toLong + 10, vs.length.toDouble)
    }.toDF("k", "v")
    val once = graft.operators.MergeOps.upsert(base, updates, "k")
    // applying the same updates to the merged result changes nothing
    val twice = graft.operators.MergeOps.upsert(
      once.drop("merge_action"), updates, "k")
    val a = once.select("k", "v").collect().map(r =>
      r.getLong(0) -> r.getDouble(1)).toMap
    val b = twice.select("k", "v").collect().map(r =>
      r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
    // every base key and every update key appears exactly once
    assert(once.groupBy("k").count().filter(col("count") > 1).count() === 0)
    assert(once.count() ===
      (base.select("k").collect().map(_.getLong(0)).toSet ++
        updates.select("k").collect().map(_.getLong(0)).toSet).size)
  }

  test("property: snapshotDiff of a snapshot with itself is all-same") {
    import spark.implicits._
    val streams = sample(streamGen, 20, 707L)
    val snap = streams.zipWithIndex
      .map { case (vs, i) => (i.toLong, vs.mkString(",")) }
      .toDF("k", "t")
    val d = graft.operators.MergeOps.snapshotDiff(snap, snap, "k", Seq("t"))
    assert(d.filter(col("change") =!= "same").count() === 0)
    assert(d.count() === snap.count())
  }

  test("property: shuffleShard output is a permutation with balanced shards") {
    import spark.implicits._
    val ids = sample(Gen.choose(1L, 1000000L), 200, 808L).distinct
    val docs = ids.map(i => (i, "s")).toDF("doc_id", "source")
    val out = Sampling.shuffleShard(docs, nshards = 7).cache()
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      === ids.sorted.toArray)
    val sizes = out.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    out.unpersist()
  }

  test("property: HOF patience-fold LIS matches the O(n^2) DP " +
      "reference on random streams (ties included)") {
    // values 0..12 at 2dp force plenty of EQUAL values: the strict
    // LIS must never count ties as increases
    val streams = sample(
      Gen.choose(0, 25).flatMap(k => Gen.listOfN(k, Gen.choose(0, 12))),
      40, 909L).filter(_.nonEmpty)
    val df = eventsDf(streams)
    val got = Reactive.rxLis(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def lisRef(a: Seq[Double]): Long = {
      val dp = Array.fill(a.length)(1)
      for (j <- a.indices; i <- 0 until j if a(i) < a(j))
        dp(j) = math.max(dp(j), dp(i) + 1)
      if (dp.isEmpty) 0L else dp.max.toLong
    }
    streams.zipWithIndex.foreach { case (vals, uid) =>
      assert(got(uid.toLong) === lisRef(vals.map(_ * 0.25)),
        s"user $uid: $vals")
    }
  }

  test("property: Kendall tau counts match the brute-force pair " +
      "reference; tau_a bounded by |1e6|") {
    val streams = sample(
      Gen.choose(2, 25).flatMap(k => Gen.listOfN(k, Gen.choose(0, 15))),
      30, 910L)
    val df = eventsDf(streams)
    val got = Reactive.rxKendallTau(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(6)))).toMap
    streams.zipWithIndex.foreach { case (vals0, uid) =>
      val vals = vals0.takeRight(32).map(_ * 0.25)
      var (c, d) = (0L, 0L)
      for (j <- vals.indices; i <- 0 until j) {
        if (vals(i) < vals(j)) c += 1
        else if (vals(i) > vals(j)) d += 1
      }
      val np = vals.length.toLong * (vals.length - 1) / 2
      val tau = if (np > 0) (c - d) * 1000000L / np else 0L
      assert(got(uid.toLong) === ((c, d, tau)), s"user $uid")
      assert(math.abs(tau) <= 1000000L)
    }
  }

  test("property: BFD packing never exceeds capacity, packs every " +
      "doc exactly once, and never uses more bins than first-fit " +
      "needs items") {
    import spark.implicits._
    val sizes = sample(Gen.choose(1L, 9L), 60, 911L)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => ((i + 1).toLong, "s", n) }
      .toDF("doc_id", "source", "n_chars")
    val bfd = graft.operators.Packing
      .packBfd(docs, capacity = 10L, shards = 1).cache()
    assert(bfd.agg(max("bin_chars")).head().getLong(0) <= 10L)
    assert(bfd.agg(sum("n_docs")).head().getLong(0) === sizes.length)
    // lower bound: no packing beats ceil(total/capacity)
    val lb = (sizes.sum + 9) / 10
    assert(bfd.count() >= lb)
    bfd.unpersist()
  }
}
