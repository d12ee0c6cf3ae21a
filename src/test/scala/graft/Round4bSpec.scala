package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Graph, MergeOps, Reactive, Relational, Similarity, TextAnalysis}
import graft.sources.Tables

/** Round-4 additions: capped sessionization, windowed funnel,
  * weighted median, triangle enumeration, SCD-2 merge, unpivot,
  * bigram fluency, hybrid RRF retrieval. Exact semantics on
  * constructed micro-data; the driver gate additionally
  * hash-compares each against its DuckDB oracle at sf0.01. */
class Round4bSpec extends AnyFunSuite {
  import TestSession._

  private def evDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ms")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_millis(ms)").as("ts"))
  }

  test("rxSessionCapped splits on gap AND on session duration cap") {
    val min = 60000L
    // user 1: events every 29 min — no gap split (gap = 30 min),
    // but the 2-hour cap forces a split at the first event whose
    // offset from the session START exceeds 120 min (t=145min).
    // user 2: a 31-min silence splits by gap.
    val ev = evDf(Seq(
      (1L, 1L, 0L), (2L, 1L, 29 * min), (3L, 1L, 58 * min),
      (4L, 1L, 87 * min), (5L, 1L, 116 * min), (6L, 1L, 145 * min),
      (10L, 2L, 0L), (11L, 2L, 31 * min)))
    val out = Reactive.rxSessionCapped(ev,
        gapMs = 30 * min, capMs = 120 * min)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 2L, 10L -> 1L, 11L -> 2L))
  }

  test("rxSessionCapped: the cap clock restarts at each split") {
    val min = 60000L
    // splits at 125 min; the next event (t=180min) is only 55 min
    // into the NEW session — it must not split again
    val ev = evDf(Seq(
      (1L, 1L, 0L), (2L, 1L, 125 * min), (3L, 1L, 180 * min)))
    val out = Reactive.rxSessionCapped(ev,
        gapMs = 600 * min, capMs = 120 * min)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  private def funnelEv(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ms")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_millis(ms)").as("ts"))
  }

  test("rxFunnelWindowed only converts within the per-stage window") {
    val hour = 3600000L
    val ev = funnelEv(Seq(
      // user 1: full conversion inside 24h windows
      (1L, 1L, "view", 0L), (2L, 1L, "click", 2 * hour),
      (3L, 1L, "purchase", 5 * hour),
      // user 2: click arrives 25h after the view — window missed,
      // and the later purchase can't anchor on a null click
      (4L, 2L, "view", 0L), (5L, 2L, "click", 25 * hour),
      (6L, 2L, "purchase", 26 * hour),
      // user 3: click BEFORE the first view never counts
      (7L, 3L, "click", 0L), (8L, 3L, "view", 1 * hour)))
    val out = Reactive.rxFunnelWindowed(ev, windowMs = 24 * hour)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("rxWeightedMedian picks the smallest value reaching half the weight") {
    import spark.implicits._
    // weights = event_id % 10 + 1: ids 0,4,2 -> weights 1,5,3
    // total = 9; sorted by value: 10 (cumw=1, 2*1<9),
    // 20 (cumw=6, 2*6>=9) -> weighted median 20
    val ev = Seq((0L, 1L, 10.0), (4L, 1L, 20.0), (2L, 1L, 30.0))
      .toDF("event_id", "user_id", "value")
    val out = Reactive.rxWeightedMedian(ev).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(1) === 20.0)
    assert(out.head.getLong(2) === 9L)
  }

  test("trianglesTrade emits each triangle once, sorted, and only closed ones") {
    import spark.implicits._
    // trade edges: 1-2, 2-3, 1-3 (triangle), 3-4 (open wedge)
    val pairs = Seq((1, 2), (2, 3), (1, 3), (3, 4))
    val supplier = pairs.indices
      .map(i => (i.toLong, pairs(i)._1)).toDF("s_suppkey", "s_nationkey")
    val customer = pairs.indices
      .map(i => (i.toLong, pairs(i)._2)).toDF("c_custkey", "c_nationkey")
    val orders = pairs.indices
      .map(i => (i.toLong, i.toLong)).toDF("o_orderkey", "o_custkey")
    val lineitem = pairs.indices
      .map(i => (i.toLong, i.toLong)).toDF("l_orderkey", "l_suppkey")
    val out = Graph.trianglesTrade(lineitem, orders, customer, supplier)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 3L)))
  }

  test("scd2Upsert closes changed current rows, keeps history, inserts new keys") {
    import spark.implicits._
    val base = Seq(
      (1L, 10.0, 0L, Option.empty[Long]), // current, will change
      (2L, 5.0, 0L, Some(10L)),           // closed history row
      (2L, 6.0, 10L, Option.empty[Long]), // current, update is a no-op
      (3L, 7.0, 0L, Option.empty[Long]))  // current, no update
      .toDF("k", "v", "valid_from", "valid_to")
    val updates = Seq((1L, 20.0), (2L, 6.0), (4L, 9.0)).toDF("k", "v")
    val out = MergeOps.scd2Upsert(base, updates, "k", "v", asOf = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(out === Set(
      (1L, 10.0, 0L, 100L, false), (1L, 20.0, 100L, -1L, true),
      (2L, 5.0, 0L, 10L, false), (2L, 6.0, 10L, -1L, true),
      (3L, 7.0, 0L, -1L, true),
      (4L, 9.0, 100L, -1L, true)))
  }

  test("qUnpivot rows re-aggregate to the wide sums") {
    val out = Relational.qUnpivot(spark, sf)
    val flags = Tables.lineitem(spark, sf).select("l_returnflag")
      .distinct().count()
    assert(out.count() === flags * 4)
    val qty = out.filter(col("measure") === "quantity")
      .agg(sum("total")).head.getDouble(0)
    val direct = Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast(
        org.apache.spark.sql.types.DecimalType(18, 2))).cast("double"))
      .head.getDouble(0)
    assert(qty === direct)
  }

  test("bigramFluency: exact ppm means under the corpus bigram model") {
    import spark.implicits._
    // corpus: c2(a,b)=2, c2(b,a)=1, c2(a,c)=1; c1(a)=3, c1(b)=1
    // doc 1 = (666666 + 1000000 + 666666) div 3 = 777777
    // doc 2 = 333333; a 1-token doc contributes nothing
    val docs = Seq(
      (1L, "a b a b", "en", "s1", 7L),
      (2L, "a c", "en", "s1", 3L),
      (3L, "z", "en", "s1", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bigramFluency(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 3L, 777777L), (2L, 1L, 333333L)))
  }

  test("hybridRrf fuses ranks with integer RRF; single-list docs score one term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark engine", "en", "s1", 18L),
      (2L, "spark runs", "en", "s1", 10L),
      (3L, "plain text here", "en", "s1", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 0), // query vector
      (1L, Array(1.0f, 0.0f), 0), // cos 1.0 -> vec rank 1
      (2L, Array(0.0f, 1.0f), 0), // cos 0.0 -> cut at k=2
      (3L, Array(0.9f, 0.1f), 0)  // cos ~0.99 -> vec rank 2
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hybridRrf(docs, embs, Seq("spark"), k = 2)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    // lex: doc 1 (tf=2) rank 1, doc 2 rank 2; doc 3 has no term
    // rrf: 1000000 div 61 = 16393, div 62 = 16129
    assert(out === Set(
      (1L, 1L, 1L, 16393L + 16393L),
      (2L, 2L, -1L, 16129L),
      (3L, -1L, 2L, 16129L)))
  }

  test("rxRateLimit: bursts drain the bucket, refill restores admission") {
    val sec = 1000L
    // cap 3 tokens, refill 2 micro/ms = 1 token per 500 s.
    // burst of 4 at t=0..3s: first 3 admitted (bucket empties), 4th
    // rejected; at t=503s one token has refilled -> admitted again
    val ev = evDf(Seq(
      (1L, 1L, 0L), (2L, 1L, 1 * sec), (3L, 1L, 2 * sec),
      (4L, 1L, 3 * sec), (5L, 1L, 503 * sec)))
    val out = Reactive.rxRateLimit(ev)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
  }

  test("rxRateLimit: the bucket never exceeds capacity after long idling") {
    val day = 86400000L
    // a day of idle would refill 172.8 tokens uncapped; capacity
    // clamps to 3, so a 4-burst still rejects the 4th
    val ev = evDf(Seq(
      (1L, 1L, 0L), (2L, 1L, day), (3L, 1L, day + 1), (4L, 1L, day + 2),
      (5L, 1L, day + 3)))
    val out = Reactive.rxRateLimit(ev)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> true, 5L -> false))
  }

  test("qEquiWidth buckets cover all rows and respect width bounds") {
    val out = Relational.qEquiWidth(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total === Tables.orders(spark, sf).count())
    val stats = Tables.orders(spark, sf)
      .agg(min("o_totalprice"), max("o_totalprice")).head
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
    val width = (hi - lo) / 10.0
    out.foreach { r =>
      val b = r.getLong(0)
      assert(b >= 0 && b <= 9)
      // each bucket's observed values sit inside its nominal range
      // (right edge open except the last bucket)
      assert(r.getDouble(2) >= lo + b * width - 1e-9)
      assert(r.getDouble(3) <= lo + (b + 1) * width + 1e-9 ||
        b == 9)
    }
  }

  test("rxSessionCapped shuffles once on user_id (secondary-sort scan)") {
    val p = Reactive.rxSessionCapped(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex === 1, s"expected exactly 1 exchange:\n$p")
  }
}
