package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Round-5 ops: canonical text normalization and normalized exact
  * dedup. Exact semantics on constructed corpora; the driver gate
  * additionally hash-compares each against its DuckDB oracle at
  * sf0.01. */
class Round5Spec extends AnyFunSuite {
  import TestSession._

  test("normalize strips markup, folds case, collapses whitespace runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello   <b>World</b>", "en", "s1", 20L),
      (2L, "hello world", "en", "s1", 11L),
      (3L, "line one\n\tline  two ", "en", "s1", 20L),
      (4L, "untouched", "en", "s1", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.normalize(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(5)))
      .toSet
    assert(out === Set(
      (1L, "hello world", 1L),
      (2L, "hello world", 0L),
      (3L, "line one line two", 1L),
      (4L, "untouched", 0L)))
  }

  test("normalize keeps \\x0B intact: the explicit class, not Java's \\s") {
    import spark.implicits._
    // Java \s matches \x0B, RE2's does not; the op pins the RE2-safe
    // explicit class so the oracle agrees byte-for-byte
    val docs = Seq((1L, "a\u000Bb", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val norm = TextAnalysis.normalize(docs).select("norm_text").head.getString(0)
    assert(norm === "a\u000Bb")
  }

  test("dedupNormalized clusters case/markup/spacing variants; exact dedup does not") {
    import spark.implicits._
    val docs = Seq(
      (10L, "The  Quick <i>Fox</i>", "en", "s1", 21L),
      (11L, "the quick fox", "en", "s1", 13L),
      (12L, "THE QUICK FOX", "en", "s1", 13L),
      (13L, "another doc", "en", "s1", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = TextAnalysis.dedupNormalized(docs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(clusters === Set((10L, 3L), (13L, 1L)))
    // exact dedup's lower(trim()) folds case (11≡12) but not markup
    // or inner spacing, so it still sees 3 distinct contents
    assert(graft.operators.Dedup.exact(docs).count() === 3L)
  }

  test("quantileSketch: bottom-k samples merge losslessly (KMV property)") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val k = 32
    // the k-smallest-md5 sample of the whole corpus equals re-sampling
    // the union of per-half samples: fixed-size mergeable state, the
    // property that lets 1000 executors each keep k rows and a final
    // reduce recover the exact global sample
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val merged = Sampling.samplePerKey(
      Sampling.samplePerKey(half1, "source", "doc_id", k)
        .unionByName(Sampling.samplePerKey(half2, "source", "doc_id", k)),
      "source", "doc_id", k)
      .select("source", "doc_id")
    val whole = Sampling.samplePerKey(docs, "source", "doc_id", k)
      .select("source", "doc_id")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("quantileSketch estimates are ordered ranks inside the value range") {
    import graft.operators.Sketches
    val docs = Tables.documents(spark, sf)
    val out = Sketches.quantileSketch(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p90, p99) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99,
        s"quantile estimates must be monotone: $r")
    }
  }

  test("normalize/dedupNormalized stay shuffle-minimal on the real table") {
    val docs = Tables.documents(spark, sf)
    // per-doc normalization is a pure map: zero exchanges
    val normPlan = TextAnalysis.normalize(docs)
      .queryExecution.executedPlan.toString
    assert(!normPlan.contains("Exchange"),
      s"normalize shuffled:\n$normPlan")
    // normalized dedup shuffles exactly once (the content-hash agg);
    // text itself never rides the exchange — only (hash, doc_id)
    val dedupPlan = TextAnalysis.dedupNormalized(docs)
      .queryExecution.executedPlan.toString
    assert(dedupPlan.split("Exchange").length - 1 === 1,
      s"dedupNormalized should shuffle exactly once:\n$dedupPlan")
    assert(!dedupPlan.linesIterator
        .filter(_.contains("Exchange")).mkString.contains("norm_text"),
      "normalized text must not ride the shuffle")
  }

  private def mkEvents(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.map { case (id, ms, u, t, v) =>
      (id, new java.sql.Timestamp(ms), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("rxTransitions counts consecutive pairs per key; micro-probs sum to ~1e6 per state") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "A", 0.0), (2L, 1L, 1L, "B", 0.0),
      (3L, 2L, 1L, "A", 0.0), (4L, 3L, 1L, "C", 0.0),
      (5L, 0L, 2L, "B", 0.0), (6L, 1L, 2L, "A", 0.0)))
    val out = Reactive.rxTransitions(ev)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // user 1: A→B, B→A, A→C; user 2: B→A. No cross-user transition.
    assert(out === Map(
      ("A", "B") -> (1L, 500000L), ("A", "C") -> (1L, 500000L),
      ("B", "A") -> (2L, 1000000L)))
  }

  test("rxTwap weights each value by its live duration, dropping zero-length segments") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "m", 10.0), (2L, 1000L, 1L, "m", 20.0),
      (3L, 1000L, 1L, "m", 77.0), // supersedes 20 within the same ms
      (4L, 3000L, 1L, "m", 99.0))) // last observation: no segment
    val r = Reactive.rxTwap(ev).head
    assert(r.getAs[Long]("n_segments") === 2L)
    assert(r.getAs[Long]("span_ms") === 3000L)
    // (10*1000 + 77*2000) / 3000 — the 20 tick was live for 0 ms
    assert(math.abs(r.getAs[Double]("twap") - 164000.0 / 3000.0) < 1e-12)
  }

  test("qSkyline equals the brute-force dominance filter on the real table") {
    import graft.operators.Relational
    val part = Tables.part(spark, sf).select("p_partkey", "p_retailprice", "p_size")
    val rows = part.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = rows.filter { case (_, pr, sz) =>
      !rows.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz) }
    }.map(_._1).toSet
    val got = Relational.qSkyline(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
    // the running-max decomposition must not create a full-table
    // single-partition sort: only the per-partition-maxima frame
    // (<= one row per range partition) may hit a global window
    val plan = Relational.qSkyline(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangePartitioning") || plan.contains("rangepartitioning"),
      s"champions should range-repartition:\n$plan")
  }

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("keywords ranks rare repeated terms above corpus-wide ones") {
    val docs = mkDocs(Seq(
      (1L, "zebra zebra common common common"),
      (2L, "common stuff here"),
      (3L, "common stuff also")))
    val out = TextAnalysis.keywords(docs, k = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"))).toMap
    // doc 1: zebra tf=2 df=1 → 2e6; common tf=3 df=3 → 1e6
    assert(out(1L) === "zebra")
    // stopwords and short tokens never surface
    val all = TextAnalysis.keywords(docs, k = 3).collect().map(_.getAs[String]("term"))
    assert(!all.exists(t => t.length < 3 || Seq("the", "and").contains(t)))
  }

  test("rxRollingActives: trailing 7-day distinct actives via contribution explosion") {
    import graft.operators.Reactive
    val day = 86400000L
    // user 1 active days 0 and 2; user 2 active day 8 only
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 5L, 1L, "a", 0.0), // same day dup
      (3L, 2 * day, 1L, "a", 0.0), (4L, 8 * day, 2L, "a", 0.0)))
    val out = Reactive.rxRollingActives(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // day 8 window covers days 2..8: user 1 (day 2) and user 2 → 2
    assert(out(8L) === 2L)
    // day 2 window covers days -4..2: only user 1, counted ONCE
    assert(out(2L) === 1L)
    // windows never extend past the last observed day
    assert(out.keys.max === 8L)
    // user 1's day-0 presence stops contributing after day 6
    assert(out(7L) === 1L) // only day-2 presence remains
  }

  test("rxStreaks finds the longest consecutive-day run, earliest on ties") {
    import graft.operators.Reactive
    val day = 86400000L
    // user 1: days 0,1,2 then 5,6 → longest 3 starting day 0
    // user 2: days 1,2 and 9,10 → tie of 2, earliest (day 1) wins
    val ev = mkEvents(
      Seq(0L, 1L, 2L, 5L, 6L).zipWithIndex.map { case (d, i) =>
        (i.toLong, d * day, 1L, "a", 0.0) } ++
      Seq(1L, 2L, 9L, 10L).zipWithIndex.map { case (d, i) =>
        (10L + i, d * day + 30, 2L, "a", 0.0) })
    val out = Reactive.rxStreaks(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((3L, 0L, 2L)))
    assert(out(2L) === ((2L, 1L, 2L)))
  }

  test("qPeriodGrowth: exact cents revenue, ppm growth, null first period") {
    import graft.operators.Relational
    val rows = Relational.qPeriodGrowth(spark, sf).orderBy("ym").collect()
    assert(rows.length > 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev_cents")))
    // every later row links to its predecessor's revenue exactly
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(b.fieldIndex("prev_cents")) ===
        a.getLong(a.fieldIndex("rev_cents")))
      val expect = (b.getLong(1) - b.getLong(2)) * 1000000L / b.getLong(2)
      assert(b.getLong(b.fieldIndex("growth_ppm")) === expect)
    }
  }

  test("qCorrMatrix agrees with corr() and is a single-scan single-exchange plan") {
    import graft.operators.Relational
    val out = Relational.qCorrMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out.size === 6)
    val li = Tables.lineitem(spark, sf)
    out.foreach { case ((a, b), r) =>
      assert(r >= -1.0 && r <= 1.0)
      val ref = li.agg(corr(col(a), col(b))).head.getDouble(0)
      assert(math.abs(r - ref) < 1e-6, s"$a x $b: $r vs $ref")
    }
    val plan = Relational.qCorrMatrix(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"moment agg should be the only exchange:\n$plan")
  }

  test("bpePairs counts adjacent char pairs weighted by occurrences; non-ascii words excluded") {
    val docs = mkDocs(Seq(
      (1L, "abab abab"), // 2x: ab, ba, ab
      (2L, "ab café")))  // café excluded (non-ascii)
    val out = TextAnalysis.bpePairs(docs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("ab" -> 5L, "ba" -> 2L))
  }

  test("rxCusum: drawdown identity equals the sequential max(0, S+d) recurrence") {
    import graft.operators.Reactive
    // hand case: ref = floor-mean 2000c; S = 0, 1000, 1000
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "m", 10.0), (2L, 1L, 1L, "m", 30.0),
      (3L, 2L, 1L, "m", 20.0)))
    val s = Reactive.rxCusum(ev).orderBy("event_id")
      .collect().map(_.getAs[Long]("cusum_cents")).toSeq
    assert(s === Seq(0L, 1000L, 1000L))
    // property: on a mixed-key series the window form must equal the
    // textbook recurrence replayed sequentially per key
    val vals = Seq.tabulate(60)(i =>
      ((i + 1).toLong, i.toLong, (i % 3).toLong, "m",
        ((i * 37) % 200 + (if (i % 7 == 0) 500 else 0)).toDouble))
    val out = Reactive.rxCusum(mkEvents(vals), alarmCents = 20000L)
      .collect().map(r => (r.getLong(1), r.getLong(0)) ->
        ((r.getAs[Long]("cusum_cents"), r.getAs[Boolean]("alarm")))).toMap
    vals.groupBy(_._3).foreach { case (u, rows) =>
      val xs = rows.sortBy(_._1).map(v => (v._5 * 100).round)
      val ref = xs.sum / xs.length // floor mean in cents
      var st = 0L
      rows.sortBy(_._1).zip(xs).foreach { case (r, x) =>
        st = math.max(0L, st + (x - ref))
        assert(out((u, r._1)) === ((st, st > 20000L)),
          s"user $u event ${r._1}")
      }
    }
  }

  test("rxAttribution credits the last preceding non-purchase touch, else 'direct'") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "click", 0.0), (2L, 1L, 1L, "purchase", 10.0),
      (3L, 2L, 1L, "purchase", 5.0),   // still click: purchases don't re-touch
      (4L, 3L, 1L, "signup", 0.0), (5L, 4L, 1L, "purchase", 2.5),
      (6L, 0L, 2L, "purchase", 7.0))) // no prior touch → direct
    val out = Reactive.rxAttribution(ev)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(
      "click" -> ((2L, 1500L)), "signup" -> ((1L, 250L)),
      "direct" -> ((1L, 700L))))
  }

  test("boilerplate: top-df grams by distinct docs; per-doc coverage in exact ppm") {
    val docs = mkDocs(Seq(
      (1L, "a b c d e f"), // grams: "a b c d e", "b c d e f"
      (2L, "a b c d e"),
      (3L, "x y z w v"),
      (4L, "tiny")))       // <5 tokens → excluded
    val out = TextAnalysis.boilerplate(docs, topK = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // df: "a b c d e" in 2 docs, others in 1 → top1 is "a b c d e"
    assert(out === Map(
      1L -> ((2L, 1L, 500000L)),
      2L -> ((1L, 1L, 1000000L)),
      3L -> ((1L, 0L, 0L))))
    // the raw text column must never ride an exchange
    val plan = TextAnalysis.boilerplate(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.linesIterator.filter(_.contains("Exchange"))
        .mkString.contains("text#"),
      s"text must not ride a shuffle:\n$plan")
  }

  test("qBasketPairs: grouped emission equals the brute-force pair count; no self-join") {
    import graft.operators.Relational
    import graft.sources.Tables
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val rows = li.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = rows.groupBy(_._1).values
      .flatMap(b => b.map(_._2).distinct.sorted.combinations(2)
        .map(c => (c(0), c(1))))
      .toSeq.groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
    val expectTop = brute.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(100).toMap
    val got = Relational.qBasketPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === expectTop)
    // grouped emission: the plan must not join the fact to itself
    val plan = Relational.qBasketPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"basket pairs must not self-join:\n$plan")
  }

  test("rxPaths: depth-3 prefix paths in event order, frequency-ranked") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 1L, 1L, "click", 0.0),
      (3L, 2L, 1L, "purchase", 0.0), (4L, 3L, 1L, "error", 0.0),
      (5L, 0L, 2L, "view", 0.0), (6L, 1L, 2L, "click", 0.0),
      (7L, 2L, 2L, "purchase", 0.0),
      (8L, 0L, 3L, "view", 0.0))) // short history → short path
    val out = Reactive.rxPaths(ev)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(
      ("view>click>purchase", 2L), ("view", 1L)))
  }

  test("rxSurvival: signup→purchase hazard table with horizon censoring") {
    import graft.operators.Reactive
    val day = 86400000L
    val ev = mkEvents(Seq(
      // user 1: signup day 0, purchase day 2 → event at t=2
      (1L, 0L, 1L, "signup", 0.0), (2L, 2 * day, 1L, "purchase", 5.0),
      // user 2: purchase BEFORE signup doesn't count; censored at
      // horizon (day 4) → duration 4, no event
      (3L, 0L, 2L, "purchase", 1.0), (4L, 0L, 2L, "signup", 0.0),
      // user 3: signup day 1, purchase day 3 → event at t=2
      (5L, 1 * day, 3L, "signup", 0.0), (6L, 3 * day, 3L, "purchase", 2.0),
      // user 4: no signup → excluded entirely; sets horizon day 4
      (7L, 4 * day, 4L, "click", 0.0)))
    val out = Reactive.rxSurvival(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // only day 2 carries events: at risk = all 3 tracked users
    // (user 2 is censored at day 4, still at risk on day 2),
    // events = 2 → hazard 2e6 div 3 = 666666 ppm
    assert(out === Map(2L -> ((3L, 2L, 666666L))))
  }

  test("dedupSemantic: cluster-then-prune drops within-cluster near-dups; star cap degrades honestly") {
    import graft.operators.Dedup
    import spark.implicits._
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),      // centroid 0
      (1L, Seq(0.0f, 1.0f), 1),      // centroid 1
      (2L, Seq(1.0f, 0.01f), 0),     // ≈ c0 → dup of 0
      (3L, Seq(0.01f, 1.0f), 1),     // ≈ c1 → dup of 1
      (4L, Seq(-1.0f, 0.5f), 1),     // cluster 1 but dissimilar → kept
      (5L, Seq(0.7f, -0.714f), 0),   // cluster 0 but dissimilar → kept
      (7L, Seq(0.6f, 0.8f), 1),      // near-dup PAIR inside cluster 1,
      (8L, Seq(0.61f, 0.79f), 1))    //  neither close to the rep
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.dedupSemantic(embs, nclusters = 2, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(2L -> ((0L, 0L)), 3L -> ((1L, 1L)),
      8L -> ((1L, 7L))))
    // star degradation: cluster 1 = {1,3,4,7,8} over the cap → only
    // rep-vs-member pairs remain, so the (7,8) duplicate is missed
    // (the documented trade) while rep-duplicates survive
    val capped = Dedup.dedupSemantic(embs, nclusters = 2,
        minCosine = 0.9, maxCluster = 2)
      .collect().map(_.getLong(0)).toSet
    assert(capped === Set(2L, 3L))
  }

  test("whitenEmbeddings: per-dim mean ~0 / var ~1 on the real corpus; constant dims to 0") {
    import graft.operators.Similarity
    import graft.sources.Tables
    import spark.implicits._
    val out = Similarity.whitenEmbeddings(Tables.embeddings(spark, sf))
    val stats = out.groupBy("dim")
      .agg(avg("w").as("m"), var_pop(col("w")).as("v")).collect()
    assert(stats.length === 64)
    stats.foreach { r =>
      // the 1e-6 floor quantization biases the mean by up to
      // ~0.5e-6/sigma (sigma ~0.1 here) — deterministic, tiny
      assert(math.abs(r.getDouble(1)) < 1e-4, s"mean off: $r")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3, s"var off: $r")
    }
    // constant dimension whitens to exactly 0, not NaN
    val const = Seq((0L, Seq(1.0f, 2.0f), 0), (1L, Seq(1.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val w0 = Similarity.whitenEmbeddings(const)
      .filter(col("dim") === 0).collect().map(_.getDouble(2))
    assert(w0.toSeq === Seq(0.0, 0.0))
  }

  test("qDecileLift: exact-rank deciles, monotone gains, no single-task global sort") {
    import graft.operators.Relational
    import graft.sources.Tables
    val out = Relational.qDecileLift(spark, sf).orderBy("decile").collect()
    assert(out.length === 10)
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_.getLong(1)).sum === nCust)
    // deciles differ by at most 1 customer (exact rank split)
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // gains curve: top decile carries the largest share; cumulative
    // share is monotone and ends at 1e6 ppm
    assert(out.head.getLong(2) === out.map(_.getLong(2)).max)
    val cum = out.map(_.getLong(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last === 1000000L)
  }

  test("dupNgrams: exact per-n duplicate fractions; zero-shuffle plan") {
    val docs = mkDocs(Seq(
      (1L, "a b a b a"),   // 2-grams: ab,ba,ab,ba → 2 dups of 4
      (2L, "x y z"),       // no repeats at any n
      (3L, "w")))          // too short for any n-gram
    val out = TextAnalysis.dupNgrams(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc1 3-grams: aba,bab,aba → 1 dup of 3; 4-grams: abab,baba → 0
    assert(out === Map(
      1L -> ((500000L, 333333L, 0L)),
      2L -> ((0L, 0L, 0L)),
      3L -> ((0L, 0L, 0L))))
    val plan = TextAnalysis.dupNgrams(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"dupNgrams must be a pure scan pipeline:\n$plan")
  }

  test("qRfm: value-based quartile scoring conserves customers and orders by spend") {
    import graft.operators.Relational
    import graft.sources.Tables
    val out = Relational.qRfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_._2).sum === nCust, "every customer lands in a segment")
    out.foreach { case (seg, _, _) =>
      val (r, f, m) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4, s"seg $seg")
    }
    // monetary scoring must order segments: average spend per customer
    // strictly increases with m_score when r and f are held fixed
    val byRf = out.groupBy { case (seg, _, _) => seg / 10 }
    byRf.values.foreach { segs =>
      val avg = segs.sortBy(_._1)
        .map { case (seg, n, c) => (seg % 10, c.toDouble / n) }.toSeq
      avg.sliding(2).foreach {
        case Seq((m1, a1), (m2, a2)) =>
          if (m1 < m2) assert(a1 < a2, s"m-score ordering violated: $avg")
        case _ => ()
      }
    }
  }

  test("contrastivePairs: positives share the label, negatives never do; deterministic") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val embs = Tables.embeddings(spark, sf)
    val out = Similarity.contrastivePairs(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val labelOf = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val perLabel = labelOf.values.groupBy(identity).map { case (l, v) => l -> v.size }
    // one anchor per vec except the first of each label
    assert(out.length === labelOf.size - perLabel.size)
    out.foreach { case (a, l, p, n) =>
      assert(labelOf(a) === l && labelOf(p) === l, s"positive label: $a")
      assert(p < a, "positive is the same-label predecessor")
      assert(labelOf(n) !== l, s"negative must differ in label: $a -> $n")
    }
    // determinism: a second evaluation yields the identical triple set
    val again = Similarity.contrastivePairs(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet === again.toSet)
  }

  test("pcaTopComponent: unit-norm dominant axis matching a dense reference iteration") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val embs = Tables.embeddings(spark, sf)
    val v = Similarity.pcaTopComponent(embs).orderBy("dim")
      .collect().map(_.getDouble(1))
    assert(v.length === 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    // dense double-precision reference (no quantization): 3 power
    // rounds from all-ones over the centered data
    val x = embs.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = x.length
    val mu = Array.tabulate(64)(d => x.map(_(d)).sum / n)
    var ref = Array.fill(64)(1.0)
    for (_ <- 1 to 3) {
      val w = Array.fill(64)(0.0)
      x.foreach { row =>
        var t = 0.0
        var d = 0
        while (d < 64) { t += (row(d) - mu(d)) * ref(d); d += 1 }
        d = 0
        while (d < 64) { w(d) += (row(d) - mu(d)) * t; d += 1 }
      }
      val norm = math.sqrt(w.map(y => y * y).sum)
      ref = w.map(_ / norm)
    }
    // quantization perturbs at ~1e-6 scale; directions must agree
    val dot = v.zip(ref).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) > 0.9999, s"axis mismatch: |cos|=$dot")
    // dominant axis: variance along v >= variance of any coordinate
    val varAlong = x.map { row =>
      val t = row.indices.map(d => (row(d) - mu(d)) * v(d)).sum; t * t
    }.sum / n
    val maxCoordVar = (0 until 64).map { d =>
      x.map(r => math.pow(r(d) - mu(d), 2)).sum / n }.max
    assert(varAlong >= maxCoordVar * 0.999,
      s"$varAlong should dominate $maxCoordVar")
  }

  test("paddingWaste: exact padded-slot accounting per context length") {
    val docs = mkDocs(Seq(
      (1L, Seq.fill(600)("w").mkString(" ")),  // 600 tokens
      (2L, Seq.fill(100)("w").mkString(" ")))) // 100 tokens
    val out = TextAnalysis.paddingWaste(docs, lengths = Seq(512))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 600 → 2 slots of 512 = 1024; 100 → 512. padded 1536, tokens 700
    assert(out.toSeq === Seq((512, 2L, 700L, 1536L,
      836L * 1000000L / 1536L)))
  }

  test("vocabGrowth: monotone curve driven by first-seen doc ids") {
    val docs = mkDocs(Seq(
      (0L, "a b"), (1L, "a c"), (2L, "d"), (3L, "a e f"),
      (4L, "g"), (5L, "a"), (6L, "h"), (7L, "a"), (8L, "i"), (9L, "a")))
    val out = TextAnalysis.vocabGrowth(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // percentile(doc_id, .1) of 0..9 = 0.9 → terms first seen in doc 0
    assert(out(10L) === 2L)  // a, b
    // c50 = 4.5 → docs 0..4: a b c d e f g
    assert(out(50L) === 7L)
    assert(out(100L) === 9L) // all terms
    assert(out(10L) <= out(50L) && out(50L) <= out(100L))
  }

  test("rxSessionStats: gap sessionization rollup with exact means and bounce share") {
    import graft.operators.Reactive
    val m = 60000L
    // user 1, day 0: session A (3 events over 10 min), then a 40-min
    // gap → session B (1 event, a bounce). user 2, day 1: one bounce.
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 5 * m, 1L, "a", 0.0),
      (3L, 10 * m, 1L, "a", 0.0),
      (4L, 50 * m, 1L, "a", 0.0),
      (5L, 86400000L + 3 * m, 2L, "a", 0.0)))
    val out = Reactive.rxSessionStats(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // day 0: 2 sessions, 1 bounce → 500000 ppm; durations 10min + 0
    // → mean 5min; events 3+1 → mean 2000 milli
    assert(out === Map(
      0L -> ((2L, 500000L, 5 * m, 2000L)),
      1L -> ((1L, 1000000L, 0L, 1000L))))
  }

  test("rxConcurrency: sweep-line levels match interval stabbing; ends at zero") {
    import graft.operators.Reactive
    val m = 60000L
    // u1 session minutes [0,10]; u2 [5,8]; u3 bounce at 7
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 10 * m, 1L, "a", 0.0),
      (3L, 5 * m, 2L, "a", 0.0), (4L, 8 * m, 2L, "a", 0.0),
      (5L, 7 * m, 3L, "a", 0.0)))
    val out = Reactive.rxConcurrency(ev).orderBy("minute").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // levels: min0→1, min5→2, min7→3, min8→2 (u3 closes), min9→1
    // (u2 closes), min11→0 (u1 closes)
    assert(out.toSeq === Seq((0L, 1L), (5L, 2L), (7L, 3L),
      (8L, 2L), (9L, 1L), (11L, 0L)))
    assert(out.last._2 === 0L, "every session eventually closes")
  }

  test("charsetProfile: exact ppm byte-class ratios; zero-shuffle plan") {
    val docs = mkDocs(Seq((1L, "ab 12!"), (2L, "xyz")))
    val out = TextAnalysis.charsetProfile(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // "ab 12!": 6 chars, 2 alpha, 2 digit, 1 space, 1 other
    assert(out(1L) === ((6L, 333333L, 333333L, 166666L, 166666L)))
    assert(out(2L) === ((3L, 1000000L, 0L, 0L, 0L)))
    val plan = TextAnalysis.charsetProfile(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"charset profile must be a pure scan pipeline:\n$plan")
  }

  test("rxTsMatch: z-normalized matching is offset/scale invariant") {
    import graft.operators.Reactive
    // user 1 embeds the pattern shifted by +1; user 2 scaled x3 +5;
    // user 3 is noise. Both transformed copies must match at ~0.
    val p = Seq(0.0, 0.0, 0.0, 10.0, 10.0, 0.0, 0.0, 0.0)
    val vals =
      (Seq(7.0, 3.0) ++ p.map(_ + 1) ++ Seq(5.0)).zipWithIndex.map {
        case (v, i) => (i.toLong, i.toLong, 1L, "m", v) } ++
      p.map(_ * 3 + 5).zipWithIndex.map {
        case (v, i) => (100L + i, i.toLong, 2L, "m", v) } ++
      Seq.tabulate(10)(i => (200L + i, i.toLong, 3L, "m", (i * 37 % 11) * 1.0))
    val out = Reactive.rxTsMatch(mkEvents(vals), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 3)
    val exact = out.filter(_._3 < 1e-12)
    assert(exact.map(_._1).toSet === Set(1L, 2L),
      s"both transformed copies must match exactly: ${out.toSeq}")
    // user 1's match starts at the pattern's first element (id 2)
    assert(exact.find(_._1 == 1L).get._2 === 2L)
    assert(out(2)._3 > 1.0, "noise must rank far behind")
  }

  test("rxLifecycle: growth-accounting states on a constructed history") {
    import graft.operators.Reactive
    val wk = 604800000L
    // u1: weeks 0,1,3 → new@0, retained@1, churn@2, resurrected@3
    // u2: week 1 only → new@1, churn@2
    // u3: weeks 2,3 → new@2, retained@3 (never churns: horizon=3)
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 1 * wk, 1L, "a", 0.0),
      (3L, 3 * wk, 1L, "a", 0.0),
      (4L, 1 * wk, 2L, "a", 0.0),
      (5L, 2 * wk, 3L, "a", 0.0), (6L, 3 * wk + 5, 3L, "a", 0.0)))
    val out = Reactive.rxLifecycle(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      0L -> ((1L, 0L, 0L, 0L)),
      1L -> ((1L, 1L, 0L, 0L)),
      2L -> ((1L, 0L, 0L, 2L)),
      3L -> ((0L, 1L, 1L, 0L))))
  }

  test("abttCorrect: corrected embeddings have ~zero mean and zero axis projection") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val embs = Tables.embeddings(spark, sf)
    val v = Similarity.pcaTopComponent(embs).orderBy("dim")
      .collect().map(_.getDouble(1))
    val corrected = Similarity.abttCorrect(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val byVec = corrected.groupBy(_._1)
    byVec.values.foreach { rows =>
      val w = rows.sortBy(_._2).map(_._3)
      // projection onto the removed axis collapses to ~0
      val proj = w.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(proj) < 1e-9, s"axis not removed: $proj")
    }
    // per-dim mean is ~0 (1e-6 quantized mu ⇒ sub-1e-5 bias)
    corrected.groupBy(_._2).values.foreach { rows =>
      val m = rows.map(_._3).sum / rows.size
      assert(math.abs(m) < 1e-4, s"mean off: $m")
    }
  }

  test("rxFunnelRates: stage table consistent with the per-user funnel") {
    import graft.operators.Reactive
    import graft.sources.Tables
    val ev = Tables.events(spark, sf)
    val out = Reactive.rxFunnelRates(ev).orderBy("stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq((1L, "view"), (2L, "click"), (3L, "purchase")))
    val perUser = Reactive.rxFunnel(ev).collect()
    val expect = Seq(
      perUser.count(!_.isNullAt(1)).toLong,
      perUser.count(!_.isNullAt(2)).toLong,
      perUser.count(!_.isNullAt(3)).toLong)
    assert(out.map(_._3).toSeq === expect)
    // funnel is monotone and the ratios are the exact floor divisions
    assert(expect(0) >= expect(1) && expect(1) >= expect(2))
    assert(out(0)._4 === 1000000L && out(0)._5 === 1000000L)
    assert(out(1)._4 === expect(1) * 1000000L / expect(0))
    assert(out(2)._5 === expect(2) * 1000000L / expect(0))
  }

  test("tokenBudget: water-filling takes scarce sources fully, caps abundant ones") {
    import graft.operators.Sampling
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), "en", src, n.toLong)
    val docs = Seq(doc(1, "s1", 10), doc(2, "s2", 50), doc(3, "s3", 100))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Sampling.tokenBudget(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // total 160 → budget 80: s1 fully (10), s2/s3 capped at (80-10)/2
    assert(out === Map("s1" -> ((10L, 10L)), "s2" -> ((50L, 35L)),
      "s3" -> ((100L, 35L))))
    assert(out.values.map(_._2).sum === 80L, "budget exactly spent")
  }

  test("rxCohortLtv: cumulative identities and per-user LTV on the real table") {
    import graft.operators.Reactive
    import graft.sources.Tables
    val out = Reactive.rxCohortLtv(Tables.events(spark, sf))
      .orderBy("cohort_week", "age_weeks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { rows =>
      var run = 0L
      rows.sortBy(_._2).foreach {
        case (_, _, users, active, rev, cum, ltv) =>
          run += rev
          assert(cum === run, "cumulative revenue identity")
          assert(ltv === cum / users)
          assert(active <= users, "active users bounded by cohort size")
      }
    }
    // age-0 cell exists for every cohort (users are active when born)
    out.groupBy(_._1).values.foreach(rows =>
      assert(rows.map(_._2).min === 0L))
  }

  test("bpeTrain: greedy merges on the weighted vocabulary with deterministic ties") {
    val docs = mkDocs(Seq((1L, "low low low lower lowest")))
    val out = TextAnalysis.bpeTrain(docs, rounds = 2).orderBy("merge_rank")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: "l o" and "o w" tie at 5 → "l o" wins lexicographically;
    // round 2: after the merge, "lo w" carries the same 5
    assert(out.toSeq === Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L)))
    // greedy left-to-right fusion: "l l l" merges to "ll l", not "l ll"
    val tripled = mkDocs(Seq((1L, "lll lll")))
    val m = TextAnalysis.bpeTrain(tripled, rounds = 2).orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === (("l", "l", 4L)))   // 2 adjacent pairs x weight 2
    assert(m(1) === (("ll", "l", 2L)))  // greedy leaves "ll l"
  }

  test("datasetCard: exact one-row summary with duplicate accounting") {
    val docs = mkDocs(Seq(
      (1L, "a b c"), (2L, "a b c"),           // exact dup pair
      (3L, "  A B C "), (4L, "x y")))         // trim+case folds to dup
    val r = TextAnalysis.datasetCard(docs).head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_unique_docs") === 2L)
    assert(r.getAs[Long]("dup_ppm") === 500000L)
    // split keeps empty fields (limit -1): "  A B C " → 6 elements
    assert(r.getAs[Long]("total_tokens") === 14L)
    assert(r.getAs[Long]("mean_tokens") === 3L)
  }

  test("qBasketRules: confidence and lift recomputed from brute-force supports") {
    import graft.operators.Relational
    import graft.sources.Tables
    val rows = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nBaskets = rows.map(_._1).distinct.length.toLong
    val itemSup = rows.groupBy(_._2).map { case (p, v) =>
      p -> v.map(_._1).distinct.length.toLong }
    val pairSup = rows.groupBy(_._1).values
      .flatMap(b => b.map(_._2).distinct.sorted.combinations(2)
        .map(c => (c(0), c(1))))
      .toSeq.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val out = Relational.qBasketRules(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size === 100) // 50 pairs, both directions
    out.foreach { case ((lhs, rhs), (sup, conf, lift)) =>
      val key = (math.min(lhs, rhs), math.max(lhs, rhs))
      assert(sup === pairSup(key))
      assert(conf === sup * 1000000L / itemSup(lhs))
      assert(lift ===
        nBaskets * sup * 1000000L / (itemSup(lhs) * itemSup(rhs)))
    }
  }

  test("rxSeasonality: exact integer decomposition identities on the real series") {
    import graft.operators.Reactive
    import graft.sources.Tables
    val out = Reactive.rxSeasonality(Tables.events(spark, sf))
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // residual identity holds exactly
    out.foreach { case (_, c, t, s, res) => assert(res === c - t - s) }
    // trend equals the centered 7-day floor mean recomputed directly
    val daily = Tables.events(spark, sf)
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types
        .DecimalType(18, 2))) * 100).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (d, _, t, _, _) =>
      val win = (d - 3 to d + 3).flatMap(daily.get)
      assert(win.size === 7, s"day $d should have a full window")
      assert(t === Math.floorDiv(win.sum, 7L) ||
        t === win.sum / 7L, s"trend mismatch at $d")
    }
    // per-dow seasonal components are constant across weeks
    val byDow = out.groupBy { case (d, _, _, _, _) => (d + 4) % 7 }
    byDow.values.foreach { rows =>
      assert(rows.map(_._4).distinct.size === 1)
    }
  }

  test("rxBurst: RANGE frame counts silent minutes as zero; integer verdict") {
    import graft.operators.Reactive
    val min = 60000L
    // type "m": minutes 0-9 calm (1 event each), minute 10 quiet gap
    // at 11-19, burst at minute 20 (4 events). With a ROWS frame the
    // gap would dilute nothing; with RANGE, minutes 11-19 are implicit
    // zeros so the trailing sum at 20 is only minute 10's one event.
    val ev = mkEvents(
      (0 until 10).map(i => (i.toLong, i * min, 1L, "m", 0.0)) ++
      Seq((10L, 10 * min, 1L, "m", 0.0)) ++
      (0 until 4).map(i => (20L + i, 20 * min + i, 1L, "m", 0.0)))
    val out = Reactive.rxBurst(ev)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // minute 20: n=4, trailing RANGE sum = minute-10 count only (1);
    // 4*10 > 3*1 → burst. No other minute fires (calm run: 1*10 < 3*k).
    assert(out.toSeq === Seq((20L, 4L, 1L)))
  }

  test("rxPatternMatch: error+ purchase runs via position arithmetic, join-free") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "error", 0.0), (2L, 1L, 1L, "error", 0.0),
      (3L, 2L, 1L, "purchase", 5.0),  // run of 2
      (4L, 3L, 1L, "purchase", 5.0),  // preceded by purchase → no match
      (5L, 4L, 1L, "error", 0.0),     // trailing error, no purchase
      (6L, 0L, 2L, "purchase", 1.0),  // stream starts with purchase
      (7L, 1L, 2L, "error", 0.0), (8L, 2L, 2L, "purchase", 1.0)))
    val out = Reactive.rxPatternMatch(ev)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((3L, 2L), (8L, 1L)))
    val plan = Reactive.rxPatternMatch(ev)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pattern match must be join-free:\n$plan")
  }

  test("rxTrending ranks each day's event types with deterministic tiebreak") {
    import graft.operators.Reactive
    val day = 86400000L
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "b", 0.0), (2L, 1L, 1L, "b", 0.0),
      (3L, 2L, 2L, "a", 0.0), (4L, 3L, 2L, "c", 0.0), // a ties c → a first
      (5L, day, 1L, "c", 0.0)))
    val out = Reactive.rxTrending(ev, k = 2)
      .orderBy("day", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 1L, "b", 2L), (0L, 2L, "a", 1L), (1L, 1L, "c", 1L)))
  }

  test("rxAbTest: md5 split is deterministic; exact per-arm conversion and revenue") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 10L, "purchase", 10.00), (2L, 1L, 10L, "click", 0.0),
      (3L, 0L, 11L, "click", 0.0),
      (4L, 0L, 12L, "purchase", 2.50), (5L, 1L, 12L, "purchase", 2.50)))
    val out = Reactive.rxAbTest(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // arms derive from md5 hex digit — recompute the split here
    def arm(u: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes)
      if ((d(0) >> 4 & 0xF) < 8) "A" else "B"
    }
    val byArm = Map(10L -> (1L, 1000L), 11L -> (0L, 0L), 12L -> (1L, 500L))
      .groupBy { case (u, _) => arm(u) }
    byArm.foreach { case (a, users) =>
      val (n, conv, rev) = (users.size.toLong,
        users.values.map(_._1).sum, users.values.map(_._2).sum)
      assert(out(a) === ((n, conv, conv * 1000000L / n, rev, rev / n)),
        s"arm $a")
    }
    assert(out.values.map(_._1).sum === 3L)
  }

  test("knnGraph: within-label top-k by cosine, cross-label pairs never meet") {
    import spark.implicits._
    import graft.operators.Similarity
    val embs = Seq(
      (1L, Array(1f, 0f), 0),    // a
      (2L, Array(1f, 0.1f), 0),  // b — nearest to both a and c
      (3L, Array(0f, 1f), 0),    // c
      (4L, Array(1f, 0f), 1)     // d: identical to a but another label
    ).toDF("vec_id", "embedding", "label")
    val edges = Similarity.knnGraph(embs, k = 1).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(edges === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // d is alone in its label: no edge out, and never anyone's neighbor
    // despite being bit-identical to a
    assert(!edges.contains(4L) && !edges.values.toSet.contains(4L))
  }

  test("hubnessAudit: in-degree histogram restores the in-degree-0 anti-hubs") {
    import spark.implicits._
    import graft.operators.Similarity
    val embs = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(1f, 0.1f), 0),
      (3L, Array(0f, 1f), 0),
      (4L, Array(1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val hist = Similarity.hubnessAudit(embs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // edges: 1→2, 2→1, 3→2 ⇒ in-degree: v1=1, v2=2, v3=0, v4=0
    assert(hist === Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("rxInterarrivalHist: bit-length buckets, same-ms ticks excluded") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 1L, 1L, "a", 0.0),
      (3L, 9L, 1L, "a", 0.0), (4L, 9L, 1L, "a", 0.0)))
    val out = Reactive.rxInterarrivalHist(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // gaps: 1 ms (bucket 0), 8 ms (bucket 3); the 0-ms tick drops
    assert(out === Map(("a", 0L) -> 1L, ("a", 3L) -> 1L))
  }

  test("balancedShards: two-level rank matches the naive snake; mass balances") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val out = Sampling.balancedShards(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val naive = docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("r", (row_number().over(
        Window.orderBy(col("n_tokens").desc, col("doc_id"))) - 1)
        .cast("long"))
      .withColumn("shard", expr(
        "CASE WHEN (r div 8) % 2 = 0 THEN r % 8 ELSE 7 - r % 8 END"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === naive)
    assert(out.values.map(_._1).sum === docs.count())
  }

  test("fertility: exact subword-per-word milli ratios per language") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd ef", "en", "s1", 7L),   // ws 2, pieces 1+1
      (2L, "abcdefgh", "en", "s1", 8L),  // ws 1, pieces 2
      (3L, "a", "fr", "s1", 1L)          // ws 1, pieces 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.fertility(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "en" -> ((2L, 3L, 4L, 1333L)),
      "fr" -> ((1L, 1L, 1L, 1000L))))
  }

  test("qTopGrowthProducts: support floor holds and ranking is monotone") {
    import graft.operators.Relational
    val out = Relational.qTopGrowthProducts(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(_._2 >= 100000L))
    assert(out.map(_._4).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)))
  }

  test("rxAnomalyPath: weakest-transition scoring surfaces the rare path") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 1L, 1L, "b", 0.0),
      (3L, 0L, 2L, "a", 0.0), (4L, 1L, 2L, "b", 0.0),
      (5L, 0L, 3L, "a", 0.0), (6L, 1L, 3L, "b", 0.0),
      (7L, 0L, 4L, "a", 0.0), (8L, 1L, 4L, "c", 0.0)))
    val out = Reactive.rxAnomalyPath(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    // a→c happens once of 4 a-transitions: user 4 is the anomaly
    assert(out.head === ((4L, 1L, 250000L, "a", "c")))
    assert(out.tail.forall(_._3 === 750000L))
  }

  test("rxStageLatency: exact gap means and interpolated medians per stage") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 1000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "purchase", 0.0),
      (4L, 0L, 2L, "view", 0.0), (5L, 5000L, 2L, "click", 0.0)))
    val out = Reactive.rxStageLatency(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      "view->click" -> ((2L, 3000L, 3000.0)),
      "click->purchase" -> ((1L, 2000L, 2000.0))))
  }

  test("codeDetect: symbol density or indent discipline flags code") {
    import spark.implicits._
    val docs = Seq(
      (1L, "{();}", "en", "s1", 5L),
      (2L, "hello world prose text", "en", "s1", 22L),
      (3L, "def f:\n  a\n  b\n  c\n  d", "en", "s1", 22L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.codeDetect(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(5)))).toMap
    assert(out(1L) === ((1000000L, true)))  // all symbols
    assert(out(2L)._2 === false)
    assert(out(3L) === ((0L, true)))        // 4 indented of 5 lines
  }

  test("qCustomerMigration: matrix partitions active customers; segs in range") {
    import graft.operators.Relational
    val sf = "/root/testdata/sf0.001"
    val out = Relational.qCustomerMigration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_._3).sum === nCust)
    assert(out.forall { case (a, b, _) => a >= 0 && a <= 4 && b >= 0 && b <= 4 })
    assert(!out.exists { case (a, b, _) => a == 0 && b == 0 })
    assert(out.exists(_._1 == 0L) || out.exists(_._2 == 0L)) // churn/entry exists
  }

  test("scd2AsOf: half-open interval honors boundaries on version flips") {
    import spark.implicits._
    import graft.operators.MergeOps
    val scd2 = Seq(
      (1L, 10.0, 0L, Option(50L)), (1L, 20.0, 50L, Option.empty[Long])
    ).toDF("c_custkey", "bal", "valid_from", "valid_to")
    def snap(t: Long) = MergeOps.scd2AsOf(scd2, t).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(snap(25L).toSeq === Seq((1L, 10.0)))
    assert(snap(50L).toSeq === Seq((1L, 20.0))) // flip instant: new version
    assert(snap(75L).toSeq === Seq((1L, 20.0)))
  }

  test("rxSloBurn: rate alert fires on ratio, not volume; strict threshold") {
    import graft.operators.Reactive
    val min = 60000L
    val ev = mkEvents(
      (1 to 3).map(i => (i.toLong, i.toLong, 1L, "error", 0.0)) ++
        (4 to 10).map(i => (i.toLong, min + i, 1L, "click", 0.0)))
    val out = Reactive.rxSloBurn(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // minute 0: 3/3 errors → alert. minute 1 trailing: 3/10 = exactly
    // the 300000 ppm SLO — strict inequality must NOT fire
    assert(out.toSeq === Seq((0L, 3L, 3L, 1000000L)))
  }

  test("dimProfile: exact scaled moments per dimension") {
    import spark.implicits._
    import graft.operators.Similarity
    val embs = Seq((1L, Array(1f, 2f), 0), (2L, Array(3f, 2f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.dimProfile(embs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(0L) === ((2L, 2.0, 1.0, 1.0, 3.0)))
    assert(out(1L) === ((2L, 2.0, 0.0, 2.0, 2.0)))
  }

  test("rxForecastBacktest: exact WAPE/bias of the seasonal-naive baseline") {
    import graft.operators.Reactive
    val day = 86400000L
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 1.00), (2L, day, 1L, "a", 2.00),
      (3L, 7 * day, 1L, "a", 1.50), (4L, 8 * day, 1L, "a", 2.00)))
    val out = Reactive.rxForecastBacktest(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // scored days: 7 (pred 100, y 150) and 8 (pred 200, y 200)
    // wape = 50/350, bias = -50/350 (both truncate toward zero)
    assert(out.toSeq === Seq(("a", 2L, 142857L, -142857L)))
  }

  test("lengthPowerlaw: exact bit-length buckets") {
    import spark.implicits._
    val docs = Seq((1L, "x", "en", "s1", 1L), (2L, "x", "en", "s1", 2L),
      (3L, "x", "en", "s1", 3L), (4L, "x", "en", "s1", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.lengthPowerlaw(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(0L -> ((1L, 1L)), 1L -> ((2L, 5L)),
      3L -> ((1L, 8L))))
  }

  test("readability: terminator-run sentences and raw-token word lengths") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello world. Bye.", "en", "s1", 17L),
      (2L, "no terminator here", "en", "s1", 18L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out === Map(
      1L -> ((2L, 3L, 15L, 1500L, 5000L)),
      2L -> ((1L, 3L, 16L, 3000L, 5333L))))
  }

  test("rxStickiness: exact DAU over trailing-window MAU in ppm") {
    import graft.operators.Reactive
    val day = 86400000L
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 10L, 2L, "a", 0.0), // day 0: {1,2}
      (3L, day, 1L, "a", 0.0)))                        // day 1: {1}
    val out = Reactive.rxStickiness(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // MAU on both days is {1,2}: both day-0 actives stay in the window
    assert(out === Map(
      0L -> ((2L, 2L, 1000000L)),
      1L -> ((1L, 2L, 500000L))))
  }

  test("clusterQuality: perfect clusters read 1e9 compactness, 0 separation") {
    import spark.implicits._
    import graft.operators.Similarity
    val embs = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),
      (3L, Array(0f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterQuality(embs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(0L) === ((2L, 1000000000L, 1L, 0.0)))
    assert(out(1L) === ((1L, 1000000000L, 0L, 0.0)))
  }

  test("kmvSetOps: unsaturated sketch returns the exact set algebra") {
    import spark.implicits._
    import graft.operators.Sketches
    val docs = Seq(
      (1L, "a b c d", "s1", 7L), (2L, "c d e", "s2", 5L)
    ).map { case (id, t, src, n) => (id, t, "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Sketches.kmvSetOps(docs).collect()
    assert(r.length === 1)
    val row = r.head
    // vocab below k=16: the merged sketch IS the union, estimates exact
    assert(row.getString(0) === "s1" && row.getString(1) === "s2")
    assert(row.getLong(2) === 5L)      // union_est = |{a,b,c,d,e}|
    assert(row.getLong(3) === 2L)      // inter_est = |{c,d}|
    assert(row.getLong(4) === 400000L) // 2/5 in ppm
    assert(row.getLong(5) === 5L && row.getLong(6) === 2L) // exact audit
  }

  test("truncationAudit: recall drops exactly where the prefix flips the neighbor") {
    import spark.implicits._
    import graft.operators.Similarity
    val embs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // query 1
      (1L, Array(0.9f, 0.1f, 0f, 0f)), // full NN of q1
      (2L, Array(1f, 0f, 1f, 0f)),   // 2-dim prefix looks perfect for q1
      (3L, Array(0f, 1f, 0f, 0f)),   // query 2
      (4L, Array(0f, 0.9f, 0f, 0.1f)) // NN of q2 under both metrics
    ).toDF("vec_id", "embedding")
    val out = Similarity.truncationAudit(embs,
        embs.filter(col("vec_id").isin(0L, 3L)), keepDims = 2, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(0L -> ((0L, 0L)), 3L -> ((1L, 1000000L))))
  }

  test("qAbcPareto: two-level prefix sum matches the naive global window") {
    import graft.operators.Relational
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val sf = "/root/testdata/sf0.001"
    val out = Relational.qAbcPareto(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // naive single-window reference (fine at spec scale)
    val r = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
    val tot = r.agg(sum("cents")).head.getLong(0)
    val naive = r.withColumn("cum_before", coalesce(sum("cents").over(
        Window.orderBy(col("cents").desc, col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("abc_class",
        when(col("cum_before") * 100 < lit(70L) * tot, "A")
          .when(col("cum_before") * 100 < lit(90L) * tot, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n"), sum("cents").as("rev"))
      .collect().map(r2 => r2.getString(0) ->
        ((r2.getLong(1), r2.getLong(2)))).toMap
    assert(out.keySet === naive.keySet)
    naive.foreach { case (k, (n, rev)) =>
      assert(out(k)._1 === n && out(k)._2 === rev, s"class $k") }
    assert(out.values.map(_._3).sum >= 999998L) // floor-rounded shares
  }

  test("rxStateDwell: gap to next event per user; open last events excluded") {
    import graft.operators.Reactive
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 1000L, 1L, "b", 0.0),
      (3L, 4000L, 1L, "a", 0.0), // open-ended: excluded
      (4L, 99L, 2L, "c", 0.0)))  // single event: excluded
    val out = Reactive.rxStateDwell(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "a" -> ((1L, 1000L, 1000L, 1000L)),
      "b" -> ((1L, 3000L, 3000L, 3000L))))
  }

  test("qLatencyHist: buckets partition every lineitem, negative tail kept") {
    import graft.operators.Relational
    val sf = "/root/testdata/sf0.001"
    val out = Relational.qLatencyHist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = Tables.lineitem(spark, sf).count()
    assert(out.map(_._2).sum === total)
    // the synthetic data ships some items BEFORE the order date —
    // the histogram must surface that tail, not clamp it away
    assert(out.exists(_._1 < 0) && out.exists(_._1 > 0))
  }

  test("lexicalDiversity: exact ppm TTR and Simpson on constructed bags") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b", "en", "s1", 5L),  // N=3 V=2 s2=2
      (2L, "x", "en", "s1", 1L)       // single token: simpson 0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      1L -> ((3L, 2L, 666666L, 333333L)),
      2L -> ((1L, 1L, 1000000L, 0L))))
  }

  test("embOutliers: integer decile cut flags exactly the off-centroid vector") {
    import spark.implicits._
    import graft.operators.Similarity
    // 9 vectors hugging (1, ~0) plus one at (0,1): n=10 ⇒ rank ≤ 1
    val embs = ((1 to 9).map(i => (i.toLong, Array(1f, i * 0.01f), 0)) :+
      (10L, Array(0f, 1f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.embOutliers(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 10L, 1L)))
  }

  test("knnClassifyAudit: per-label accuracy catches the mislabeled point") {
    import spark.implicits._
    import graft.operators.Similarity
    val embs = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0.01f), 0),
      (3L, Array(1f, 0.02f), 0),
      (4L, Array(0f, 1f), 1), (5L, Array(0.01f, 1f), 1),
      (6L, Array(0.02f, 1f), 1),
      (7L, Array(0f, 1f), 0) // mislabeled: sits in the label-1 cluster
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassifyAudit(embs, embs, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // v7 (mislabeled) predicts 1 — the audit finds it. Collateral: v4's
    // top-2 is {v7 (cos 1.0, label 0), v5} — a 1-1 vote tie that breaks
    // to the smaller label 0, so label 1 reads 2/3. Deliberately kept:
    // duplicated-but-differently-labeled points degrading their twin's
    // prediction is exactly the signal this audit exists to surface.
    assert(out === Map(
      0L -> ((4L, 3L, 750000L)),
      1L -> ((3L, 2L, 666666L))))
  }

  test("degreeHistogram: distinct counterparties per customer, rolled up") {
    import spark.implicits._
    import graft.operators.Graph
    val li = Seq((100L, 10L), (100L, 11L), (101L, 10L), (102L, 10L),
      (102L, 10L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 1L), (101L, 1L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
    // cust 1 → suppliers {10, 11}; cust 2 → {10} (dup rows collapse)
    val out = Graph.degreeHistogram(li, ord).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L))
  }

  test("rxAcf: perfect linear series → r≈1; calendar gaps break pairs") {
    import graft.operators.Reactive
    val day = 86400000L
    // type a: one event per day, values 1..5 dollars (daily = value)
    val a = (0 to 4).map(i =>
      (i.toLong + 1, i * day, 1L, "a", (i + 1).toDouble))
    // type b: days 0,2,4 only — no adjacent days, so lag-1 pairs are
    // empty and lag-2 has n=2 < 3: b must be absent entirely
    val b = Seq((10L, 0L, 2L, "b", 1.0), (11L, 2 * day, 2L, "b", 2.0),
      (12L, 4 * day, 2L, "b", 3.0))
    val out = Reactive.rxAcf(mkEvents(a ++ b), maxLag = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(("a", 1L), ("a", 2L)))
    assert(out(("a", 1L))._1 === 4L && out(("a", 2L))._1 === 3L)
    assert(math.abs(out(("a", 1L))._2 - 1.0) < 1e-9)
    assert(math.abs(out(("a", 2L))._2 - 1.0) < 1e-9)
  }

  test("ngramContainment: doc-in-doc scores 1.0 forward, filtered reverse") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "s1", 7L),            // 2 shingles, both in doc 2
      (2L, "a b c d e f g h", "s1", 15L),   // 6 shingles
      (3L, "x y z w", "s1", 7L)             // disjoint
    ).map { case (id, t, src, n) => (id, t, "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.ngramContainment(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 1→2 containment = 2/2 = 1.0; 2→1 = 2/6 < 0.5 filtered; 3 disjoint
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("benfordAudit: exact digit counts, ppm shares, fixed expected table") {
    import spark.implicits._
    import graft.operators.Relational
    val li = Seq(1.00, 1.50, 2.00, 9.99, 0.50, 0.00)
      .toDF("l_extendedprice")
    val out = Relational.benfordAudit(li).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 0.00 is filtered; digits of cents: 100→1, 150→1, 200→2, 999→9, 50→5
    assert(out === Map(
      1L -> ((2L, 400000L, 301029L, 98971L)),
      2L -> ((1L, 200000L, 176091L, 23909L)),
      5L -> ((1L, 200000L, 79181L, 120819L)),
      9L -> ((1L, 200000L, 45757L, 154243L))))
  }

  test("bfsTrade: min-hop histogram over the bipartite trade graph") {
    import spark.implicits._
    import graft.operators.Graph
    // suppliers 1,2 in nation A (sources); supplier 3 in B.
    // cust 10 buys from 1; cust 11 from 1 and 3; cust 12 from 3 only
    // ⇒ hop0: s1,s2; hop1: c10,c11; hop2: s3 (via c11); hop3: c12.
    // s2 has no edges — it still counts at hop 0.
    val li = Seq((100L, 1L), (101L, 1L), (101L, 3L), (102L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (102L, 12L))
      .toDF("o_orderkey", "o_custkey")
    val sup = Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
    val out = Graph.bfsTrade(li, ord, sup, nat).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      0L -> ((0L, 2L)), 1L -> ((2L, 0L)),
      2L -> ((0L, 1L)), 3L -> ((1L, 0L))))
  }

  test("rxDrawdown: worst fall from the running peak, absolute and ppm") {
    import graft.operators.Reactive
    // user 1: 10 → 4 → 8 → 2: peak stays 10, worst dd = 8.00 (800¢),
    //   ppm = 800·1e6 div 1000 = 800000; final = 2.00
    // user 2 monotone rising: dd = 0 everywhere
    val ev = mkEvents(Seq(
      (1L, 0L, 1L, "v", 10.0), (2L, 1L, 1L, "v", 4.0),
      (3L, 2L, 1L, "v", 8.0), (4L, 3L, 1L, "v", 2.0),
      (5L, 0L, 2L, "v", 1.0), (6L, 1L, 2L, "v", 2.0)))
    val out = Reactive.rxDrawdown(ev).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out === Map(
      1L -> ((4L, 1000L, 200L, 800L, 800000L)),
      2L -> ((2L, 200L, 200L, 0L, 0L))))
  }

  test("qGini: tie-collapsed rank identity matches hand-computed Gini") {
    // nation A spends {1.00, 1.00, 2.00} (cents 100,100,200):
    //   sorted Σi·x = 1·100 + 2·100 + 3·200 = 900; n=3, Σx=400
    //   G = (2·900 − 4·400)/(3·400) = 200/1200 → 166666 ppm
    // nation B single customer → G = 0
    import spark.implicits._
    import graft.operators.{Relational => R}
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 2L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((100L, 10L, 1.0), (101L, 11L, 1.0), (102L, 12L, 2.0),
        (103L, 13L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = R.qGini(spark, dir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      "A" -> ((3L, 400L, 166666L)),
      "B" -> ((1L, 500L, 0L))))
  }
}
