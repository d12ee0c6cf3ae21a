package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Reactive, Sampling, TextAnalysis}
import graft.sources.Tables

/** Round-4 curation ops: TF-IDF top terms, n-gram novelty scoring,
  * curriculum ordering. Exact semantics on constructed corpora; the
  * driver gate additionally hash-compares each against its DuckDB
  * oracle at sf0.01. */
class Round4Spec extends AnyFunSuite {
  import TestSession._

  test("tfidfTopTerms ranks a domain-specific term over corpus-wide ones") {
    import spark.implicits._
    // "shared" appears in every doc (df=4 → heavy idf damping);
    // "alpha"/"beta" are exclusive to their source
    val docs = Seq(
      (1L, "alpha alpha shared", "en", "s1", 18L),
      (2L, "alpha shared", "en", "s1", 12L),
      (3L, "beta shared", "en", "s2", 11L),
      (4L, "beta beta shared", "en", "s2", 16L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(5))).toSet
    // per source: alpha/beta (tf=3, df=2) must outrank shared
    // (tf=2, df=4): 3*5/3 = 5.0 > 2*5/5 = 2.0
    assert(out === Set(
      ("s1", "alpha", 3L, 2L, 1L), ("s1", "shared", 2L, 4L, 2L),
      ("s2", "beta", 3L, 2L, 1L), ("s2", "shared", 2L, 4L, 2L)))
  }

  test("tfidf score is the exact rational tf*(N+1)/(df+1)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x", "en", "s1", 5L),
      (2L, "y", "en", "s1", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.tfidfTopTerms(docs, k = 5)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(rows("x") === 3.0 * 3.0 / 2.0) // tf=3, N=2, df=1
    assert(rows("y") === 1.0 * 3.0 / 2.0)
  }

  test("textNovelty credits each shingle to its introducing doc only") {
    import spark.implicits._
    val docs = Seq(
      // doc 1: shingles {a b c, b c d} — all novel
      (1L, "a b c d", "en", "s1", 7L),
      // doc 2: identical → novelty 0
      (2L, "a b c d", "en", "s1", 7L),
      // doc 3: shares "a b c", adds "b c x" → 1 of 2 novel
      (3L, "a b c x", "en", "s1", 7L),
      // doc 4: < 3 tokens → excluded entirely
      (4L, "a b", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.textNovelty(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("textNovelty sums of novel counts equal the global distinct shingle count") {
    val docs = Tables.documents(spark, sf).limit(40)
    val nov = TextAnalysis.textNovelty(docs)
    val sumNovel = nov.agg(sum("n_novel")).collect()(0).getLong(0)
    // distinct 60-bit shingle hashes across the corpus — every hash
    // is introduced exactly once
    val distinctSh = docs
      .select(explode(array_distinct(graft.functions.GraftFunctions
        .text_shingles(TextAnalysis.tokens(col("text")), 3))).as("s"))
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).as("h"))
      .distinct().count()
    assert(sumNovel === distinctSh)
  }

  test("kmv sketch is exact below k and follows the (k-1)*2^60 div h_k estimate at k") {
    import spark.implicits._
    import graft.functions.KmvSketch.kmv_distinct
    // 8 distinct hashes, k=16: exact path
    val small = (1L to 8L).map(i => ("g", i * 1000L)).toDF("g", "h")
    assert(small.groupBy("g").agg(kmv_distinct(col("h"), 16).as("e"))
      .collect()(0).getLong(1) === 8L)
    // 100 distinct hashes spread over [0, 2^60), k=16: estimator path.
    // Hashes i*STEP for i=1..100 -> 16th smallest is 16*STEP
    val step = (1L << 60) / 128
    val big = (1L to 100L).map(i => ("g", i * step)).toDF("g", "h")
      .repartition(8) // force partial states + merges across partitions
    val est = big.groupBy("g").agg(kmv_distinct(col("h"), 16).as("e"))
      .collect()(0).getLong(1)
    val expected = (BigInt(15) * (BigInt(1) << 60) / BigInt(16 * step)).toLong
    assert(est === expected) // = 120: within ~20% of the true 100
    // duplicates never inflate the state: 100 copies of 3 hashes
    val dups = (1L to 100L).flatMap(_ => Seq(1L, 2L, 3L)).map(("g", _))
      .toDF("g", "h").repartition(8)
    assert(dups.groupBy("g").agg(kmv_distinct(col("h"), 16).as("e"))
      .collect()(0).getLong(1) === 3L)
  }

  test("distinctTokensSketch estimate tracks the exact count on real data") {
    val out = TextAnalysis.distinctTokensSketch(
      Tables.documents(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // KMV with k=16 has relative sd ~ 1/sqrt(k-2) ~ 27%; the fixed
      // md5 family makes the actual error deterministic, assert 50%
      assert(est > exact / 2 && est < exact * 2,
        s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("substringRepetition flags cross-doc and in-doc window repeats") {
    import spark.implicits._
    val eight = "a b c d e f g h"           // exactly one 8-token window
    val docs = Seq(
      (1L, eight, "en", "s1", 15L),          // dup of doc 2
      (2L, eight, "en", "s1", 15L),
      (3L, "q r s t u v w x y", "en", "s1", 17L), // 2 unique windows
      (4L, s"$eight $eight", "en", "s1", 31L),    // long doc, self-overlap
      (5L, "a b c", "en", "s1", 5L)          // < 8 tokens: excluded
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.substringRepetition(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!out.contains(5L))
    assert(out(1L) === ((1L, 1L, 1.0)))      // window shared with docs 2 & 4
    assert(out(2L) === ((1L, 1L, 1.0)))
    assert(out(3L) === ((2L, 0L, 0.0)))      // nothing repeated
    // doc 4: 9 windows; the 2 copies of "a b c..h" repeat (also via
    // docs 1/2); the 7 bridging windows are unique to doc 4
    assert(out(4L) === ((9L, 2L, 2.0 / 9.0)))
  }

  test("rxOutliers flags exactly the rows violating the integer 3-sigma rule") {
    import spark.implicits._
    // a lone deviant among n-1 equal values sits at z_pop = sqrt(n-1)
    // EXACTLY, so n=10 lands precisely ON the 3-sigma boundary and the
    // strict > must exclude it; n=16 (z = sqrt(15) ~ 3.87) must flag it
    val boundary = ((1L to 9L).map(i => (i, 1L, 10.0)) :+ (10L, 1L, 1000.0))
      .toDF("event_id", "user_id", "value")
    assert(graft.operators.Reactive.rxOutliers(boundary).count() === 0L)
    val events = ((1L to 15L).map(i => (i, 1L, 10.0)) :+ (16L, 1L, 1000.0))
      .toDF("event_id", "user_id", "value")
    val out = graft.operators.Reactive.rxOutliers(events)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(16L))
    // uniform stream: zero variance, nothing may fire (0 > 0 is false)
    val flat = (1L to 5L).map(i => (i, 2L, 7.5))
      .toDF("event_id", "user_id", "value")
    assert(graft.operators.Reactive.rxOutliers(flat).count() === 0L)
  }

  test("langConfusion counts partition the corpus over the 5x5 label space") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.langConfusion(docs).collect()
    assert(out.map(_.getLong(2)).sum === docs.count())
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(out.forall(r => langs(r.getString(1))))
  }

  test("rxIslands numbers maximal equal-type runs and re-numbers on return") {
    import spark.implicits._
    // user 1: a a b a  -> islands (a,2) (b,1) (a,1) — returning to a
    // starts a NEW island; user 2: single run
    val events = Seq(
      (1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "b"), (4L, 1L, "a"),
      (10L, 2L, "x"), (11L, 2L, "x")
    ).toDF("event_id", "user_id", "event_type")
    val out = graft.operators.Reactive.rxIslands(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out === Set(
      (1L, 1L, "a", 2L, 1L, 2L),
      (1L, 2L, "b", 1L, 3L, 3L),
      (1L, 3L, "a", 1L, 4L, 4L),
      (2L, 1L, "x", 2L, 10L, 11L)))
  }

  test("kmv state survives serialize/deserialize and merge order") {
    import graft.functions.{KmvDistinctAgg, KmvState}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = KmvDistinctAgg(Literal(0L), 8)
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(200)(rnd.nextLong().abs % (1L << 60))
    // sequential insert vs shuffled two-way merge of partials, with a
    // serde round-trip in between — all must agree
    val seqState = new KmvState(8)
    hashes.foreach(seqState.insert)
    val (l, r) = rnd.shuffle(hashes).splitAt(97)
    val a = new KmvState(8); l.foreach(a.insert)
    val b = new KmvState(8); r.foreach(b.insert)
    val bRt = agg.deserialize(agg.serialize(b))
    a.merge(bRt)
    assert(a.set === seqState.set)
    assert(agg.eval(a) === agg.eval(seqState))
  }

  test("curriculumOrder buckets quarter the corpus and phase is (bucket-1)*16+stage") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.curriculumOrder(docs).cache()
    try {
      val n = out.count()
      // quartile cuts: no bucket can exceed ~half the corpus even
      // with ties; all four appear on real data
      val byBucket = out.groupBy("bucket").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byBucket.keySet === Set(1L, 2L, 3L, 4L))
      assert(byBucket.values.forall(_ <= (n + 1) / 2))
      val bad = out.filter(
        col("phase") =!= (col("bucket") - 1L) * 16L + col("stage") ||
        col("stage") < 0L || col("stage") > 15L).count()
      assert(bad === 0L)
      // deterministic: a rerun is row-identical
      val again = Sampling.curriculumOrder(docs)
      assert(out.exceptAll(again).count() === 0L)
      assert(again.exceptAll(out).count() === 0L)
    } finally out.unpersist()
  }

  test("cmsHeavyHitters: estimates never undercount; width=1 collapses to total mass") {
    import spark.implicits._
    import graft.operators.Sketches
    val docs = Seq(
      (1L, "hot hot hot hot cold warm", "en", "s1", 26L),
      (2L, "hot hot mild cold", "en", "s1", 17L),
      (3L, "hot warm mild", "en", "s1", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sketches.cmsHeavyHitters(docs, depth = 4, width = 256, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val byTerm = rows.map(t => t._1 -> t._2).toMap
    assert(byTerm === Map("hot" -> 7L, "cold" -> 2L, "warm" -> 2L,
      "mild" -> 2L))
    // the CMS invariant: min-over-depths never undercounts
    assert(rows.forall { case (_, exact, est) => est >= exact })
    // width=1: every depth's single cell holds ALL 13 tokens, so
    // every estimate is exactly the total mass — the degenerate
    // upper bound, computed not assumed
    val collapsed = Sketches
      .cmsHeavyHitters(docs, depth = 4, width = 1, k = 10)
      .collect()
    assert(collapsed.forall(_.getLong(2) === 13L))
  }

  test("sourceDivergence: 0 for identical mixes, mass_a+mass_b for disjoint ones") {
    import spark.implicits._
    val docs = Seq(
      // s1 and s2: the same distribution {x: 2/3, y: 1/3}
      (1L, "x x y", "en", "s1", 5L),
      (2L, "x x y", "en", "s2", 5L),
      // s3: disjoint vocabulary
      (3L, "z z z", "en", "s3", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.sourceDivergence(docs)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // identical: every (p-q) is 0, all mass shared
    assert(out(("s1", "s2")) === ((2L, 0L)))
    // disjoint pairs survive the join with n_shared = 0 and
    // chi2 = mass_a + mass_b; each mass = 666666666 + 333333333
    // (floor dust from the ppb scaling)
    val disjointChi = 666666666L + 333333333L + 1000000000L
    assert(out(("s1", "s3")) === ((0L, disjointChi)))
    assert(out(("s2", "s3")) === ((0L, disjointChi)))
  }

  test("importanceSample keeps all-distinct docs always, and only u<w rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "en", "s1", 7L),   // uniq ratio 1.0 → always kept
      (2L, "a a a a", "en", "s1", 7L),   // 0.25 → kept iff u < 250000
      (3L, "p q r s t", "en", "s1", 9L), // 1.0 → always kept
      (4L, "b b", "en", "s1", 3L)        // 0.5 → kept iff u < 500000
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sampling.importanceSample(docs).collect()
    val kept = rows.map(_.getLong(0)).toSet
    assert(Set(1L, 3L).subsetOf(kept))
    assert(rows.forall(r => r.getLong(4) < r.getLong(3)))
    // the draw matches the md5 definition exactly (independently
    // recomputed here), so membership of docs 2 and 4 is a pure
    // function, not chance
    def u(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(("is:" + id).getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString.take(7), 16) % 1000000L
    assert(kept.contains(2L) === (u(2L) < 250000L))
    assert(kept.contains(4L) === (u(4L) < 500000L))
  }

  test("collocations: lift is the staged integer formula, hand-checked") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york new york", "en", "s1", 17L),
      (2L, "a b", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.collocations(docs, k = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // N = 6 tokens; "new york" occurs twice among consecutive pairs
    // lift_ppm = ((n_ab*1e6) div n_a) * N div n_b
    assert(out("new york") === ((2L, 2L, 2L, 3000000L)))
    assert(out("york new") === ((1L, 2L, 2L, 1500000L)))
    assert(out("a b") === ((1L, 1L, 1L, 6000000L)))
  }

  test("sourceDiversity: gini 0 for a one-token source, 1/2 for a uniform pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "only only only", "en", "mono", 14L),
      (2L, "x y", "en", "duo", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.sourceDiversity(docs)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out("mono") === ((1L, 1000000000L, 0L)))
    assert(out("duo") === ((2L, 500000000L, 500000000L)))
  }

  test("prefix-filtered Jaccard equals the full inverted-index join") {
    // the All-Pairs prefix filter must be lossless: identical result
    // set (pairs AND values) to the exact op on the real corpus, at
    // a threshold high enough that pruning actually bites
    val docs = Tables.documents(spark, sf)
    for (t <- Seq(0.05, 0.3)) {
      val full = TextAnalysis.ngramJaccard(docs, minJaccard = t)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val pref = TextAnalysis.ngramJaccardPrefix(docs, minJaccard = t)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(pref === full, s"prefix filter lost/invented pairs at t=$t")
    }
  }

  test("MAD outliers catch the spike that masks itself under 3-sigma") {
    import spark.implicits._
    import java.sql.Timestamp
    // one wild value among 8: it inflates sigma enough that its own
    // z-score is sqrt(7) < 3 (rxOutliers stays silent — the masking
    // problem), while median/MAD barely move and flag it
    val vals = Seq(9.8, 9.9, 9.95, 10.0, 10.05, 10.1, 10.2, 1000.0)
    val events = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"),
        1L, "m", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Reactive.rxOutliers(events).count() === 0L)
    val mad = Reactive.rxOutliersMad(events).collect()
    assert(mad.map(_.getDouble(2)).toSeq === Seq(1000.0))
    // med = 10.025, mad = 0.1 (up to interpolation ulp — the DuckDB
    // gate, not this test, owns bit-exactness)
    assert(math.abs(mad.head.getDouble(3) - 10.025) < 1e-9)
    assert(math.abs(mad.head.getDouble(4) - 0.1) < 1e-9)
  }

  test("recallAudit: probing every list is exact recall 1.0; narrower probes only lose") {
    import graft.operators.Similarity
    val embs = Tables.embeddings(spark, sf)
    val queries = embs.filter(col("vec_id") < 10)
    // nprobe = nlist: the IVF candidate set IS the corpus, so the
    // audit must read exactly 1.0 for every query — an identity, not
    // a tolerance
    val full = Similarity.recallAudit(embs, queries, nprobe = 16)
      .collect()
    assert(full.nonEmpty)
    assert(full.forall(_.getDouble(2) === 1.0))
    // default probe width: recall can only be <= the full probe's
    val partial = Similarity.recallAudit(embs, queries)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(partial.values.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("dqCheck counts every violation class on deliberately dirty tables") {
    import spark.implicits._
    // the sf tables are clean (all checks 0 at the driver gate), so
    // the violation arithmetic must be proven on dirty data here
    val orders = Seq(
      (1L, 10L, 5.0),   // clean
      (2L, 99L, -1.0),  // orphan custkey + non-positive total
      (2L, 10L, 3.0)    // duplicate o_orderkey
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq(Tuple1(10L)).toDF("c_custkey")
    val lineitem = Seq(
      (1L, 1L, 10.0, 0.05), // clean
      (1L, 1L, 60.0, 0.20), // dup (orderkey, linenumber) + qty + disc
      (5L, 1L, 0.0, 0.05)   // orphan orderkey + qty=0
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val out = graft.operators.Relational
      .dqCheck(lineitem, orders, customer)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "orders_fk_customer" -> 1L,
      "lineitem_fk_orders" -> 1L,
      "lineitem_qty_range" -> 2L,
      "lineitem_discount_range" -> 1L,
      "lineitem_pk_unique" -> 1L,
      "orders_pk_unique" -> 1L,
      "orders_positive_total" -> 1L))
  }

  test("pageRankTrade matches the hand-computed fixed-point recurrence") {
    import spark.implicits._
    // 2 nations, one edge 0→1 (weight 2): after one iteration
    // r(B) = base + 0.85 * r0(A), r(A) = base (no inbound), with
    // base = 15% of S/N — all in the op's exact integer arithmetic
    val nation = Seq((0, "ALPHA"), (1, "BRAVO"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((100L, 0)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((200L, 1)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((1L, 200L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 100L), (1L, 100L))
      .toDF("l_orderkey", "l_suppkey")
    val out = graft.operators.Graph
      .pageRankTrade(lineitem, orders, customer, supplier, nation,
        iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = ((1000000000000L / 2) * 15) / 100 // 75e9
    assert(out("ALPHA") === base)
    assert(out("BRAVO") === base + (500000000000L * 85) / 100)
  }
}
