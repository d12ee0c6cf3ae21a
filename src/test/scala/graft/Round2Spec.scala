package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Reactive, Similarity, TextAnalysis}
import graft.sources.Tables

/** Semantic checks for the round-2 operators (the DuckDB oracle
  * covers exact values; these assert the operator invariants on
  * hand-built inputs and recall floors for the approximate paths). */
class Round2Spec extends AnyFunSuite {
  import TestSession._
  private lazy val ev = Tables.events(spark, sf).cache()

  test("IVF ANN recall against brute force, and hits are real neighbors") {
    val embs = Tables.embeddings(spark, sf)
    val qs = embs.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(embs, qs, 5))
    val ivf = pairs(Similarity.ivfTopK(embs, qs, nlist = 16, nprobe = 4, k = 5))
    assert(ivf.nonEmpty)
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall $recall too low for nprobe=4/16 IVF")
    // probing every list IS brute force: recall must be exactly 1
    val full = pairs(Similarity.ivfTopK(embs, qs, nlist = 16, nprobe = 16, k = 5))
    assert(full === bf, "nprobe=nlist IVF must equal brute force")
  }

  test("as-of join picks the latest right row at-or-before, per key") {
    import spark.implicits._
    val left = Seq((10L, 1L, "p1"), (30L, 1L, "p2"), (5L, 2L, "p3"))
      .toDF("seq", "key", "l_tag")
    val right = Seq((9L, 1L, 100.0), (10L, 1L, 200.0), (29L, 1L, 300.0),
      (31L, 1L, 400.0), (7L, 2L, 500.0))
      .toDF("seq", "key", "payload")
    val out = AsOf.join(left, right, "key", "seq", Seq("payload"))
      .select("seq", "key", "l_tag", "asof_payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (10L, 1L, "p1", Some(200.0)),  // tie at seq=10: right row included
      (30L, 1L, "p2", Some(300.0)),  // 31 is after, 29 is the latest prior
      (5L, 2L, "p3", None)))         // right row at 7 is later: no match
  }

  test("rxRetry keeps events through n errors and stops at the terminal one") {
    import spark.implicits._
    val events = Seq(
      (1L, 7L, "click", 1.0), (2L, 7L, "error", 0.0), (3L, 7L, "click", 2.0),
      (4L, 7L, "error", 0.0), (5L, 7L, "click", 3.0), (6L, 7L, "error", 0.0),
      (7L, 7L, "click", 4.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val ids = Reactive.rxRetry(events, n = 2).select("event_id")
      .collect().map(_.getLong(0)).toSet
    // events 1..5 survive (errors 1 and 2 are retried through); the
    // 3rd error (id 6) is terminal and emitted; 7 is after the stop
    assert(ids === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("rxSequenceEqual is true iff both streams bucket identically") {
    import spark.implicits._
    val events = Seq(
      // user 1: purchase buckets (1, 2) == view buckets (1, 2)
      (1L, 1L, "purchase", 60.0), (2L, 1L, "view", 70.0),
      (3L, 1L, "purchase", 110.0), (4L, 1L, "view", 120.0),
      // user 2: purchase (1) vs view (3)
      (5L, 2L, "purchase", 60.0), (6L, 2L, "view", 160.0),
      // user 3: lengths differ (one purchase, no view)
      (7L, 3L, "purchase", 60.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = Reactive.rxSequenceEqual(events).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("rxIntervalJoin pairs only clicks in the purchase's trailing window") {
    val out = Reactive.rxIntervalJoin(ev, windowMs = 600000L)
    assert(out.count() > 0)
    assert(out.filter(col("gap_ms") < 0 || col("gap_ms") > 600000L).count() === 0)
  }

  test("connected components merges chains and leaves singletons alone") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {5,6}; {7} alone
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("doc1", "doc2")
    val nodes = (1L to 7L).toDF("doc_id")
    val got = graft.operators.Dedup.connectedComponents(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("stratified sample keeps strata rates deterministic") {
    val docs = Tables.documents(spark, sf)
    val s1 = TextAnalysis.stratifiedSample(docs).collect().map(_.getLong(0)).toSet
    val s2 = TextAnalysis.stratifiedSample(docs).collect().map(_.getLong(0)).toSet
    assert(s1 === s2 && s1.nonEmpty)
  }

  test("typed Dataset loaders round-trip case classes and typed ops work") {
    val evs = Tables.eventsDs(spark, sf)
    val first = evs.filter((e: Tables.Event) => e.value > 100.0).head()
    assert(first.value > 100.0)
    val docs = Tables.documentsDs(spark, sf)
    assert(docs.map((d: Tables.Document) => d.text.length)(
      org.apache.spark.sql.Encoders.scalaInt).head() > 0)
    val li = Tables.lineitemDs(spark, sf)
    assert(li.head().l_orderkey >= 0L)
    val os = Tables.ordersDs(spark, sf)
    assert(os.head().o_orderdate != null)
    val em = Tables.embeddingsDs(spark, sf)
    assert(em.head().embedding.nonEmpty)
  }

  test("qualityFilterPipeline output is deduped and within thresholds") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.qualityFilterPipeline(docs).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_tokens") < 5 || col("n_tokens") > 1000 ||
      col("uniq_ratio") < 0.3).count() === 0)
    // no two surviving docs share a content hash
    val withHash = docs.withColumn("h", md5(lower(trim(col("text")))))
      .select("doc_id", "h")
    val kept = out.join(withHash, "doc_id")
    assert(kept.groupBy("h").count().filter(col("count") > 1).count() === 0)
  }
}
