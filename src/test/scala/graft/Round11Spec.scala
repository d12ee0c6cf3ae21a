package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph}

/** Round-11 additions: key-level PageRank / reciprocity over the
  * repeat-business graph, triangles + local clustering over the
  * capped co-sourcing projection, and the indexed (foreachBatch)
  * streaming admission path. */
class Round11Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** The Round10Spec repeat-business fixture — known arc set:
    * 2↔3, 2→5, 4↔5, 6→7, 8↔7, 8→9, 6↔9, 10→11, 12→11
    * (one sub-threshold pair contributes no arc). */
  private def fixture: (DataFrame, DataFrame) = {
    val pairs = Seq(
      (1L, 1L, 2, 2), (1L, 2L, 2, 0), (2L, 2L, 2, 2),
      (3L, 3L, 2, 0), (4L, 3L, 2, 2), (4L, 4L, 2, 0),
      (3L, 4L, 2, 2), (5L, 5L, 2, 0), (6L, 5L, 2, 0),
      (1L, 5L, 1, 0))
    val orders = pairs.map(_._1).distinct
      .map(c => (c * 1000L, c)).toDF("o_orderkey", "o_custkey")
    val lineitem = pairs.flatMap { case (c, s, n, nr) =>
      (0 until n).map(i =>
        (c * 1000L, s, if (i < nr) "R" else "N"))
    }.toDF("l_orderkey", "l_suppkey", "l_returnflag")
    (lineitem, orders)
  }

  private val fixtureArcs: Seq[(Long, Long)] = Seq(
    (2L, 3L), (3L, 2L), (2L, 5L), (4L, 5L), (5L, 4L),
    (6L, 7L), (8L, 7L), (7L, 8L), (8L, 9L), (6L, 9L), (9L, 6L),
    (10L, 11L), (12L, 11L))

  /** Independent driver-side re-derivation of the fixed-point
    * integer PageRank (same scale-1e12 / ppm-fraction / 85-100
    * damping arithmetic, different code path). */
  private def refPageRank(arcs: Seq[(Long, Long)],
                          iters: Int): Map[Long, Long] = {
    val S = 1000000000000L
    val nodes = (arcs.map(_._1) ++ arcs.map(_._2)).distinct.sorted
    val n = nodes.length
    val base = ((S / n) * 15L) / 100L
    val od = arcs.groupBy(_._1).map { case (k, v) => k -> v.length }
    var pr = nodes.map(_ -> S / n).toMap
    for (_ <- 0 until iters) {
      val contrib = arcs
        .map { case (a, b) => b -> (pr(a) * (1000000L / od(a))) / 1000000L }
        .groupBy(_._1).map { case (b, ts) => b -> ts.map(_._2).sum }
      pr = nodes.map(nd =>
        nd -> (base + (contrib.getOrElse(nd, 0L) * 85L) / 100L)).toMap
    }
    pr
  }

  test("pageRankKeysTrade matches an independent integer PageRank " +
      "on the hand-built arc set; sinks beat sources") {
    val (li, ord) = fixture
    val got = Graph.pageRankKeysTrade(li, ord).collect()
      .map(r => r.getLong(1) -> ((r.getString(0), r.getLong(2))))
      .toMap
    val expected = refPageRank(fixtureArcs, 3)
    assert(got.keySet === expected.keySet)
    for ((nd, pr) <- expected) {
      val (tpe, gotPr) = got(nd)
      assert(gotPr === pr, s"node $nd")
      assert(tpe === (if (nd % 2 == 0) "cust" else "supp"))
    }
    // 11 has two pure-source feeders (10, 12) plus nothing leaving:
    // it must outrank both of its dangling-in feeders
    assert(got(11L)._2 > got(10L)._2 && got(11L)._2 > got(12L)._2)
  }

  test("reciprocityKeysTrade: per-node reciprocated out-arc ratios " +
      "on the hand-built graph") {
    val (li, ord) = fixture
    val got = Graph.reciprocityKeysTrade(li, ord).collect()
      .map(r => r.getLong(1) ->
        ((r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expected = Map(
      2L -> (("cust", 2L, 1L, 500000L)),
      3L -> (("supp", 1L, 1L, 1000000L)),
      4L -> (("cust", 1L, 1L, 1000000L)),
      5L -> (("supp", 1L, 1L, 1000000L)),
      6L -> (("cust", 2L, 1L, 500000L)),
      7L -> (("supp", 1L, 1L, 1000000L)),
      8L -> (("cust", 2L, 1L, 500000L)),
      9L -> (("supp", 1L, 1L, 1000000L)),
      10L -> (("cust", 1L, 0L, 0L)),
      12L -> (("cust", 1L, 0L, 0L)))
    assert(got === expected) // node 11 has no out-arcs: absent
  }

  /** Co-sourcing fixture: custs 1, 2, 3 each buy from supps 1 and 2
    * (pairwise 2 shared suppliers → a triangle); cust 4 shares only
    * one supplier with anyone (edge-free under minShared = 2), cust
    * 5 likewise. */
  private def coFixture: (DataFrame, DataFrame) = {
    val buys = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 1L), (4L, 3L), (5L, 3L))
    val orders = buys.map(_._1).distinct
      .map(c => (c * 1000L, c)).toDF("o_orderkey", "o_custkey")
    val lineitem = buys.map { case (c, s) => (c * 1000L, s, "N") }
      .toDF("l_orderkey", "l_suppkey", "l_returnflag")
    (lineitem, orders)
  }

  test("trianglesKeysTrade: the 2-shared-supplier triple forms one " +
      "triangle; single-shared pairs stay edge-free") {
    val (li, ord) = coFixture
    val got = Graph.trianglesKeysTrade(li, ord).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusteringKeysTrade: cc = 1 inside the closed triple; " +
      "degrees come from the projection") {
    val (li, ord) = coFixture
    val got = Graph.clusteringKeysTrade(li, ord).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L))))
  }

  test("clusteringKeysTrade: degree-1 node reports NULL cc (open " +
      "pair, undefined not zero)") {
    // custs 1, 2 share two suppliers; cust 3 shares two with 1 only
    val buys = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L), (1L, 3L), (1L, 4L))
    val orders = buys.map(_._1).distinct
      .map(c => (c * 1000L, c)).toDF("o_orderkey", "o_custkey")
    val lineitem = buys.map { case (c, s) => (c * 1000L, s, "N") }
      .toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val rows = Graph.clusteringKeysTrade(lineitem, orders).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L
          else r.getLong(3)))).toMap
    // cust 1 bridges both pairs (deg 2, open wedge → cc 0);
    // custs 2 and 3 are pendants (deg 1 → NULL)
    assert(rows === Map(
      1L -> ((2L, 0L, 0L)),
      2L -> ((1L, 0L, -1L)),
      3L -> ((1L, 0L, -1L))))
  }

  test("pprKeysTrade: teleport mass stays on the seeds; non-seed " +
      "rank is pure propagation (hand graph, independent reference)") {
    val (li, ord) = fixture
    val customer = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 0L), (6L, 1L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((0L, "AAA"), (1L, "BBB"))
      .toDF("n_nationkey", "n_name")
    // seeds: custs 1 and 5 (nation AAA) -> nodes 2, 10
    val seeds = Set(2L, 10L)
    val S = 1000000000000L
    val base = ((S / seeds.size) * 15L) / 100L
    val od = fixtureArcs.groupBy(_._1).map { case (k, v) => k -> v.length }
    var pr = seeds.map(_ -> S / seeds.size).toMap
      .withDefaultValue(0L)
    for (_ <- 0 until 3) {
      val contrib = fixtureArcs
        .map { case (a, b) =>
          b -> (pr(a) * (1000000L / od(a))) / 1000000L }
        .groupBy(_._1).map { case (b, ts) => b -> ts.map(_._2).sum }
        .withDefaultValue(0L)
      val frame = seeds ++ contrib.keys
      pr = frame.map(nd => nd ->
        ((if (seeds(nd)) base else 0L) + (contrib(nd) * 85L) / 100L))
        .toMap.withDefaultValue(0L)
    }
    val expected = pr.filter(_._2 > 0L)
    val got = Graph.pprKeysTrade(li, ord, customer, nation).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === expected)
    // the {6,7,8,9} component and the pure sources 12 (unseeded)
    // are unreachable from seeds {2, 10}: absent from the frame
    assert(Seq(6L, 7L, 8L, 9L, 12L).forall(n => !got.contains(n)))
    // 11 IS reached (10 -> 11) purely by propagation
    assert(got.contains(11L))
  }

  test("cosourceComponents: the closed triple is one segment; " +
      "edge-free customers are absent") {
    val (li, ord) = coFixture
    val got = Graph.cosourceComponents(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("canonicalSelection: longest member survives, ties to the " +
      "smallest doc_id, singletons survive themselves") {
    // 1 and 2 near-dup (2 longer -> 2 survives); 3 and 4 exact
    // same length (tie -> 3); 5 clean singleton
    val docs = Seq(
      (1L, "s", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "s", "alpha beta gamma delta epsilon zeta eta theta iota extra"),
      (3L, "s", "one two three four five six seven eight nine"),
      (4L, "s", "one two three four five six seven eight ten"),
      (5L, "s", "completely unrelated content about spark engines"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.canonicalSelection(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 10L, 2L, 1L)),
      3L -> ((2L, 9L, 3L, 1L)),
      5L -> ((1L, 6L, 5L, 0L))))
  }

  test("minhashAdmitIndexedStream: foreachBatch verdicts across a " +
      "trigger split equal the batch indexed probe per wave") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different corpus content about spark engines here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("mh_idx11").toString
    Dedup.minhashWriteIndex(corpus, dir, auditable = true)
    val wave1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again ok"))
    val wave2 = Seq(
      (11L, "entirely novel text that shares no shingles with anything"),
      (12L, "completely different corpus content about spark engines here"))
    val mem = MemoryStream[(Long, String)]
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Boolean)]
    val q = graft.streaming.ReactiveStreams.minhashAdmitIndexedStream(
      mem.toDF().toDF("doc_id", "text"), dir,
      v => buf.synchronized {
        buf ++= v.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      }, auditable = true)
    try {
      mem.addData(wave1: _*); q.processAllAvailable()
      mem.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = buf.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val batch = (Dedup.minhashAdmitIndexed(spark, dir,
        wave1.toDF("doc_id", "text"), auditable = true).collect() ++
      Dedup.minhashAdmitIndexed(spark, dir,
        wave2.toDF("doc_id", "text"), auditable = true).collect())
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === batch)
    assert(got(10L)._3 === false && got(11L)._3 === true &&
      got(12L) === ((1L, 1000000L, false)))
  }
}
