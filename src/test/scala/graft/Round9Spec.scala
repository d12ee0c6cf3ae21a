package graft

import org.apache.spark.sql.functions.{col, max, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-9 additions: order-statistics telemetry (LIS, mean-crossing
  * runs), weighted SSSP, and the bloom admission tier — planted
  * cases pin the invariants the oracles can't isolate. */
class Round9Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("rxLis: sorted, reversed, and the classic mixed series") {
    val ev = (
      (1 to 6).map(i => (i.toLong, 1L, i.toDouble)) ++
        (1 to 6).map(i => (i.toLong, 2L, (7 - i).toDouble)) ++
        Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0).zipWithIndex.map {
          case (v, i) => ((i + 1).toLong, 3L, v)
        }).toDF("event_id", "user_id", "value")
    val got = Reactive.rxLis(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((6L, 6L))) // sorted arrivals: LIS = n
    assert(got(2L) === ((6L, 1L))) // reversed: LIS = 1
    assert(got(3L) === ((8L, 4L))) // 3 1 4 1 5 9 2 6 -> 1,4,5,9
  }

  test("rxSignChanges: flips over the nonzero subsequence, zeros " +
      "break above-mean runs") {
    val ev = (
      Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0)) ++ // mean 2
        Seq((1L, 2L, 1.0), (2L, 2L, 3.0), (3L, 2L, 1.0),
          (4L, 2L, 3.0)) ++                               // mean 2
        Seq((1L, 3L, 5.0), (2L, 3L, 5.0), (3L, 3L, 5.0))  // constant
      ).toDF("event_id", "user_id", "value")
    val got = Reactive.rxSignChanges(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // user 1: signs -1,0,+1 -> nonzero seq [-1,+1] = 1 flip; the
    // at-mean zero breaks nothing above (single +1 run of length 1)
    assert(got(1L) === ((3L, 1L, 1L)))
    // user 2: -1,+1,-1,+1 -> 3 flips, above-runs all length 1
    assert(got(2L) === ((4L, 3L, 1L)))
    // constant key: all zeros -> no flips, no above-mean run
    assert(got(3L) === ((3L, 0L, 0L)))
  }

  test("ssspTrade: cheap 2-hop beats the expensive direct lane; " +
      "unreachable nations report -1") {
    val nation = Seq((0, "A"), (1, "B"), (2, "C"), (3, "D"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 0), (11L, 2))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 1), (21L, 2))
      .toDF("c_custkey", "c_nationkey")
    // orders: o1 cust 20 (nation 1), o2 cust 21 (nation 2)
    val orders = Seq((100L, 20L), (101L, 21L))
      .toDF("o_orderkey", "o_custkey")
    // edge 0->1: w=1 (cost 1000000); edge 0->2: w=4 (cost 250000);
    // edge 2->1: w=5 (cost 200000) -> dist(1) = 450000 via 2 hops
    val lineitem = (
      Seq((100L, 10L)) ++
        Seq.fill(4)((101L, 10L)) ++
        Seq.fill(5)((100L, 11L))).toDF("l_orderkey", "l_suppkey")
    val got = Graph.ssspTrade(lineitem, orders, customer, supplier,
        nation).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(0L -> 0L, 1L -> 450000L, 2L -> 250000L,
      3L -> -1L))
  }

  test("rxKendallTau: perfect concordance, perfect discordance, and " +
      "tie accounting") {
    val ev = (
      (1 to 5).map(i => (i.toLong, 1L, i.toDouble)) ++        // tau +1
        (1 to 5).map(i => (i.toLong, 2L, (6 - i).toDouble)) ++ // tau -1
        Seq((1L, 3L, 2.0), (2L, 3L, 2.0), (3L, 3L, 5.0))       // one tie
      ).toDF("event_id", "user_id", "value")
    val got = Reactive.rxKendallTau(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) === ((10L, 10L, 0L, 0L, 1000000L)))
    assert(got(2L) === ((10L, 0L, 10L, 0L, -1000000L)))
    // user 3: pairs (1,2) tie, (1,3) conc, (2,3) conc
    assert(got(3L) === ((3L, 2L, 0L, 1L, 666666L)))
  }

  test("rxXcorr: exact centi-unit lag products") {
    val ev = Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0))
      .toDF("event_id", "user_id", "value")
    val r = Reactive.rxXcorr(ev).collect()(0)
    // c = 100, 200, 300
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 100L * 100 + 200L * 200 + 300L * 300)
    assert(r.getLong(3) === 100L * 200 + 200L * 300)
    assert(r.getLong(4) === 100L * 300)
    assert(r.getLong(5) === 0L)
  }

  test("closenessTrade: per-source totals match single-source sssp") {
    val nation = Seq((0, "A"), (1, "B"), (2, "C"), (3, "D"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 0), (11L, 2)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 1), (21L, 2)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 20L), (101L, 21L)).toDF("o_orderkey", "o_custkey")
    val lineitem = (Seq((100L, 10L)) ++ Seq.fill(4)((101L, 10L)) ++
      Seq.fill(5)((100L, 11L))).toDF("l_orderkey", "l_suppkey")
    val got = Graph.closenessTrade(lineitem, orders, customer, supplier,
        nation).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // node 0 reaches {0,1,2}: dist 0 + 450000 + 250000
    assert(got(0L) === ((3L, 700000L)))
    // node 2 reaches {2,1}: 0 + 200000
    assert(got(2L) === ((2L, 200000L)))
    // nodes 1 and 3 reach only themselves
    assert(got(1L) === ((1L, 0L)) && got(3L) === ((1L, 0L)))
  }

  test("rxCadence: metronome cadence scores 0, bursty scores high") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = (
      (1 to 5).map(i => (i.toLong, 1L, t(i * 2))) ++        // exact 2-min
        Seq((1L, 2L, t(1)), (2L, 2L, t(2)), (3L, 2L, t(3)),
          (4L, 2L, t(40)))                                  // burst + gap
      ).toDF("event_id", "user_id", "ts")
    val got = Reactive.rxCadence(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(5)))).toMap
    assert(got(1L) === ((4L, 120000L, 0L))) // constant gaps: CV^2 = 0
    val (n2, mean2, cv2) = got(2L)
    assert(n2 === 3L && mean2 === (60000L * 39) / 3)
    assert(cv2 > 1000000L) // burstier than Poisson
  }

  test("shingleSpectrum: a planted repeated shingle lands in the " +
      "right df bucket") {
    // 4 docs share one 3-token shingle; each also has unique tail
    val docs = Seq.tabulate(4)(i =>
      ((i + 1).toLong, s"alpha beta gamma tail$i extra$i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.shingleSpectrum(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // df=4 shingle ("alpha beta gamma") -> log2 bucket 2; the
    // per-doc unique shingles (df=1) -> bucket 0
    assert(got(2L) === ((1L, 4L, 4L)))
    assert(got(0L)._1 === 8L) // 2 unique shingles per doc x 4 docs
  }

  test("packBfd: largest-first best-fit uses fewer bins than " +
      "arrival-order first-fit on the adversarial mix") {
    // sizes 6,5,4,3,2,2 with cap 8: FF by id (6|5|4,3|2,2...) vs
    // BFD (6,2|5,3|4,2... ) — classic BFD win
    val docs = Seq((1L, "s", 6L), (2L, "s", 5L), (3L, "s", 4L),
      (4L, "s", 3L), (5L, "s", 2L), (6L, "s", 2L))
      .toDF("doc_id", "source", "n_chars")
    val bfd = Packing.packBfd(docs, capacity = 8L, shards = 1)
    val ff = Packing.packGreedy(docs, capacity = 8L, shards = 1)
    val bfdBins = bfd.count()
    val ffBins = ff.count()
    assert(bfdBins <= ffBins)
    assert(bfdBins === 3L) // 6+2, 5+3, 4+2 — perfect fill
    // capacity is never exceeded and every doc is packed once
    assert(bfd.agg(max("bin_chars")).head().getLong(0) <= 8L)
    assert(bfd.agg(sum("n_docs")).head().getLong(0) === 6L)
  }

  test("classUpsample: per-class totals equal the largest class " +
      "exactly; copy ids dense from 1") {
    val docs = (Seq.tabulate(6)(i => ((i + 1).toLong, "en")) ++
      Seq((10L, "fr"), (11L, "fr")) ++ Seq((20L, "de")))
      .toDF("doc_id", "lang")
    val got = Sampling.classUpsample(docs)
    val per = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per === Map("en" -> 6L, "fr" -> 6L, "de" -> 6L))
    // de: one doc carries all 6 copies, ids 1..6
    val de = got.filter(col("lang") === "de")
      .select("copy_id").collect().map(_.getLong(0)).sorted
    assert(de.toSeq === (1L to 6L))
  }

  test("graph loops survive an edgeless graph: every node is its " +
      "own SCC at layer 0, unreachable everywhere, 0-reciprocal") {
    val nation = Seq((0, "A"), (1, "B")).toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 0)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 0)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 20L)).toDF("o_orderkey", "o_custkey")
    // the only trade lane is a self-loop (nation 0 -> nation 0),
    // which every op in the family drops: the edge set is EMPTY
    val lineitem = Seq((100L, 10L)).toDF("l_orderkey", "l_suppkey")
    val scc = Graph.sccTrade(lineitem, orders, customer, supplier,
        nation).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(scc === Map(0L -> ((0L, 1L)), 1L -> ((1L, 1L))))
    val lay = Graph.topoLayersTrade(lineitem, orders, customer,
        supplier, nation).collect().map(r => r.getLong(3)).distinct
    assert(lay.toSeq === Seq(0L))
    val sssp = Graph.ssspTrade(lineitem, orders, customer, supplier,
        nation).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sssp === Map(0L -> 0L, 1L -> -1L))
    assert(Graph.reciprocityTrade(lineitem, orders, customer,
      supplier, nation).count() === 0) // no out-edges anywhere
  }

  test("sccTrade: a planted 2-cycle, a chain tail, and an isolate") {
    // 0 <-> 1 (one SCC), 1 -> 2 (tail, own SCC), 3 isolated
    val nation = Seq((0, "A"), (1, "B"), (2, "C"), (3, "D"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 1), (21L, 0), (22L, 2))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 20L), (101L, 21L), (102L, 22L))
      .toDF("o_orderkey", "o_custkey")
    // edges: 0->1 (s10,o100), 1->0 (s11,o101), 1->2 (s11,o102)
    val lineitem = Seq((100L, 10L), (101L, 11L), (102L, 11L))
      .toDF("l_orderkey", "l_suppkey")
    val got = Graph.sccTrade(lineitem, orders, customer, supplier,
        nation).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) === ((0L, 2L)) && got(1L) === ((0L, 2L)))
    assert(got(2L) === ((2L, 1L)) && got(3L) === ((3L, 1L)))
  }

  test("minhashAdmitIndexed: verdicts equal the batch probe rollup, " +
      "with and without the literal pushdown") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different corpus content about spark engines here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("mh_idx9").toString
    Dedup.minhashWriteIndex(corpus, dir, auditable = true)
    val wave = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again ok"),
      (11L, "entirely novel text that shares no shingles with anything"),
      (12L, "completely different corpus content about spark engines here"))
      .toDF("doc_id", "text")
    val probe = Dedup.minhashProbeIndex(spark, dir, wave,
        auditable = true)
      .groupBy("doc2")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_dup"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.floor(
            col("jaccard") * 1e6).cast("long")).as("best"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    for (cap <- Seq(100000, 0)) { // pushdown on / forced full-scan
      val got = Dedup.minhashAdmitIndexed(spark, dir, wave,
          auditable = true, pushdownCap = cap)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      for (id <- Seq(10L, 12L); (n, b) = probe(id))
        assert(got(id) === ((n, b, false)), s"doc $id cap $cap")
      assert(got(11L) === ((0L, -1L, true)), s"cap $cap")
    }
  }

  test("bloomAdmitStream: per-doc verdicts equal the batch audit " +
      "across a trigger split; zero keyed state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val corpus = Seq((1L, "shared corpus text alpha"),
      (2L, "another corpus text beta")).toDF("doc_id", "text")
    val positions = corpus
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.trim(col("text"))))
        .as("content_hash"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(0, 2), j -> CAST(conv(substr(md5(" +
            "concat('bloom', j, ':', content_hash)), 1, 15), 16, 10)" +
            s" AS BIGINT) % ${1L << 20})")).as("pos"))
      .distinct()
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val qn = s"bloom_${System.nanoTime()}"
    val q = graft.streaming.ReactiveStreams.bloomAdmitStream(
        mem.toDF().toDF("doc_id", "ts", "text"), positions)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      mem.addData((10L, t(0), "shared corpus text alpha")) // exact dup
      q.processAllAvailable()
      mem.addData((11L, t(1), "entirely new text gamma"))
      mem.addData((99L, java.sql.Timestamp.valueOf(
        "2024-01-01 09:00:00"), "watermark closer"))
      q.processAllAvailable()
      val got = spark.table(qn).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3))))
        .toMap
      assert(got(10L) === ((true, false)))  // dup: bloom-hit
      assert(got(11L) === ((false, true))) // new: some bit unset
      // the plan carries no flatMapGroupsWithState / keyed state op
      val exec = q.asInstanceOf[org.apache.spark.sql.execution
          .streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("FlatMapGroupsWithState"),
        s"bloom admission must be stateless:\n$exec")
    } finally q.stop()
  }

  test("bloomAdmit: exact dups always bloom-hit (no false " +
      "negatives), false positives = hits minus exact dups") {
    val docs = Seq(
      (1L, "src1", "shared corpus text alpha"),
      (2L, "src1", "another corpus text beta"),
      (3L, "src16", "shared corpus text alpha"), // exact dup
      (4L, "src16", "entirely new text gamma")   // definitely new
    ).toDF("doc_id", "source", "text")
    val r = Dedup.bloomAdmit(docs, Seq("src16", "src17", "src18",
        "src19")).collect()
    assert(r.length === 1)
    val (nb, nh, nd, nfp) = (r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4))
    assert(nb === 2L && nd === 1L)
    assert(nh >= nd)           // false negatives impossible
    assert(nfp === nh - nd)    // the audit identity
    assert(nh === 1L && nfp === 0L) // 3/2^20 collision never planted
  }
}
