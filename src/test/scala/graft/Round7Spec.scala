package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.sources.Tables

/** Round-7 additions: capped-cluster kNN graph/hubness, the narrow
  * top-R preference kernel, and sort-free class balancing. */
class Round7Spec extends AnyFunSuite {
  import TestSession._

  test("cosineTopR: reproduces the rank-window order incl. ties, any R") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    def fa(xs: Float*) = new GenericArrayData(xs.toArray[Any])
    // centroids sorted by id; ids 2 and 3 are DUPLICATE vectors, so
    // their cosines tie exactly and the smaller id must rank first
    val cents = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0L, fa(1f, 0f))),
      new GenericInternalRow(Array[Any](1L, fa(0f, 1f))),
      new GenericInternalRow(Array[Any](2L, fa(1f, 1f))),
      new GenericInternalRow(Array[Any](3L, fa(1f, 1f)))))
    val vec = fa(2f, 1f)
    // cos to 0: 2/√5≈0.894; to 1: 1/√5≈0.447; to 2,3: 3/√10≈0.949
    for (r <- 1 to 6) {
      val out = graft.functions.Kernels.cosineTopR(vec, cents, r)
      val ids = (0 until out.numElements())
        .map(i => out.getStruct(i, 2).getLong(0))
      val expect = Seq(2L, 3L, 0L, 1L).take(math.min(r, 4))
      assert(ids === expect, s"R=$r order wrong: $ids")
      // sims must be non-increasing in rank order
      val sims = (0 until out.numElements())
        .map(i => out.getStruct(i, 2).getDouble(1))
      assert(sims === sims.sorted.reverse)
    }
  }

  test("cappedAssign narrow-kernel prefs == full rank-window prefs") {
    // the round-7 rewrite replaced the n×nlist crossJoin + rank
    // window with the top-R kernel; the assignment must be row-for-
    // row identical to the window formulation it replaced
    val embs = Tables.embeddings(spark, sf)
    val nlist = 16
    import org.apache.spark.sql.expressions.Window
    val cents = embs.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val total = embs.agg(count(lit(1)).as("bign"))
    val prefsRef = embs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_sim",
        graft.functions.GraftFunctions.cosine_sim(col("embedding"), col("c_emb")))
      .withColumn("pref", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("centroid_id"))))
      .filter(col("pref") <= 3)
      .select("vec_id", "pref", "centroid_id", "cos_sim")
    val centsRow = cents.agg(array_sort(collect_list(struct(
      col("centroid_id").cast("long").as("centroid_id"), col("c_emb"))))
      .as("cents"))
    val prefsKernel = embs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centsRow))
      .select(col("vec_id"), posexplode(
        graft.functions.GraftFunctions.cosine_top_r(
          col("embedding"), col("cents"), 3)))
      .select(col("vec_id"), (col("pos") + 1).as("pref"),
        col("col.centroid_id").as("centroid_id"),
        col("col.cos_sim").as("cos_sim"))
    assert(prefsRef.exceptAll(prefsKernel).count() === 0)
    assert(prefsKernel.exceptAll(prefsRef).count() === 0)
  }

  test("knnGraphCapped: full coverage, caps bound every cluster, " +
      "edges stay strictly within a cluster") {
    val embs = Tables.embeddings(spark, sf)
    val n = embs.count()
    val targetList = 50 // small target so several clusters exist here
    val nlist = (n + targetList - 1) / targetList
    val cap = (n * 5 + 4 * nlist - 1) / (4 * nlist)
    val g = Similarity.knnGraphCapped(embs, k = 3,
      targetList = targetList).cache()
    val bySrc = g.groupBy("src_id").agg(
      countDistinct("cluster_id").as("nc"), count(lit(1)).as("deg"))
    // every source's edges live in exactly one cluster, degree <= k
    assert(bySrc.filter(col("nc") =!= 1).count() === 0)
    assert(bySrc.agg(max("deg")).head.getLong(0) <= 3)
    // every vector is assigned at this slack (25%) and appears as a
    // source (cluster size >= 2 whenever any cluster has >= 2 members
    // -- with cap >= 2 and n >= 2 every cluster of size 1 is possible
    // only if acceptance left it alone; just assert coverage bound)
    val srcs = g.select("src_id").distinct().count()
    assert(srcs <= n)
    // cluster sizes bounded by the cap
    val sizes = g.select("cluster_id", "src_id").distinct()
      .groupBy("cluster_id").count()
    assert(sizes.agg(max("count")).head.getLong(0) <= cap,
      s"cluster above cap $cap")
    g.unpersist()
  }

  test("hubnessAuditCapped: histogram mass equals the assigned universe") {
    val embs = Tables.embeddings(spark, sf)
    val hist = Similarity.hubnessAuditCapped(embs, k = 3,
      targetList = 50).collect()
    val totalVecs = hist.map(_.getLong(1)).sum
    // at 25% slack the deferred acceptance empties the corpus here,
    // so the audited universe is the whole corpus
    assert(totalVecs === embs.count())
    // in-degree mass = edge count = sum(in_degree * n_vecs)
    val edges = Similarity.knnGraphCapped(embs, k = 3, targetList = 50)
      .count()
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum === edges)
  }

  test("classBalanceThreshold: near-quota per class, deterministic, " +
      "and plan has NO per-class rank window") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.classBalanceThreshold(docs).cache()
    val quota = docs.groupBy("lang").count()
      .agg(min("count")).head.getLong(0)
    val perClass = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Bernoulli at rate quota/cn: expect quota +- ~4 sigma
    val tol = math.max(4 * math.sqrt(quota.toDouble), 8.0)
    perClass.foreach { case (lang, got) =>
      assert(math.abs(got - quota) <= tol,
        s"$lang kept $got vs quota $quota (tol $tol)")
    }
    // determinism: re-derivation is identical
    val again = Sampling.classBalanceThreshold(docs)
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
    // the whole point: no per-class ranking window anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    out.unpersist()
  }

  test("cappedLloyd: iters=1 == cappedAssign; caps hold and balance " +
      "does not regress after the mean update") {
    val embs = Tables.embeddings(spark, sf)
    val one = Similarity.cappedLloyd(embs, nlist = 16, iters = 1)
    val plain = Similarity.cappedAssign(embs, nlist = 16)
    assert(one.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(one).count() === 0)
    val two = Similarity.cappedLloyd(embs, nlist = 16, iters = 2).cache()
    val n = embs.count()
    val cap = (n * 5 + 63) / 64
    val sizes = two.groupBy("centroid_id").count()
    assert(sizes.agg(max("count")).head.getLong(0) <= cap)
    // full coverage at the build SF (25% slack empties in <= 3 rounds)
    assert(two.count() === n)
    // determinism: the build is bit-stable across re-derivation
    val again = Similarity.cappedLloyd(embs, nlist = 16, iters = 2)
    assert(two.exceptAll(again).count() === 0)
    assert(again.exceptAll(two).count() === 0)
    two.unpersist()
  }

  test("ivfPqTopK: candidates confined to probed lists, ranks dense, " +
      "deterministic, and ADC top-5 overlaps the exact top-5") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopK(e, q).cache()
    // dense ranks 1..5 per query, no self-matches
    val perQ = got.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQ.filter(col("n") =!= col("mx")).count() === 0)
    assert(got.filter(col("neighbor_id") === col("query_id")).count() === 0)
    // every neighbor's coarse list is among its query's top-4 probes
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val asg = e.crossJoin(broadcast(cents))
      .withColumn("cs", graft.functions.GraftFunctions.cosine_sim(
        col("embedding"), col("c_emb")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cs").desc, col("centroid_id"))))
      .filter(col("rn") === 1).select(col("vec_id"), col("centroid_id"))
    val qprobes = q.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("cs", graft.functions.GraftFunctions.cosine_sim(
        col("q_emb"), col("c_emb")))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cs").desc, col("centroid_id"))))
      .filter(col("pr") <= 4).select("query_id", "centroid_id")
    val offList = got
      .join(asg, got("neighbor_id") === asg("vec_id"))
      .join(qprobes, Seq("query_id", "centroid_id"), "left_anti")
    assert(offList.count() === 0, "candidate outside its query's probes")
    // the compressed ranking still finds real neighbors: nonzero
    // overlap with the exact brute-force top-5 on this corpus
    val exact = Similarity.bruteForceTopK(e, q, 5)
      .select("query_id", "neighbor_id")
    assert(got.select("query_id", "neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id")).count() > 0)
    // bit-stable re-derivation
    val again = Similarity.ivfPqTopK(e, q)
    assert(got.exceptAll(again).count() === 0)
    assert(again.exceptAll(got).count() === 0)
    got.unpersist()
  }

  test("persisted IVFADC index: probe == inline ivfPqTopK, probe " +
      "prunes to its partition dirs, upsert == frozen-quantizer encode") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.ivfPqWriteIndex(e, dir)
    val probed = Similarity.ivfPqProbeIndex(spark, dir, q)
    val inline = Similarity.ivfPqTopK(e, q)
    assert(probed.exceptAll(inline).count() === 0)
    assert(inline.exceptAll(probed).count() === 0)
    // the probe must read ONLY its centroid directories
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("postings") && l.contains("PartitionFilters"))
    assert(scanLine.exists(
      _.matches(""".*PartitionFilters: \[.*centroid_id.*\].*""")),
      s"no partition filter on the postings scan:\n$plan")
    // upsert: frozen quantizers — probe after append equals scoring a
    // from-scratch encode of old+new over the BASE-trained index
    val base = e.filter(col("vec_id") % 5 =!= 0)
    val inc = e.filter(col("vec_id") % 5 === 0)
    val dir2 =
      java.nio.file.Files.createTempDirectory("graft_ivfpq_up").toString
    Similarity.ivfPqWriteIndex(base, dir2)
    Similarity.ivfPqUpsertIndex(spark, dir2, inc)
    val probed2 = Similarity.ivfPqProbeIndex(spark, dir2, q)
    val cents = spark.read.parquet(dir2 + "/centroids")
    val means = spark.read.parquet(dir2 + "/codebook")
    val expect = Similarity.ivfPqScore(
      Similarity.ivfPqEncode(e, cents, means),
      Similarity.ivfPqAdcTable(q, cents, means, 4, 4, 16), 5)
    assert(probed2.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(probed2).count() === 0)
  }

  test("collocations lift survives adversarial token totals " +
      "(DECIMAL lift path; old BIGINT product wrapped past ~9e12)") {
    import spark.implicits._
    // n_total = 1e14 tokens: the old BIGINT staging computed
    // f * n_total with f <= 1e6, wrapping past 2^63 (~9.2e18) — here
    // f*N = 5e17..1e20. Expected values re-derived with BigInt.
    val rows = Seq(
      // (n_ab, n_a, n_b, n_total)
      (50000L, 100000L, 200000L, 100000000000000L),
      (999999L, 1000000L, 1000000L, 100000000000000L),
      (1L, 2L, 9000000000000L, 100000000000000L))
    val got = rows.toDF("n_ab", "n_a", "n_b", "n_total")
      .select(TextAnalysis.liftPpm.as("lift_ppm"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val expect = rows.map { case (ab, a, b, n) =>
      val v = (BigInt(ab) * 1000000 / a) * n / b
      if (v.isValidLong) v.toLong.asInstanceOf[AnyRef] else null
    }
    assert(got.toSeq === expect)
    // all three are positive at these magnitudes — the wrapped BIGINT
    // staging returned garbage (negative) for the first two
    assert(got.forall(v => v == null || v.asInstanceOf[Long] > 0L))
    // the old BIGINT staging fails loudly under ANSI (and wrapped
    // silently pre-ANSI) at exactly these magnitudes — proof the
    // counts exercise the boundary the DECIMAL path removes
    val thrown = intercept[Exception] {
      rows.toDF("n_ab", "n_a", "n_b", "n_total")
        .select(expr("((n_ab * 1000000) div n_a) * n_total div n_b")
          .as("old"))
        .collect()
    }
    assert(thrown.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      thrown.getCause != null &&
        thrown.getCause.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"adversarial counts no longer exercise the old overflow: $thrown")
  }

  test("shared-scan pairFeatures composite == per-family derivations") {
    // the union composite now derives (sh, sig, bkey) in ONE corpus
    // scan and feeds the *From entries; pair sets must be identical
    // to the original per-family derivations, family by family
    val dd = Tables.documents(spark, sf)
    val feats = Dedup.pairFeatures(dd, auditable = true).cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc1", "doc2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(Dedup.minhashLshFrom(
        feats.select(col("doc_id"), col("sh")), auditable = true))
      === pairSet(Dedup.minhashLsh(dd, auditable = true)))
    assert(pairSet(Dedup.simhashFrom(
        feats.select(col("doc_id"), col("sig")),
        maxHamming = 3, auditable = true))
      === pairSet(Dedup.simhash(dd, maxHamming = 3, auditable = true)))
    assert(pairSet(Dedup.sortedNeighborhoodFrom(feats.select(
        col("doc_id"), array_distinct(col("sh")).as("sh"), col("bkey"))))
      === pairSet(Dedup.sortedNeighborhood(dd)))
    feats.unpersist()
  }

  test("knnGraphCapped ranking parity with a per-cluster brute force") {
    // independent re-derivation: take the capped clusters, compute
    // each member's top-k by a driver-side brute force, compare
    val embs = Tables.embeddings(spark, sf)
    val clustered = Similarity.cappedClusters(embs, 50, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val byCluster = clustered.toSeq.groupBy(_._1)
    val expect = byCluster.values.toSeq.flatMap { members =>
      members.flatMap { case (_, src, se) =>
        members.filter(_._2 != src)
          .map { case (_, dst, de) => (src, dst, cos(se, de)) }
          .sortBy { case (_, dst, c) => (-c, dst) }
          .take(3)
          .zipWithIndex
          .map { case ((s, d, _), i) => (s, i + 1L, d) }
      }
    }.toSet
    val got = Similarity.knnGraphCapped(embs, k = 3, targetList = 50)
      .select("src_id", "rank", "dst_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("unigramSurprisal: exact integer bit-length arithmetic on a " +
      "hand-computed corpus; rare vocabulary scores higher") {
    import spark.implicits._
    // corpus: 'a' x5, 'z' x1 -> T=6. floor(log2 6)=2, floor(log2 5)=2,
    // floor(log2 1)=0 => s(a)=0 bits, s(z)=2 bits.
    val docs = Seq((1L, "a a a a"), (2L, "a z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) === ((4L, 0L)))          // all-common: 0 millibits
    assert(out(2L) === ((2L, 1000L)))       // (0+2)*1000 div 2
    // on the real corpus: a doc of globally-rare tokens must outscore
    // a doc of corpus-common tokens
    val real = TextAnalysis.unigramSurprisal(Tables.documents(spark, sf))
    val n = real.count()
    assert(n === Tables.documents(spark, sf).count(),
      "every doc gets a score (model covers the whole vocabulary)")
    assert(real.filter(col("surprisal_milli") < 0).count() === 0,
      "bit-length proxy is non-negative (c <= T always)")
  }

  test("groupedKFold: folds partition clusters, manifest masses add " +
      "up, and fold ids are md5-stable") {
    val dd = Tables.documents(spark, sf)
    val labels = Dedup.connectedComponents(
      TextAnalysis.ngramJaccard(dd, minJaccard = 0.2), dd)
    val manifest = Sampling.groupedKFold(labels, dd).cache()
    val rows = manifest.collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 5))
    // every doc lands in exactly one fold; cluster count adds up
    assert(rows.map(_.getLong(2)).sum === dd.count())
    assert(rows.map(_.getLong(1)).sum ===
      labels.select("cluster_id").distinct().count(),
      "clusters partition across folds (no cluster straddles)")
    // token mass conservation: manifest total == corpus total
    val corpusTokens = dd.select(
      sum(size(TextAnalysis.tokens(col("text"))).cast("long")))
      .head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === corpusTokens)
    // md5 stability: re-derivation is identical
    val again = Sampling.groupedKFold(labels, dd)
    assert(manifest.exceptAll(again).count() === 0)
    assert(again.exceptAll(manifest).count() === 0)
  }

  test("tokenEntropy: exact at the distribution ends, identity holds, " +
      "and length(bin(x))-1 IS floor(log2 x) over adversarial longs") {
    import spark.implicits._
    // all-same -> 0; all-distinct (4 tokens) -> flog2(4)*1000 = 2000;
    // 'a a b b' -> n=4, s1 = 2*1+2*1 = 4 -> (4*2-4)*1000/4 = 1000
    val docs = Seq((1L, "x x x x x"), (2L, "a b c d"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((5L, 0L)))
    assert(got(2L) === ((4L, 2000L)))
    assert(got(3L) === ((4L, 1000L)))
    // the engine-side flog2: length(bin(x))-1 == 63 - nlz(x), probed
    // at every power-of-two boundary (the only places a libm log2
    // could have disagreed) and a spread of odd values
    val probes = (0 to 62).flatMap { k =>
      val p = 1L << k; Seq(p, p - 1, p + 1, p | (p >> 1))
    }.filter(_ >= 1).distinct
    val viaSpark = probes.toDF("x")
      .selectExpr("x", "length(bin(x)) - 1 AS fl").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.foreach { x =>
      assert(viaSpark(x) === 63 - java.lang.Long.numberOfLeadingZeros(x),
        s"flog2($x)")
    }
  }

  test("minhashEstAudit: exact twins land in bucket 0; audit mass " +
      "equals the candidate-pair population on the real corpus") {
    import spark.implicits._
    // two byte-identical docs: every component min matches (est =
    // 1e6) and exact Jaccard is 1e6 -> error bucket 0, one pair
    val twins = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val t = Dedup.minhashEstAudit(twins).collect()
    assert(t.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L)))
    // real corpus: bucket ids stay in [0, 10] and the histogram mass
    // is exactly the LSH candidate population the audit claims to cover
    val docs = Tables.documents(spark, sf)
    val hist = Dedup.minhashEstAudit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.forall { case (b, _) => b >= 0 && b <= 10 })
    val nCand = Dedup.minhashLsh(docs, threshold = 0.0, auditable = true)
      .count()
    assert(hist.map(_._2).sum === nCand)
  }

  test("commonNeighbors: hand-computed Jaccard on a planted bipartite " +
      "graph; cap binds; top-k is a heap, not a global sort") {
    import spark.implicits._
    // suppliers' customer sets: s1={1,2,3}, s2={2,3}, s3={3,4}
    // pairs: (2,3): common={s1,s2}=2, deg2=2, deg3=3 -> 2/3 = 666666
    //        (1,2): common={s1}=1, deg1=1, deg2=2 -> 1/2 = 500000
    //        (1,3): 1/(1+3-1) = 333333ppm; (3,4): 1/(3+1-1)=333333
    val edges = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (2L, 2L), (3L, 2L), (3L, 3L), (4L, 3L))
    val lineitem = edges.zipWithIndex
      .map { case ((c, s), i) => (i.toLong, s) }
      .toDF("l_orderkey", "l_suppkey")
    val orders = edges.zipWithIndex
      .map { case ((c, s), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.commonNeighbors(lineitem, orders)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.head === ((2L, 3L, 2L, 666666L)))
    assert(got.toSet === Set((2L, 3L, 2L, 666666L), (1L, 2L, 1L, 500000L),
      (1L, 3L, 1L, 333333L), (3L, 4L, 1L, 333333L)))
    // ranked by jaccard desc with (cust1, cust2) tie-break
    assert(got.map(_._4).toSeq === got.map(_._4).toSeq.sorted.reverse)
    // the global top-k must be TakeOrderedAndProject (heap), no Sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected heap top-k in plan:\n$plan")
    // cap binds: a supplier with > cap customers keeps exactly cap
    val hotLi = (0L until 100L).map(i => (i, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val hotOrd = (0L until 100L).map(i => (i, i + 10L))
      .toDF("o_orderkey", "o_custkey")
    val hotPairs = Graph.commonNeighbors(hotLi, hotOrd, cap = 8, k = 9999)
    // 8 kept customers, one shared supplier: C(8,2)=28 pairs, all 1/1
    assert(hotPairs.count() === 28)
    assert(hotPairs.filter(col("jaccard_ppm") =!= 1000000L).count() === 0)
  }

  test("nbClassify: disjoint-vocab sources classify perfectly") {
    import spark.implicits._
    // two sources with disjoint vocabularies, 3 docs each
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "en", "srcA"),
      (2L, "beta beta gamma alpha", "en", "srcA"),
      (3L, "gamma alpha beta beta", "en", "srcA"),
      (4L, "delta epsilon zeta", "en", "srcB"),
      (5L, "epsilon zeta delta delta", "en", "srcB"),
      (6L, "zeta delta epsilon zeta", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.nbClassify(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).sortBy(_._1)
    assert(out.forall { case (_, actual, pred, _) => actual == pred },
      s"misclassified: ${out.mkString(", ")}")
    // disjoint vocab ⇒ strictly positive runner-up margin everywhere
    assert(out.forall(_._4 > 0L))
  }

  test("nbClassify: ties break to the lexicographically first class") {
    import spark.implicits._
    // perfectly symmetric two-class corpus: every doc identical, so
    // every class scores identically up to the (equal) priors — the
    // argmax must deterministically pick the first class name
    val docs = Seq(
      (1L, "x y", "en", "s2"), (2L, "x y", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.nbClassify(docs).collect()
    assert(out.forall(_.getString(2) == "s1"))
    assert(out.forall(_.getLong(4) == 0L))
  }

  test("dsirWeights: target-vocab docs outweigh off-target and accept") {
    import spark.implicits._
    val docs = Seq(
      // target slice (lang en) speaks 'good'; raw-only docs speak 'bad'
      (1L, "good good good good", "en", "s"),
      (2L, "good good good good", "en", "s"),
      (3L, "bad bad bad bad", "de", "s"),
      (4L, "bad bad bad bad", "de", "s"),
      (5L, "good good good good", "fr", "s"), // target-like, not in slice
      (6L, "bad bad bad bad", "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Sampling.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    // 'good' appears in target (tc=12) and raw (rc=16): w_bits = 0
    // 'bad' never in target: w_bits = 0 - 4 = -4 per occurrence
    assert(out(5L)._1 > out(6L)._1)
    assert(out(1L)._1 == out(5L)._1) // weight depends on text only
    // target-leaning docs (w ≥ 0) always accepted
    assert(out(1L)._2 == 1L && out(5L)._2 == 1L)
    // weights are deterministic across runs
    val again = Sampling.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(again === out)
  }

  test("epochMix: greedy allocation exhausts budget in utility order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "rich"), // 8 tokens, q = 1e6
      (2L, "x x x x x x x x", "en", "loop")) // 8 tokens, q = 125000
      .toDF("doc_id", "text", "lang", "source")
    val rows = Sampling.epochMix(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val taken = rows.map(_._4).sum
    assert(taken === 8L) // budget = 16 div 2
    // rich epoch 1 (util 1e6) fully taken before anything else
    assert(rows.find(r => r._1 == "rich" && r._2 == 1L).get._4 === 8L)
    assert(rows.filter(_._1 == "loop").forall(_._4 === 0L))
    // a cell with tokens_taken > 0 implies every higher-util cell is full
    val order = rows.sortBy(r => (-r._3, r._1, r._2))
    val firstPartial = order.indexWhere(r => r._4 < 8L)
    assert(order.drop(firstPartial + 1).forall(_._4 == 0L) ||
      order.drop(firstPartial).forall(_._4 == 0L))
  }

  test("kCoreTrade: pendant nodes peel, the dense core survives") {
    import spark.implicits._
    // complete bipartite K3,3 (orders 0..8 wire cust 1-3 × supp 1-3)
    // plus a pendant customer 9 → supplier 9
    val wires = (for { c <- 1L to 3L; s <- 1L to 3L } yield (c, s)) :+
      ((9L, 9L))
    val li = wires.zipWithIndex
      .map { case ((_, s), i) => (i.toLong, s) }
      .toDF("l_orderkey", "l_suppkey")
    val ord = wires.zipWithIndex
      .map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
    val trace = Graph.kCoreTrade(li, ord, k = 3, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1 drops the pendant pair; the K3,3 core is stable after
    assert(trace.toSeq === Seq((1L, 3L, 3L, 9L), (2L, 3L, 3L, 9L),
      (3L, 3L, 3L, 9L)))
  }

  test("hitsTrade: authority mass concentrates on the shared supplier") {
    import spark.implicits._
    // suppliers: 1 serves all three customers, 2 serves only cust 1
    val wires = Seq((1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L))
    val li = wires.zipWithIndex
      .map { case ((_, s), i) => (i.toLong, s) }
      .toDF("l_orderkey", "l_suppkey")
    val ord = wires.zipWithIndex
      .map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.hitsTrade(li, ord, iters = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val auth = out.filter(_._1 == "authority").map(t => t._2 -> t._3).toMap
    val hubs = out.filter(_._1 == "hub").map(t => t._2 -> t._3).toMap
    assert(auth(1L) > auth(2L))
    // customer 1 links both suppliers: the strongest hub
    assert(hubs(1L) > hubs(2L) && hubs(1L) > hubs(3L))
    // sum-normalized fixed point: each role's mass ≈ 1e12 (floor loss)
    assert(math.abs(auth.values.sum - 1000000000000L) < 10L)
    assert(math.abs(hubs.values.sum - 1000000000000L) < 10L)
  }

  test("thresholdSweep: twins land in band 10; cumulative columns " +
      "reconcile with the candidate population") {
    import spark.implicits._
    val twins = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words in this document here now ok"))
      .toDF("doc_id", "text")
    val t = Dedup.thresholdSweep(twins).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(t.length === 11)
    val band10 = t.find(_._1 == 10L).get
    assert(band10._2 === 1L) // the twin pair, exact Jaccard 1.0
    assert(band10._4 === 2L) // both twins touched at threshold 1.0
    // real corpus: total pair mass equals the LSH candidate population
    val docs = Tables.documents(spark, sf)
    val sweep = Dedup.thresholdSweep(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nCand = Dedup.minhashLsh(docs, threshold = 0.0, auditable = true)
      .count()
    assert(sweep.head._3 === nCand, "cum at band 0 covers every pair")
    assert(sweep.map(_._2).sum === sweep.head._3)
    // cumulative columns are non-increasing in the band
    assert(sweep.map(_._3).toSeq === sweep.map(_._3).toSeq.sorted.reverse)
    assert(sweep.map(_._4).toSeq === sweep.map(_._4).toSeq.sorted.reverse)
  }

  test("zipfAudit: hand-computed head; full head covers the corpus") {
    import spark.implicits._
    // tf: a=4, b=2, c=1 over 7 tokens
    val docs = Seq((1L, "a a b"), (2L, "a a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.zipfAudit(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "a", 4L, 4L, 571428L), // 4e6 div 7
      (2L, "b", 2L, 4L, 857142L))) // 6e6 div 7
    val all = TextAnalysis.zipfAudit(docs, k = 10).collect()
    assert(all.length === 3)
    assert(all.last.getLong(4) === 1000000L)
  }

  test("ocrArtifacts: the three artifact shapes count exactly and " +
      "the plan has zero exchanges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "b4d ocr w0rd x frag- ok")) // mixed=2, single=1, hyphen=1
      .toDF("doc_id", "text")
    val got = TextAnalysis.ocrArtifacts(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got(0) === ((1L, 4L, 0L, 0L, 0L, 0L)))
    assert(got(1) === ((2L, 6L, 2L, 1L, 1L, 666666L)))
    val plan = TextAnalysis.ocrArtifacts(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }

  test("vocabCoverage: OOV mass per source at the vocab cut; " +
      "deterministic at the tie boundary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b", "en", "s1"),
      (2L, "a b rare", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    // v=2 vocab = {a (tf 5), b (tf 2)}; 'rare' is the one OOV token
    val got = TextAnalysis.vocabCoverage(docs, v = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(("s1", 4L, 4L, 0L), ("s2", 3L, 2L, 333333L)))
    val dd = Tables.documents(spark, sf)
    val x = TextAnalysis.vocabCoverage(dd).collect().toSet
    assert(x === TextAnalysis.vocabCoverage(dd).collect().toSet)
    assert(x.nonEmpty)
  }

  test("clusterStats: histogram reconciles with the labeling and " +
      "conserves corpus mass") {
    import spark.implicits._
    // clusters: {1,2,3}, {4,5}, singletons 6 and 7
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 7L)).toDF("doc_id", "cluster_id")
    val got = Dedup.clusterStats(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 1L, 2L), (3L, 1L, 3L)))
    val dd = Tables.documents(spark, sf)
    val real = Dedup.connectedComponents(
      TextAnalysis.ngramJaccard(dd, minJaccard = 0.2), dd)
    val hist = Dedup.clusterStats(real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(_._3).sum === dd.count())
    assert(hist.forall { case (s, n, m) => m == s * n })
  }

  test("langMix: planted code-switched doc splits 50/50; pure doc " +
      "reports zero minority") {
    import spark.implicits._
    val enRun = Seq.fill(20)("the").mkString(" ")
    val deRun = Seq.fill(20)("der").mkString(" ")
    val docs = Seq((1L, enRun + " " + deRun), (2L, enRun + " " + enRun))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langMix(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // doc 1: one en chunk + one de chunk; majority tie -> max lang 'en'
    assert(got(0) === ((1L, 2L, "en", 500000L)))
    assert(got(1) === ((2L, 2L, "en", 0L)))
    // real corpus: every tokenized doc reports, shares stay in range
    val dd = Tables.documents(spark, sf)
    val real = TextAnalysis.langMix(dd).collect()
    assert(real.length === dd.count())
    assert(real.forall { r =>
      val m = r.getLong(3); m >= 0L && m < 1000000L })
  }

  test("recallAudit: identical twins are always found (band 10 " +
      "recall 1e6); missed = n_exact - n_found everywhere") {
    import spark.implicits._
    val twins = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words in this document here now ok"))
      .toDF("doc_id", "text")
    val t = Dedup.recallAudit(twins).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(t.toSeq === Seq((10L, 1L, 1L, 0L, 1000000L)))
    val dd = Tables.documents(spark, sf)
    val audit = Dedup.recallAudit(dd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(audit.forall { case (b, ne, nf, m, rp) =>
      b >= 5 && b <= 10 && m == ne - nf && nf <= ne &&
        rp == nf * 1000000L / ne })
    // the sample parameter keeps a strict subset
    val sampled = Dedup.recallAudit(dd, sampleMod = 2).collect()
      .map(_.getLong(1)).sum
    assert(sampled <= audit.map(_._2).sum)
  }

  test("cooccurrence: hand-counted window pairs; adjacent AND skip " +
      "pairs both emit; canonical order collapses directions") {
    import spark.implicits._
    // doc: a b c  (window 3): pairs (a,b) (a,c) (b,c)
    // doc: c a    -> canonical (a,c)
    val docs = Seq((1L, "a b c"), (2L, "c a")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(("a", "c", 2L), ("a", "b", 1L),
      ("b", "c", 1L)))
    // top-1 cut is deterministic and a heap, not a global sort
    val top = TextAnalysis.cooccurrence(docs, k = 1)
    assert(top.collect().head.getLong(2) === 2L)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected heap top-k:\n$plan")
  }

  test("dqOrphanAudit: planted orphans count by rows AND by keys; " +
      "clean relationship reports zeros") {
    import spark.implicits._
    // children: fk 1 (2 rows), 2 (1 row), 9 (3 rows), 8 (1 row)
    // parents: 1, 2  -> orphan keys {8, 9}: 4 rows, 2 keys
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L, 8L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Relational.dqOrphanAudit("t.fk -> p.pk", child, "fk",
      parent, "pk").collect().head
    assert(r.getString(0) === "t.fk -> p.pk")
    assert(r.getLong(1) === 7L)   // child rows
    assert(r.getLong(2) === 4L)   // distinct fk
    assert(r.getLong(3) === 4L)   // orphan rows
    assert(r.getLong(4) === 2L)   // orphan keys
    // the driver-shaped audit over the clean synthetic star: all four
    // relationships must hold (zero orphans) by construction
    val full = Relational.dqOrphans(spark, sf)
    assert(full.count() === 4)
    assert(full.filter(col("n_orphan_rows") > 0 ||
      col("n_orphan_keys") > 0).count() === 0)
  }

  test("fdAudit: g3 error is the minority mass; held FD reports zero") {
    import spark.implicits._
    // det 1 -> {a,a,b}: violating, g3=1;  det 2 -> {c,c}: held
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c"))
      .toDF("det0", "dep0")
    val r = Relational.fdAudit("t: det0 -> dep0", df, "det0", "dep0")
      .collect().head
    assert(r.getLong(1) === 2L)       // groups
    assert(r.getLong(2) === 1L)       // violating
    assert(r.getLong(3) === 500000L)  // ppm
    assert(r.getLong(4) === 5L)       // rows
    assert(r.getLong(5) === 1L)       // g3: drop one 'b' row
    // true-key candidates in the driver report must audit clean
    val full = Relational.dqFdCheck(spark, sf).collect()
      .map(r0 => (r0.getString(0), r0.getLong(2))).toMap
    assert(full("customer: c_custkey -> c_nationkey") === 0L)
    assert(full("nation: n_nationkey -> n_regionkey") === 0L)
  }

  test("qNullAwareAnti: three-valued counts partition the customers; " +
      "NOT IN goes empty exactly when the blocked set has a NULL") {
    val rows = Relational.qNullAwareAnti(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, nIn, nUnk, nNot, nNE) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nIn + nUnk + nNot === n)       // truth values partition
      assert(nUnk + nNot === nNE)           // NOT EXISTS = non-matches
      assert(nUnk === 0L || nNot === 0L)    // has_null is global
    }
  }

  test("cdcChunks: cuts re-synchronize after a prefix insertion, the " +
      "greedy floor holds, and chunks tile each document exactly") {
    import spark.implicits._
    val text = (0 until 60).map(i => s"w${i}x${(i * 7) % 13}")
      .mkString(" ")
    val shifted = "INSERTED PREFIX " + text
    val docs = Seq((1L, text, "s"), (2L, shifted, "s"))
      .toDF("doc_id", "text", "source")
    val ch = Dedup.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4)))
    // tiling: per-doc chunk lengths sum to the doc length
    val lens = ch.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(lens(1L) === text.length)
    assert(lens(2L) === shifted.length)
    // greedy floor: every non-final chunk is >= minSize (16)
    for (doc <- Seq(1L, 2L)) {
      val parts = ch.filter(_._1 == doc).sortBy(_._2)
      assert(parts.dropRight(1).forall(_._3 >= 16),
        s"doc $doc has a short non-final chunk")
    }
    // re-synchronization: candidates are content-positions, so after
    // the first cut both docs share, every later cut coincides —
    // the shifted doc re-uses all but a bounded head of doc 1's
    // chunks (THE property byte-offset chunking lacks)
    val h1 = ch.filter(_._1 == 1L).map(_._4).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._4).toSet
    val n1 = ch.count(_._1 == 1L)
    assert((h1 intersect h2).size >= n1 - 3,
      s"resync failed: only ${(h1 intersect h2).size} of $n1 shared")
    // and the report surfaces them as corpus-shared instances
    val rep = Dedup.cdcChunkReport(docs).collect().head
    assert(rep.getLong(5) >= 2L * (n1 - 3))  // n_shared counts instances
  }

  test("localClustering: per-corner credits reconcile with the " +
      "triangle list; pendant nodes report NULL; cc bounded by 1e6") {
    val li = Tables.lineitem(spark, sf); val or = Tables.orders(spark, sf)
    val cu = Tables.customer(spark, sf); val su = Tables.supplier(spark, sf)
    val cc = Graph.localClustering(li, or, cu, su).collect()
    val nTri = Graph.trianglesTrade(li, or, cu, su).count()
    assert(cc.map(_.getLong(2)).sum === 3 * nTri)
    for (r <- cc) {
      if (r.getLong(1) < 2) assert(r.isNullAt(3))
      else assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("cdcGearCuts kernel: bounds tile the text, greedy floor holds, " +
      "edge cases (empty, short) are single-chunk; gear cuts " +
      "re-synchronize after a prefix insertion") {
    import org.apache.spark.unsafe.types.UTF8String
    def cuts(s: String) = {
      val a = graft.functions.Kernels.cdcGearCuts(
        UTF8String.fromString(s), 32, 16)
      (0 until a.numElements()).map(a.getInt)
    }
    assert(cuts("") === Seq(0))
    assert(cuts("short") === Seq(0, 5))
    val text = (0 until 80).map(i => s"w${i}x${(i * 7) % 13}")
      .mkString(" ")
    val c = cuts(text)
    assert(c.head === 0 && c.last === text.length)
    assert(c.sliding(2).forall(p => p(1) > p(0)))
    // all gaps except possibly the last honor the floor
    assert(c.sliding(2).toSeq.dropRight(1).forall(p => p(1) - p(0) >= 16))
    // re-sync through the frame: shifted doc re-uses the tail chunks
    import spark.implicits._
    val docs = Seq((1L, text, "s"), (2L, "SHIFTING HEAD " + text, "s"))
      .toDF("doc_id", "text", "source")
    val ch = Dedup.cdcChunksGear(docs).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val n1 = ch.count(_._1 == 1L)
    // the gear state spans ~62 chars, so up to ~3 head chunks differ
    assert((h1 intersect h2).size >= n1 - 4,
      s"gear resync failed: ${(h1 intersect h2).size} of $n1 shared")
  }

  test("cdcIncremental: a re-uploaded doc is all-known, fresh content " +
      "all-novel") {
    import spark.implicits._
    val base = (0 until 60).map(i => s"w${i}x${(i * 7) % 13}")
      .mkString(" ")
    val fresh = (100 until 160).map(i => s"q${i}y${(i * 5) % 11}")
      .mkString(" ")
    val corpus = Seq((1L, base, "s")).toDF("doc_id", "text", "source")
    val wave = Seq((10L, base, "re"), (11L, fresh, "new"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.cdcIncremental(wave, corpus).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (reChunks, reNovel, rePpm) = got("re")
    assert(reNovel === 0L && rePpm === 0L && reChunks > 0L)
    val (nwChunks, nwNovel, nwPpm) = got("new")
    assert(nwNovel === nwChunks && nwPpm === 1000000L)
  }

  test("mmrRerank: the near-duplicate of the first pick loses its " +
      "rank-2 slot to a diverse lower-relevance candidate") {
    import spark.implicits._
    // q along x; A nearly along x (top rel); B a near-duplicate of A
    // (higher rel than C but redundant); C diverse at rel ~0.707
    val embs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(1f, 0f, 0.1f)),    // A
      (2L, Array(1f, 0f, 0.11f)),   // B ~ A
      (3L, Array(1f, 1f, 0f)))      // C
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(embs,
        embs.filter(col("vec_id") === 0), pool = 3, k = 3)
      .orderBy("pos").collect().map(_.getLong(2))
    assert(got === Array(1L, 3L, 2L),
      s"expected A, C (diverse), B (redundant) — got ${got.toSeq}")
    // pure-relevance order would have been A, B, C
    val byRel = Similarity.bruteForceTopK(embs,
        embs.filter(col("vec_id") === 0), 3)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(byRel === Array(1L, 2L, 3L))
  }

  test("kcenterSelect: picks the square's corners before its center, " +
      "radii exact and non-increasing") {
    import spark.implicits._
    val embs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 0f)), (2L, Array(0f, 10f)),
      (3L, Array(10f, 10f)), (4L, Array(5f, 5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterSelect(embs, k = 5).orderBy("rank")
      .collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // seed 0 at origin; farthest corner (10,10) d2=200; then the two
    // 100-corners (tie -> lower id first); the center last at d2=50
    assert(got === Array((0L, -1L), (3L, 200000000L),
      (1L, 100000000L), (2L, 100000000L), (4L, 50000000L)))
    // real corpus: the covering-radius curve never increases
    val radii = Similarity.kcenterSelect(
      Tables.embeddings(spark, sf)).orderBy("rank").collect()
      .drop(1).map(_.getLong(2))
    assert(radii.sliding(2).forall(p => p(1) <= p(0)))
  }

  test("binaryRerank: a tight prune drops the true neighbor (flag 0); " +
      "widening the prune recovers it (flag 1)") {
    import spark.implicits._
    // query 0: id 1 is sign-identical (hamming 0) but low cosine;
    // id 2 flips one sign (hamming 1) but is the true cosine top-1
    val embs = Seq(
      (0L, Array(1f, 1f, 1f, 1f)),
      (1L, Array(1f, 0.001f, 0.001f, 0.001f)),
      (2L, Array(1f, 1f, 1f, -0.001f)))
      .toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") === 0)
    val tight = Similarity.binaryRerank(embs, q, prune = 1, k = 1)
      .collect().head
    assert(tight.getLong(2) === 1L)   // hamming-nearest survives
    assert(tight.getLong(4) === 0L)   // ...but is NOT the exact top-1
    val wide = Similarity.binaryRerank(embs, q, prune = 2, k = 1)
      .collect().head
    assert(wide.getLong(2) === 2L)    // true neighbor recovered
    assert(wide.getLong(4) === 1L)
  }

  test("rxHolt: hand-computed level/trend/forecast on a 3-step series") {
    import spark.implicits._
    val ev = Seq((1L, 1L, 4.0), (2L, 1L, 8.0), (3L, 1L, 4.0))
      .toDF("event_id", "user_id", "value")
    val got = Reactive.rxHolt(ev).orderBy("event_id").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got(0) === ((4.0, 0.0, 4.0)))
    assert(got(1) === ((5.0, 0.25, 5.25)))
    assert(got(2) === ((4.9375, 0.171875, 5.109375)))
  }

  test("rxEntropyRate: deterministic navigation scores 0; a uniform " +
      "2-way branch scores ~1 bit") {
    import spark.implicits._
    // user 1: a b a b a b ... -> next state fully determined
    // user 2: from 'a' goes to b/c equally (4 of each)
    val det = (1 to 8).map(i =>
      (i.toLong, 1L, if (i % 2 == 1) "a" else "b"))
    val branch = (1 to 16).map { i =>
      val t = if (i % 2 == 1) "a" else (if ((i / 2) % 2 == 0) "b" else "c")
      (100L + i, 2L, t)
    }
    val ev = (det ++ branch).toDF("event_id", "user_id", "event_type")
    val got = Reactive.rxEntropyRate(ev).orderBy("user_id").collect()
    assert(got(0).getLong(2) === 0L)          // deterministic -> 0
    // user 2: a->b (4), a->c (4): c_s=8, c_st=4 -> 1 bit each;
    // b->a, c->a: deterministic -> 0; total 8 transitions of 15
    assert(got(1).getLong(1) === 15L)
    assert(got(1).getLong(2) === 8000L / 15L) // 8 bits / 15 in milli
  }

  test("rxBollinger: spike flags above, dip flags below, steady rows " +
      "stay in — and a post-spike dip is NOT a breakout (sigma " +
      "inflated by the spike)") {
    import spark.implicits._
    val ev = ((1 to 8).map(i => (i.toLong, 1L, 10.0)) ++
      Seq((9L, 1L, 100.0), (10L, 1L, 0.5)) ++
      (11 to 18).map(i => (i.toLong, 2L, 10.0)) ++
      Seq((19L, 2L, 0.5)))
      .toDF("event_id", "user_id", "value")
    val got = Reactive.rxBollinger(ev).collect()
      .map(r => (r.getLong(1), r.getString(4))).toMap // event -> band
    assert((1L to 8L).forall(got(_) == "in"))
    assert(got(9L) === "above")
    assert(got(10L) === "in")   // spike-inflated sigma absorbs the dip
    assert(got(19L) === "below")
  }

  test("rxTheilSen: median slope ignores the outlier OLS would chase; " +
      "last-n cap bounds the pair fan-out; single point yields NULL") {
    import spark.implicits._
    val ev = (Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
        (5L, 100.0)).map { case (e, v) => (e, 1L, v) } ++
      Seq((10L, 2L, 7.0)) ++
      (1 to 40).map(i => (100L + i, 3L, i.toDouble)))
      .toDF("event_id", "user_id", "value")
    val got = Reactive.rxTheilSen(ev).orderBy("user_id").collect()
    // user 1: 6 of 10 pairwise slopes are exactly 1.0 -> median 1.0
    assert((got(0).getLong(1), got(0).getLong(2),
      got(0).getDouble(3)) === ((5L, 10L, 1.0)))
    // user 2: one point, no pairs, NULL slope
    assert((got(1).getLong(1), got(1).getLong(2)) === ((1L, 0L)))
    assert(got(1).isNullAt(3))
    // user 3: 40 points cap to 32 -> 496 pairs, unit slope
    assert((got(2).getLong(1), got(2).getLong(2),
      got(2).getDouble(3)) === ((32L, 496L, 1.0)))
  }

  test("rxMannKendall: monotone series maxes S with full variance; " +
      "constant series zeroes S and the tie term eats the variance") {
    import spark.implicits._
    val ev = ((1 to 5).map(i => (i.toLong, 1L, i.toDouble)) ++
      (1 to 4).map(i => (10L + i, 2L, 7.0)))
      .toDF("event_id", "user_id", "value")
    val got = Reactive.rxMannKendall(ev).orderBy("user_id").collect()
    // user 1: strictly increasing, n=5 -> S = 10, var18 = 5*4*15=300
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3))
      === ((5L, 10L, 300L)))
    // user 2: all equal, n=4 -> S=0; tie run t=4 eats the whole
    // variance: 4*3*13 - 4*3*13 = 0
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3))
      === ((4L, 0L, 0L)))
  }

  test("rxRunsTest: alternating series counts 4 runs; all-at-median " +
      "key reports zeros with NULL expectation") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 1.0), (2L, 1L, 5.0), (3L, 1L, 2.0), (4L, 1L, 6.0),
      (5L, 1L, 3.0),                      // median 3 drops -> B A B A
      (6L, 2L, 7.0), (7L, 2L, 7.0), (8L, 2L, 7.0))
      .toDF("event_id", "user_id", "value")
    val got = Reactive.rxRunsTest(ev).orderBy("user_id").collect()
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3),
      got(0).getLong(4)) === ((2L, 2L, 4L, 3000000L)))
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3))
      === ((0L, 0L, 0L)))
    assert(got(1).isNullAt(4))
  }

  test("dimAssignment: variance-ranked snake deal pairs strong dims " +
      "with weak across subspaces; every dim assigned exactly once") {
    import spark.implicits._
    // two vectors ±(i+1) at dim i: mean 0, variance grows with i,
    // so the desc rank is dim 7, 6, ..., 0 and the snake deal is
    // 0 1 2 3 3 2 1 0
    val embs = Seq(
      (0L, (1 to 8).map(i => i.toFloat).toArray),
      (1L, (1 to 8).map(i => -i.toFloat).toArray))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimAssignment(embs, m = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(got === Map(7 -> 0, 6 -> 1, 5 -> 2, 4 -> 3,
      3 -> 3, 2 -> 2, 1 -> 1, 0 -> 0))
    // real corpus: a permutation — 16 dims per subspace, all 64 used
    val real = Similarity.dimAssignment(
      Tables.embeddings(spark, sf)).collect()
    assert(real.map(_.getInt(0)).toSet === (0 until 64).toSet)
    assert(real.groupBy(_.getInt(1)).values.map(_.length).toSet
      === Set(16))
  }

  test("pqAuditBalanced: every slice lands in exactly one code per " +
      "subspace (mass conservation)") {
    val embs = Tables.embeddings(spark, sf)
    val n = embs.count()
    val out = Similarity.pqAuditBalanced(embs).collect()
    assert(out.map(_.getLong(2)).sum === 4 * n)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      === out.length)
  }

  test("binaryQuantAudit: twin has hamming 0, negation has hamming d " +
      "— including a non-word-aligned dim (70)") {
    import spark.implicits._
    for (d <- Seq(64, 70)) {
      val v = (0 until d).map(i => if (i % 2 == 0) 1f else -1f).toArray
      val embs = Seq(
        (0L, v), (1L, v), (2L, v.map(x => -x)))
        .toDF("vec_id", "embedding")
      val r = Similarity.binaryQuantAudit(embs,
        embs.filter(col("vec_id") === 0)).collect().head
      assert(r.getLong(0) === 0L)
      assert(r.getLong(1) === 2L,
        s"d=$d: both neighbors must land in both top-10 sets")
      assert(r.getLong(2) === d.toLong,
        s"d=$d: hamming mass = 0 (twin) + $d (negation)")
      assert(r.getLong(3) === 0L, s"d=$d: twin is hamming-0")
    }
  }

  test("resourceAllocation: niche witness outweighs hub witness") {
    import spark.implicits._
    // suppliers: 10 shared by custs {1,2} only (deg 2, w=500000);
    // 20 shared by custs {1,2,3,4} (deg 4, w=250000)
    val edges = Seq(
      (100L, 10L), (200L, 10L),
      (100L, 20L), (200L, 20L), (300L, 20L), (400L, 20L))
    val orders = edges.map(_._1).distinct
      .map(o => (o, o / 100)).toDF("o_orderkey", "o_custkey")
    val li = edges.toDF("l_orderkey", "l_suppkey")
    val out = Graph.resourceAllocation(li, orders).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // pair (1,2): witnesses 10 (500000) + 20 (250000) = 750000
    assert(out((1L, 2L)) === ((2L, 750000L)))
    // any pair through the hub only: 250000
    assert(out((3L, 4L)) === ((1L, 250000L)))
    assert(out((1L, 3L)) === ((1L, 250000L)))
  }
}
