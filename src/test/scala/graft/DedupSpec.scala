package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Near-dup detection on planted duplicates: the LSH paths must find
  * the planted pairs and must not pair unrelated documents. */
class DedupSpec extends AnyFunSuite {
  import TestSession._

  private def plantedDocs = {
    import spark.implicits._
    val base = (1 to 50).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 50).map(i => if (i == 25) "CHANGED" else s"word$i")
      .mkString(" ")
    val unrelated = (1 to 50).map(i => s"other$i").mkString(" ")
    Seq(
      (1L, base), (2L, base),        // exact dup pair
      (3L, nearDup),                 // near dup of 1/2
      (4L, unrelated)                // no pair
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups exact copies under one canonical id") {
    val out = Dedup.exact(plantedDocs).collect()
    val dupGroup = out.filter(_.getAs[Long]("n_copies") == 2L)
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("keep_id") === 1L)
  }

  test("minhash-lsh finds exact and near dups, not unrelated") {
    val pairs = Dedup.minhashLsh(plantedDocs, threshold = 0.5)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash pairs exact dups at hamming 0") {
    val pairs = Dedup.simhash(plantedDocs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L })
    assert(!pairs.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("embedding near-dup finds planted near-identical vectors") {
    import spark.implicits._
    val v = Array.tabulate(32)(i => math.sin(i * 1.7).toFloat)
    val vNear = v.clone(); vNear(0) = vNear(0) + 0.01f
    val vFar = Array.tabulate(32)(i => math.cos(i * 9.1).toFloat)
    val embs = Seq((1L, v), (2L, vNear), (3L, vFar)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(embs, planes = 4, minCosine = 0.99)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("embedding near-dup bounds degenerate-bucket fan-out (star emission)") {
    import spark.implicits._
    // adversarial corpus: every vector identical -> ONE bucket in any
    // LSH family -> all-pairs would emit n(n-1)/2 rows from one task.
    // Past maxBucket the op must emit the O(n) star instead: every
    // member paired with the bucket representative (lowest vec_id),
    // preserving cluster connectivity for downstream CC.
    val n = 400
    val embs = spark.range(n).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(2.0f), lit(0.5f), lit(1.5f)).as("embedding"))
    val pairs = Dedup.embeddingNearDup(embs, planes = 4, minCosine = 0.99,
      maxBucket = 16).collect()
    assert(pairs.length === n - 1, "star emission must yield exactly n-1 pairs")
    assert(pairs.forall(_.getLong(0) == 0L), "all pairs anchor at the rep")
    // small buckets keep exact all-pairs semantics (both families)
    for (auditable <- Seq(false, true)) {
      val small = Dedup.embeddingNearDup(embs.filter(col("vec_id") < 5),
        planes = 4, minCosine = 0.99, auditable = auditable,
        maxBucket = 16).count()
      assert(small === 10, s"all-pairs under the cap (auditable=$auditable)")
    }
  }

  test("minhash-lsh bounds degenerate-bucket fan-out (star emission)") {
    import spark.implicits._
    // adversarial corpus: n exact copies of one document -> every
    // band bucket is the SAME n-member set -> uncapped all-pairs
    // would emit n(n-1)/2 candidate rows per band. Past maxBucket
    // the op must emit the O(n) star instead, all pairs anchored at
    // the rep (lowest doc_id), and the Jaccard verify keeps them
    // (identical docs -> jaccard 1.0).
    val n = 200
    val text = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = spark.range(n).select(col("id").as("doc_id"), lit(text).as("text"))
    for (auditable <- Seq(false, true)) {
      val pairs = Dedup.minhashLsh(docs, auditable = auditable,
        maxBucket = 16).collect()
      assert(pairs.length === n - 1,
        s"star emission must yield exactly n-1 pairs (auditable=$auditable)")
      assert(pairs.forall(_.getLong(0) == 0L), "all pairs anchor at the rep")
      assert(pairs.forall(_.getDouble(2) == 1.0))
    }
    // under the cap: exact all-pairs semantics preserved
    val small = Dedup.minhashLsh(docs.filter(col("doc_id") < 5),
      maxBucket = 16).count()
    assert(small === 10, "all-pairs under the cap")
  }

  test("simhash bounds degenerate-bucket fan-out (star emission)") {
    import spark.implicits._
    val n = 200
    val text = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = spark.range(n).select(col("id").as("doc_id"), lit(text).as("text"))
    for (auditable <- Seq(false, true)) {
      val pairs = Dedup.simhash(docs, maxHamming = 3, auditable = auditable,
        maxBucket = 16).collect()
      assert(pairs.length === n - 1,
        s"star emission must yield exactly n-1 pairs (auditable=$auditable)")
      assert(pairs.forall(_.getLong(0) == 0L), "all pairs anchor at the rep")
      assert(pairs.forall(_.getLong(2) == 0L), "identical docs -> hamming 0")
    }
    val small = Dedup.simhash(docs.filter(col("doc_id") < 5),
      maxBucket = 16).count()
    assert(small === 10, "all-pairs under the cap")
  }

  test("sorted-neighborhood finds prefix-stable dups and respects its window") {
    import spark.implicits._
    // planted corpus: 1/2 exact dups, 3 a near dup — all share the
    // 24-char blocking prefix, so they are rank-adjacent and found
    val pairs = Dedup.sortedNeighborhood(plantedDocs)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // blocking contract: a dup pair whose SORT KEYS diverge (same
    // content after the first token, different first token) with
    // more than `window` docs between them in sort order is MISSED —
    // the documented SNM trade a hash family covers, which is why
    // production unions both pair sets
    val body = (1 to 50).map(i => s"word$i").mkString(" ")
    val spread = Seq((100L, s"aaa $body"), (200L, s"zzz $body")) ++
      (1 to 10).map(i => (i.toLong, ('b' + (i % 20)).toChar.toString * 3 +
        s" ${(1 to 50).map(j => s"tok${i}x$j").mkString(" ")}"))
    val far = Dedup.sortedNeighborhood(spread.toDF("doc_id", "text"),
      window = 3)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!far.contains((100L, 200L)),
      "sort-separated dups are outside the neighborhood by design")
    // widening the window past the separation recovers the pair
    val wide = Dedup.sortedNeighborhood(spread.toDF("doc_id", "text"),
      window = 11)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.contains((100L, 200L)))
  }

  test("auditable LSH families find the same planted dups as the fast ones") {
    val docs = plantedDocs
    val mh = Dedup.minhashLsh(docs, auditable = true)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((1L, 2L)))
    assert(!mh.exists { case (a, b) => a == 4L || b == 4L })
    val sh = Dedup.simhash(docs, maxHamming = 3, auditable = true)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.contains((1L, 2L)))
    assert(!sh.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("LSH ANN recall against brute force is meaningful and its hits are real") {
    val embs = graft.sources.Tables.embeddings(spark, sf)
    val qs = embs.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(embs, qs, 5))
    val lsh = pairs(Similarity.lshTopK(embs, qs, planes = 4, k = 5))
    // every LSH hit must be a real corpus neighbor of that query
    assert(lsh.nonEmpty)
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.2, s"recall $recall too low for 4-plane LSH")
    // the auditable (md5) family is a different random basis but the
    // same construction: it must clear the same recall floor
    val lshA = pairs(Similarity.lshTopK(embs, qs, planes = 4, k = 5,
      auditable = true))
    assert(lshA.nonEmpty)
    val recallA = bf.intersect(lshA).size.toDouble / bf.size
    assert(recallA >= 0.2, s"auditable recall $recallA too low")
  }

  test("dedupReport counts exact and near dups per source (planted corpus)") {
    // the gate corpus has zero exact dups, so the exact branch is
    // only value-checked at 0 there — prove it counts on planted data
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "EDIT" else s"tok$i")
      .mkString(" ")
    val docs = Seq(
      (1L, "a", base),                  // exact dup of 2 (cross-source)
      (2L, "b", base),                  // exact dup of 1
      (3L, "a", near),                  // near dup of 1/2, not exact
      (4L, "b", (1 to 40).map(i => s"other$i").mkString(" ")), // clean
      (5L, "a", "  " + base + "  ")     // exact after trim-normalize
    ).toDF("doc_id", "source", "text")
    val r = Dedup.dedupReport(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3))).toMap
    // source a: 3 docs; 1 and 5 exact (fingerprint x3 overall), all
    // of 1/3/5 in near pairs
    assert(r("a") === ((3L, 2L, 3L)), s"got ${r("a")}")
    // source b: 2 docs; 2 exact, 2 near (pairs with 1/3/5), 4 clean
    assert(r("b") === ((2L, 1L, 1L)), s"got ${r("b")}")
  }

  test("brute-force topk ranks the nearest vector first") {
    import spark.implicits._
    val q = Array.tabulate(16)(_.toFloat)
    val near = q.map(_ * 2.0f)            // cosine 1
    val mid = q.map(x => x + 3.0f)        // high cosine
    val far = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val embs = Seq((0L, q), (1L, near), (2L, mid), (3L, far))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") === 0), 3)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("neighbor_id") === 1L)
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
  }
}
