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
