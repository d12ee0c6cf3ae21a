package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: binary payload schema, batch decode stub,
  * frame sampling geometry. */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  private lazy val media = Multimodal.mediaTable(
    Tables.documents(spark, sf).limit(20)).cache()

  test("media table carries binary payload + typed metadata") {
    val row = media.head()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("width") === 64)
  }

  test("extractFeatures decodes every payload deterministically") {
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === 20)
    feats.foreach { f =>
      assert(f.byte_len > 0)
      assert(f.histogram.sum === f.byte_len) // every byte lands in a bucket
    }
    val again = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
  }

  test("sampleFrames covers payload with stride-sized frames") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 100).collect()
    val byId = frames.groupBy(_.media_id)
    val lens = media.selectExpr("media_id", "octet_length(payload) AS len")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byId.foreach { case (id, fs) =>
      assert(fs.length === math.max(1, lens(id) / 100))
      assert(fs.map(_.pixels.length).sum <= lens(id))
    }
  }

  test("resizeMeta preserves aspect cap") {
    val out = Multimodal.resizeMeta(media, maxSide = 32).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("target_w") <= 32 && r.getAs[Int]("target_h") <= 32)
    }
  }

  test("mediaNearDup pairs identical payloads, not orthogonal ones") {
    import spark.implicits._
    // bigram signature bins: "aaaa" → (97*31+97)%64 = bin 32 only;
    // "abab" → bins 33 ('ab') and 63 ('ba') — orthogonal to bin 32.
    // docs 1/2 have identical signatures, doc 3 an orthogonal one
    val docs = Seq((1L, "aaaa"), (2L, "aaaa"), (3L, "abab"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.mediaNearDup(spark, docs)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
