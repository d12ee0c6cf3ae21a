package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev-only per-trigger cost probe for the streaming MinHash
  * admission path (§2.9 63zs): builds the persisted index from the
  * corpus at <sfDir>, then feeds `waves` micro-batches of
  * `waveSize` docs (half near-copies of corpus docs, half fresh)
  * through [[graft.streaming.ReactiveStreams.minhashAdmitStream]]
  * and times each trigger's processAllAvailable. The steady-state
  * per-trigger number is the ingest-admission latency a deployment
  * pays per micro-batch; the index side never shuffles (Round8Spec
  * pins the plan), so this cost is O(wave), not O(corpus).
  *
  * runMain graft.tools.AdmitProbe <sfDir> [waves] [waveSize]
  */
object AdmitProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val waves = if (args.length > 1) args(1).toInt else 5
    val waveSize = if (args.length > 2) args(2).toInt else 100
    // SPARK_GRAFT_PROBE_SEGMENTS=band (comma list of
    // minhash,embedding,band) runs a subset — a fresh segment
    // shouldn't re-pay the whole suite for one number
    val segments = sys.env.getOrElse("SPARK_GRAFT_PROBE_SEGMENTS",
      "minhash,embedding,band").split(",").map(_.trim).toSet
    if (segments("minhash")) {
    val dd = graft.sources.Tables.documents(spark, args(0))
      .select("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("admit_probe_idx").toString
    val t0 = System.nanoTime()
    graft.operators.Dedup.minhashWriteIndex(dd, dir, auditable = false)
    println(f"[admit] index build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val postings = spark.read.parquet(dir + "/postings")
    val sets = spark.read.parquet(dir + "/sets")
    val corpusTexts = dd.orderBy("doc_id").limit(waves * waveSize / 2)
      .collect().map(_.getString(1))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val qn = s"admit_probe_${System.nanoTime()}"
    val q = graft.streaming.ReactiveStreams.minhashAdmitStream(
        mem.toDF().toDF("doc_id", "ts", "text"), postings, sets)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      var id = 1000000L
      val times = (0 until waves).map { w =>
        val rows = (0 until waveSize).map { i =>
          val txt =
            if (i % 2 == 0 && (w * waveSize + i) / 2 < corpusTexts.length)
              corpusTexts((w * waveSize + i) / 2) + " tail"
            else s"fresh wave $w doc $i with unique content tokens " +
              s"alpha$w beta$i gamma delta"
          id += 1
          // monotone in w (base epoch + w minutes), never w % 60:
          // wrapped timestamps arrive non-monotonically into the
          // watermarked stream and can drop late rows, skewing the
          // per-trigger timing the probe reports
          (id, new Timestamp(
            Timestamp.valueOf("2024-01-01 00:00:00").getTime +
              w * 60000L), txt)
        }
        mem.addData(rows)
        val s = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - s) / 1e9
      }
      val steady = times.drop(1)
      println(("{\"probe\":\"minhash_admit_per_trigger\"," +
        "\"wave_size\":%d,\"first_trigger_sec\":%.3f," +
        "\"steady_mean_sec\":%.3f,\"steady_min_sec\":%.3f}")
        .format(waveSize, times.head,
          steady.sum / steady.length, steady.min))
    } finally q.stop()
    // the indexed (file-skipping) path, called per wave the way a
    // foreachBatch deployment would
    var id2 = 2000000L
    val idxTimes = (0 until waves).map { w =>
      val rows = (0 until waveSize).map { i =>
        val txt =
          if (i % 2 == 0 && (w * waveSize + i) / 2 < corpusTexts.length)
            corpusTexts((w * waveSize + i) / 2) + " tail"
          else s"fresh wave $w doc $i with unique content tokens " +
            s"alpha$w beta$i gamma delta"
        id2 += 1
        (id2, txt)
      }
      val waveDf = rows.toDF("doc_id", "text")
      val s = System.nanoTime()
      graft.operators.Dedup.minhashAdmitIndexed(spark, dir, waveDf)
        .agg(sum(when(col("admitted"), 1L))).head()
      (System.nanoTime() - s) / 1e9
    }
    val iSteady = idxTimes.drop(1)
    println(("{\"probe\":\"minhash_admit_indexed_per_wave\"," +
      "\"wave_size\":%d,\"first_wave_sec\":%.3f," +
      "\"steady_mean_sec\":%.3f,\"steady_min_sec\":%.3f}")
      .format(waveSize, idxTimes.head,
        iSteady.sum / iSteady.length, iSteady.min))
    // the STREAMING indexed path: foreachBatch over the same
    // file-skipping probe — per-trigger cost should track the
    // indexed batch waves above (O(wave-matched files)), not the
    // corpus-scanning stream's growth curve
    val mem2 = MemoryStream[(Long, String)]
    val sunk = new java.util.concurrent.atomic.AtomicLong(0L)
    val q2 = graft.streaming.ReactiveStreams.minhashAdmitIndexedStream(
      mem2.toDF().toDF("doc_id", "text"), dir,
      v => sunk.addAndGet(
        v.agg(sum(when(col("admitted"), 1L))).head().getLong(0)))
    var id3 = 3000000L
    val sTimes =
      try {
        (0 until waves).map { w =>
          val rows = (0 until waveSize).map { i =>
            val txt =
              if (i % 2 == 0 && (w * waveSize + i) / 2 < corpusTexts.length)
                corpusTexts((w * waveSize + i) / 2) + " tail"
              else s"fresh wave $w doc $i with unique content tokens " +
                s"alpha$w beta$i gamma delta"
            id3 += 1
            (id3, txt)
          }
          mem2.addData(rows)
          val s = System.nanoTime()
          q2.processAllAvailable()
          (System.nanoTime() - s) / 1e9
        }
      } finally q2.stop()
    val sSteady = sTimes.drop(1)
    println(("{\"probe\":\"minhash_admit_indexed_stream_per_trigger\"," +
      "\"wave_size\":%d,\"first_trigger_sec\":%.3f," +
      "\"steady_mean_sec\":%.3f,\"steady_min_sec\":%.3f," +
      "\"admitted_total\":%d}")
      .format(waveSize, sTimes.head,
        sSteady.sum / sSteady.length, sSteady.min, sunk.get()))
    }
    if (segments("embedding")) {
    // the SEMANTIC (IVF) admission stream: per-trigger cost must
    // track the PROBED posting partitions (the nprobe sweep below —
    // nprobe=nlist is the degenerate full-scan bound), and stay
    // near-flat across a 10x index at fixed small nprobe (each
    // probed list grows 10x in rows but the trigger's work is
    // nprobe directories, never the corpus)
    val allEmbs = graft.sources.Tables.embeddings(spark, args(0))
      .select("vec_id", "embedding")
    val waveVecs = allEmbs.orderBy("vec_id").limit(waves * waveSize)
      .collect().map(_.getSeq[Float](1).toArray)
    for ((mult, tag) <- Seq(1 -> "1x", 10 -> "10x")) {
      val big = (0 until mult)
        .map(i => allEmbs.select(
          (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
      val dirE = java.nio.file.Files
        .createTempDirectory(s"admit_probe_ivf_$tag").toString
      val tB = System.nanoTime()
      graft.operators.Similarity.ivfWriteIndex(big, dirE,
        nlist = 16, iters = 2)
      val buildSec = (System.nanoTime() - tB) / 1e9
      for (np <- Seq(1, 4, 16)) {
        val memE = MemoryStream[(Long, Array[Float])]
        val admitted = new java.util.concurrent.atomic.AtomicLong(0L)
        val qE = graft.streaming.ReactiveStreams.embeddingAdmitStream(
          memE.toDF().toDF("vec_id", "embedding"), dirE,
          v => admitted.addAndGet(
            v.agg(coalesce(sum(when(col("admitted"), 1L)), lit(0L)))
              .head().getLong(0)),
          minCosine = 0.95, nprobe = np)
        var idE = 4000000L
        val eTimes =
          try {
            (0 until waves).map { w =>
              val rows = (0 until waveSize).map { i =>
                idE += 1
                val v0 = waveVecs((w * waveSize + i) % waveVecs.length)
                // half exact corpus copies (rejected), half negated
                // (cos -1 vs their source -> admitted)
                (idE, if (i % 2 == 1) v0.map(-_) else v0)
              }
              memE.addData(rows)
              val s = System.nanoTime()
              qE.processAllAvailable()
              (System.nanoTime() - s) / 1e9
            }
          } finally qE.stop()
        val eSteady = eTimes.drop(1)
        println(("{\"probe\":\"embedding_admit_stream_per_trigger\"," +
          "\"index\":\"%s\",\"index_build_sec\":%.1f,\"nprobe\":%d," +
          "\"wave_size\":%d,\"first_trigger_sec\":%.3f," +
          "\"steady_mean_sec\":%.3f,\"steady_min_sec\":%.3f," +
          "\"admitted_total\":%d}")
          .format(tag, buildSec, np, waveSize, eTimes.head,
            eSteady.sum / eSteady.length, eSteady.min, admitted.get()))
      }
    }
    }
    if (segments("band")) {
    // the BAND numeric admission gate: the scan path re-joins the
    // whole static peer table every trigger (cost tracks the peer
    // corpus), the indexed path reads only the wave's jb_block
    // directories (cost tracks the wave's band FOOTPRINT). Waves
    // are deliberately narrow (one ~$10 band across all nations) so
    // the footprint is a handful of blocks however big the corpus.
    val supB = graft.sources.Tables.supplier(spark, args(0)).select(
      col("s_suppkey").cast("long").as("id"),
      col("s_nationkey").cast("long").as("nation"),
      (col("s_acctbal")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("bal"))
    val epsB = 1000L // $10 bands -> ~1100 bands over the bal range
    val blockB = 8
    for ((mult, tag) <- Seq(1 -> "1x", 10 -> "10x")) {
      val peersB = (0 until mult)
        .map(i => supB.select((col("id") + lit(i * 10000000L)).as("id"),
          col("nation"), col("bal")))
        .reduce(_ unionByName _).localCheckpoint()
      def bandRows(w: Int, n: Int): Seq[(Long, Long, Long)] =
        (0 until n).map { i =>
          (5000000L + w * 1000L + i, (i % 25).toLong,
            500000L + (i % 50).toLong)
        }
      // scan path (stream-static join, 63zza)
      val memS = MemoryStream[(Timestamp, Long, Long, Long)]
      val qnS = s"band_probe_${System.nanoTime()}"
      val qS = graft.streaming.ReactiveStreams.bandAdmitStream(
          memS.toDF().toDF("ts", "id", "nation", "bal"), peersB,
          epsCents = epsB)
        .writeStream.format("memory").queryName(qnS)
        .outputMode("append").start()
      val sTimesB =
        try {
          (0 until waves).map { w =>
            val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
            memS.addData(bandRows(w, waveSize).map { case (i, n, b) =>
              (new Timestamp(base + w * 60000L), i, n, b) })
            val s = System.nanoTime()
            qS.processAllAvailable()
            (System.nanoTime() - s) / 1e9
          }
        } finally qS.stop()
      val sStB = sTimesB.drop(1)
      println(("{\"probe\":\"band_admit_stream_per_trigger\"," +
        "\"path\":\"scan\",\"index\":\"%s\",\"wave_size\":%d," +
        "\"first_trigger_sec\":%.3f,\"steady_mean_sec\":%.3f," +
        "\"steady_min_sec\":%.3f}")
        .format(tag, waveSize, sTimesB.head,
          sStB.sum / sStB.length, sStB.min))
      // indexed path (partition-pruned probe, 63zzb)
      val dirB = java.nio.file.Files
        .createTempDirectory(s"band_probe_idx_$tag").toString
      val tBB = System.nanoTime()
      graft.operators.Relational.bandWriteIndex(peersB, dirB, epsB,
        blockB)
      val buildB = (System.nanoTime() - tBB) / 1e9
      val memI = MemoryStream[(Long, Long, Long)]
      val qI = graft.streaming.ReactiveStreams.bandAdmitIndexedStream(
        memI.toDF().toDF("id", "nation", "bal"), dirB,
        v => { v.collect(); () }, epsB, blockB)
      val iTimesB =
        try {
          (0 until waves).map { w =>
            memI.addData(bandRows(w, waveSize): _*)
            val s = System.nanoTime()
            qI.processAllAvailable()
            (System.nanoTime() - s) / 1e9
          }
        } finally qI.stop()
      val iStB = iTimesB.drop(1)
      println(("{\"probe\":\"band_admit_stream_per_trigger\"," +
        "\"path\":\"indexed\",\"index\":\"%s\"," +
        "\"index_build_sec\":%.1f,\"wave_size\":%d," +
        "\"first_trigger_sec\":%.3f,\"steady_mean_sec\":%.3f," +
        "\"steady_min_sec\":%.3f}")
        .format(tag, buildB, waveSize, iTimesB.head,
          iStB.sum / iStB.length, iStB.min))
      peersB.unpersist(blocking = false)
    }
    }
    spark.stop()
  }
}
