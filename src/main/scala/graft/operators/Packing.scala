package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: concatenate
  * documents into fixed-capacity bins (the "pack short documents
  * into one context window" step of an LLM data pipeline).
  *
  * Greedy first-fit-in-order packing is inherently sequential — the
  * bin a document lands in depends on every prior admission — so,
  * like exhaustMap (Reactive.scala), it cannot be a window function.
  * The scale design:
  *  - only (source, shard, doc_id, n_chars) ever shuffles (~32
  *    bytes/doc; the text column stays in place and can be joined
  *    back by doc_id after bin assignment);
  *  - documents are sharded by a deterministic md5 bucket of doc_id
  *    BEFORE packing, so the sequential scan unit is (source, shard)
  *    — shard count bounds the longest sequential chain no matter
  *    how large one source grows at 100 TB;
  *  - `flatMapSortedGroups` uses the shuffle's secondary sort for
  *    the in-order walk: O(1) state (bin id + running sum) per
  *    group, never a per-group materialized list.
  */
object Packing {

  /** Pack each (source, shard)'s documents, in doc_id order, into
    * bins of at most `capacity` chars (a document larger than
    * `capacity` gets a bin of its own). Returns one row per bin.
    *
    * Shards split each source by the first hex digit of
    * md5(doc_id): digit d -> shard d * shards / 16. Reproducible on
    * any cluster size and replicable in ANSI SQL — same trick as
    * Sampling.samplePerKey.
    */
  def packGreedy(docs: DataFrame, capacity: Long = 4096L,
                 shards: Int = 2): DataFrame = {
    require(shards >= 1 && shards <= 16,
      s"shards must be in [1,16] (got $shards): sharding uses one " +
        "md5 hex digit")
    val s = docs.sparkSession
    import s.implicits._
    val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 1),
      16, 10).cast("int") * shards / 16).cast("int")
    docs
      .select(col("source"), shard.as("shard"), col("doc_id"),
        col("n_chars"))
      .as[(String, Int, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapSortedGroups(col("doc_id")) { case ((src, sh), it) =>
        var bin = 0L
        var used = 0L
        var first = true
        it.map { case (_, _, id, n) =>
          if (first) { used = n; first = false }
          else if (used + n > capacity) { bin += 1; used = n }
          else used += n
          (src, sh, bin, id, n)
        }
      }
      .toDF("source", "shard", "bin_id", "doc_id", "n_chars")
      .groupBy("source", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("bin_chars"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  /** Best-fit-decreasing packing — the tighter (offline) sibling of
    * [[packGreedy]]'s arrival-order first-fit: docs sort LARGEST
    * FIRST within each (source, md5-shard) group and each one drops
    * into the FULLEST bin that still fits (ties → lowest bin id),
    * else opens a new bin. BFD is the classic ≤ 11/9·OPT + 6/9
    * bound; against first-fit it trades arrival-order streaming for
    * measurably fewer, fuller bins when the size distribution is
    * heavy-tailed. Same O(1)-per-group-state sorted walk (the bin
    * LOADS array is the only state, bounded by bins-per-group);
    * oversized docs open singleton bins. The DuckDB oracle replays
    * the identical walk with a loads LIST in a recursive CTE —
    * same tie rule (list_position = first occurrence). */
  def packBfd(docs: DataFrame, capacity: Long = 4096L,
              shards: Int = 2): DataFrame = {
    require(shards >= 1 && shards <= 16,
      s"shards must be in [1,16] (got $shards)")
    val s = docs.sparkSession
    import s.implicits._
    val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 1),
      16, 10).cast("int") * shards / 16).cast("int")
    docs
      .select(col("source"), shard.as("shard"), col("doc_id"),
        col("n_chars"))
      .as[(String, Int, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapSortedGroups(col("n_chars").desc, col("doc_id")) {
        case ((src, sh), it) =>
          val loads = scala.collection.mutable.ArrayBuffer[Long]()
          it.map { case (_, _, id, n) =>
            val fits = loads.zipWithIndex
              .filter { case (l, _) => l + n <= capacity }
            val bin =
              if (fits.isEmpty) { loads += n; loads.length - 1 }
              else {
                val (l, i) = fits.maxBy(_._1) // first max = lowest idx
                loads(i) = l + n
                i
              }
            (src, sh, bin.toLong, id, n)
          }
      }
      .toDF("source", "shard", "bin_id", "doc_id", "n_chars")
      .groupBy("source", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("bin_chars"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  /** The daily-ingestion pipeline as ONE composed plan: admit only
    * documents new to the corpus (Dedup.incrementalNew), drop
    * low-quality ones, pack the survivors into training bins. The
    * admitted-id set is small relative to the corpus, so the
    * join-back to pick up sizes broadcasts; everything downstream of
    * the anti join operates on the increment only. */
  def ingest(docs: DataFrame, batchSources: Seq[String],
             minChars: Long = 150L, capacity: Long = 2048L,
             shards: Int = 2): DataFrame = {
    val admitted = org.apache.spark.sql.functions.broadcast(
      Dedup.incrementalNew(docs, batchSources).select("doc_id"))
    packGreedy(
      docs.join(admitted, "doc_id").filter(col("n_chars") >= minChars),
      capacity, shards)
  }
}
