package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Subscription surface (Rx `subscribe`/observers), Spark-first:
  * batch writers with layout control and streaming sinks.
  *
  * Scale notes: `partitionBy` columns become directory partitions —
  * choose low-cardinality keys (date, event_type), never user_id;
  * `maxRecordsPerFile` bounds file sizes; sorting within partitions
  * gives min/max zone-map pruning for downstream readers.
  */
object Sinks {
  /** Parquet with directory partitioning + bounded file sizes. */
  def parquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
              maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Bucketed managed table: co-locates rows by key so later joins
    * and aggregations on that key need NO shuffle at all — the
    * pre-partitioning that makes repeated fact-fact joins viable at
    * 100 TB (pay one shuffle at write time, never again). */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Range-clustered parquet layout: rows are range-partitioned on
    * the cluster columns and sorted within each file, so every file
    * covers a disjoint slice of the key space. Parquet's row-group
    * min/max statistics then prune whole files for any range or
    * point predicate on those columns — at 100 TB this is the
    * difference between scanning one file and scanning a thousand.
    * (The write costs one range-exchange; `numFiles` sizes the
    * output so each file is one big sorted run.) */
  def clusteredParquet(df: DataFrame, path: String,
                       clusterCols: Seq[String], numFiles: Int): Unit =
    df.repartitionByRange(numFiles,
        clusterCols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(
        clusterCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet(path)

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC interchange (columnar alternative to parquet; same
    * predicate-pushdown / column-pruning behavior at the scan). */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Streaming append sink to parquet with checkpointing. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String,
                      intervalMs: Long = 1000L): StreamingQuery =
    df.writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", checkpoint)
      .format("parquet").option("path", path).start()

  /** Rx `subscribe(onNext)`: per-micro-batch callback with exactly
    * the batch DataFrame + batch id (foreachBatch). */
  def subscribe(df: DataFrame, name: String)
               (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream.outputMode("append").queryName(name)
      .foreachBatch(onBatch).start()

  /** Rx `doOnNext`-style observability: named aggregate metrics that
    * accumulate on the executors DURING the job that computes the
    * result (CollectMetrics node — no second pass over the data,
    * which at 100 TB is the difference between free telemetry and a
    * doubled pipeline). Trigger any action on the returned frame,
    * then read `observation.get`. */
  def withMetrics(df: DataFrame, name: String,
                  metrics: (String, org.apache.spark.sql.Column)*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
