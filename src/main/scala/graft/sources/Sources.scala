package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Observable-creation surface, Spark-first: the reference builds
  * streams from collections, timers, and files; here those are
  * bounded DataFrames, rate sources, and (streaming) file sources.
  * All return lazy plans.
  */
object Sources {
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Rx `Observable.from(iterable)`: a bounded in-memory stream. */
  def fromSeq(spark: SparkSession, rows: Seq[Tables.Event]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Rx `Observable.interval(period)`: unbounded tick stream
    * (Structured Streaming rate source; event_id = tick number). */
  def interval(spark: SparkSession, ticksPerSecond: Int = 10): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", ticksPerSecond.toString).load()
      .select(col("value").as("event_id"), col("timestamp").as("ts"))

  /** Rx `range(start, n)`: distributed bounded sequence (no driver
    * materialization; Spark's range is generated per-partition). */
  def range(spark: SparkSession, start: Long, n: Long): DataFrame =
    spark.range(start, start + n).select(col("id").as("event_id"))

  /** File-backed stream of events: the same parquet directory is
    * readable bounded (batch) or unbounded (file-source streaming,
    * one micro-batch per discovered file). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // same session-wide opt-in contract as Tables.events: set by
    // GraftSession.builder, never mutated here as a read side effect
    require(
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is ns-precision: build the session with " +
        "GraftSession.builder() or set spark.sql.legacy.parquet.nanosAsLong=true")
    val nsSchema = StructType(eventSchema.fields.map {
      case StructField("ts", _, n, m) => StructField("ts", LongType, n, m)
      case f => f
    })
    // the streaming file source wants a directory; select the events
    // file(s) from the sf directory by glob
    spark.readStream.schema(nsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** CSV/JSON ingest with explicit schema (schema inference is a
    * full extra pass at 100 TB — never rely on it). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
