package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated parquet tables.
  *
  * All loaders return lazy plans; column pruning and predicate
  * pushdown happen in Catalyst, so callers should `select`/`filter`
  * on the result rather than asking for trimmed variants here.
  */
object Tables {
  // TPC-H-ish star schema
  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                      s_acctbal: Double)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
                  p_type: String, p_size: Int, p_retailprice: Double)
  case class Orders(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                    o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                    o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  /** The canonical "observable": keyed (user_id), timestamped event stream. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped in two encodings across testdata
    * generations: `ts` as a native us-precision timestamp, and `ts`
    * as ns-precision (which Spark 4 surfaces as a raw-nanos LONG
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * GraftSession at construction). Sniff the loaded schema and
    * normalize both to the engine's native us timestamp — integer
    * `div`, no double rounding, so the legacy path floors exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      // NTZ → session-TZ timestamp: the engine standardizes on
      // TimestampType (unix_millis etc. require it); session TZ is
      // UTC so the wall-clock values are unchanged.
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  // Typed surface: Dataset[T] with case-class Encoders for callers
  // that want compile-time row types (the DataFrame loaders stay the
  // engine-internal path — schema-dynamic operators don't pay the
  // per-row serialization a typed map would add).
  import org.apache.spark.sql.Dataset
  def eventsDs(s: SparkSession, d: String): Dataset[Event] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    events(s, d).as[Event]
  }
  def lineitemDs(s: SparkSession, d: String): Dataset[Lineitem] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Lineitem]
    lineitem(s, d).as[Lineitem]
  }
  def ordersDs(s: SparkSession, d: String): Dataset[Orders] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Orders]
    orders(s, d).as[Orders]
  }
  def documentsDs(s: SparkSession, d: String): Dataset[Document] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Document]
    documents(s, d).as[Document]
  }
  def embeddingsDs(s: SparkSession, d: String): Dataset[Embedding] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Embedding]
    embeddings(s, d).as[Embedding]
  }
}
