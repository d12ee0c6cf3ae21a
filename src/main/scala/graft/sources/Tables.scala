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
  /** events.parquet carries ns-precision timestamps, which Spark 4
    * rejects by default; read them as raw nanos and floor to the
    * engine's native us precision (integer `div`, no double rounding).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, which
    * GraftSession sets at construction. It is session-wide (it changes
    * how ANY ns-precision parquet column in the session is surfaced,
    * long instead of error), so it is deliberately NOT mutated here as
    * a read side effect; sessions built elsewhere must opt in
    * themselves. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is ns-precision: build the session with " +
        "GraftSession.builder() or set spark.sql.legacy.parquet.nanosAsLong=true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
