package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational / OLAP capability over the star schema: the engine
  * must serve classic analytical queries next to the reactive
  * algebra. Shapes follow the public TPC-H query set, adapted to the
  * columns present in the driver's synthetic tables.
  *
  * Scale design:
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    `broadcast()` so the fact scan never shuffles for them;
  *  - fact-side predicates live in `filter` directly over the scan
  *    so Catalyst pushes them into parquet (PushedFilters);
  *  - money aggregates go through DecimalType: exact, order-stable
  *    across any cluster size;
  *  - top-k uses orderBy+limit (TakeOrderedAndProject: per-partition
  *    heap + single driver merge, no global sort shuffle).
  */
object Relational {
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
  private def dec6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))

  /** TPC-H Q1 shape: full-scan grouped aggregate with derived measures. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).as("sum_base_price"),
        sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6 shape: tight filters that must reach the parquet scan. */
  def q6Revenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec4(col("l_extendedprice") * col("l_discount"))).as("revenue"))

  /** TPC-H Q3 shape: selective dims broadcast into the fact join, top-10. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-03-15").cast("timestamp")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(broadcast(ord.join(broadcast(cust),
        col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue"))
      // o_orderdate is TIMESTAMP_NTZ in the parquet; pin to UTC for epoch math
      .select(col("l_orderkey"),
        unix_millis(to_utc_timestamp(col("o_orderdate"), "UTC"))
          .as("o_orderdate_ms"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  }

  /** TPC-H Q5 shape: star join with the local-supplier correlation. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue"))
  }

  /** Semi + anti join: customers without orders (NOT EXISTS). */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ordKeys = Tables.orders(s, dir).select("o_custkey")
    val withO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select(col("c_custkey"), lit(1).as("has_orders"))
    val withoutO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), lit(0).as("has_orders"))
    withO.unionByName(withoutO)
  }

  /** Window rank: top-3 parts by retail price per brand. */
  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))))
      .filter(col("rn") <= 3)
      .select("p_brand", "rn", "p_partkey", "p_retailprice")

  /** Multi-level aggregate via ROLLUP. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(dec2(col("l_quantity"))).as("sum_qty"))

  /** CUBE aggregate over order dimensions. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).as("sum_price"))

  /** TPC-H Q4 shape: correlated EXISTS with an inequality — orders
    * having at least one lineitem shipped >90 days after the order
    * date, counted by priority. Semi join keeps the probe side
    * unduplicated (no distinct needed). */
  def q4LateOrders(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    // EXISTS(l_shipdate > X) === max(l_shipdate) > X: pre-aggregate
    // the fact side map-side (6B rows -> one row per order at scale)
    // instead of semi-joining against the raw fact, which would
    // build/broadcast the big side.
    val lateBound = Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(max("l_shipdate").as("max_ship"))
    ord.join(lateBound, col("l_orderkey") === col("o_orderkey"))
      .filter(col("max_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** Exact percentiles (continuous interpolation) per group — the
    * single-pass sort-based form; at very large scale swap for
    * approx_percentile (t-digest) at the caller's accuracy budget. */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"),
        count(lit(1)).as("n"))

  /** Group-wise max (correlated-subquery shape done with a window). */
  def qGroupwiseMax(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("s_nationkey")
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))))
      .filter(col("rn") === 1)
      .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal")
}
