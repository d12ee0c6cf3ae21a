package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for each left row, attach the payload of the
  * latest right row with order key at-or-before the left row's, per
  * join key. The classic time-series enrichment operator (Rx
  * `withLatestFrom` generalized to two tables).
  *
  * Spark-first realization: NOT a join. Both sides are union-tagged
  * into one stream, shuffled ONCE on the key, and the right payload
  * is carried forward by a running `last_value(ignoreNulls)` window;
  * left rows then peel off with their filled payload. A backward
  * range join would shuffle both sides AND range-scan per row; the
  * union-tag lattice is a single Exchange + one in-partition pass,
  * which is the shape that survives 100 TB (and skewed keys fall out
  * of AQE like any other window).
  *
  * Ties on the order key resolve right-row-first (tag 0 < tag 1), so
  * "at-or-before" includes an exactly-simultaneous right row. For
  * run-stable output `orderCol` must be a total order per key on the
  * union of both sides (a globally unique sequence/event id; a raw
  * timestamp with duplicates is not).
  */
object AsOf {
  /** @param left       rows to enrich (all its columns are kept)
    * @param right      payload source
    * @param keyCol     equi-join key present on both sides
    * @param orderCol   ordering column present on both sides
    * @param payload    right columns to carry (become `asof_<name>`)
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
           orderCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // the payload rides as ONE struct so every asof_ field comes from
    // the same right row even when individual payload values are null
    // (a per-column last(ignoreNulls) would mix rows in that case)
    val l = left.select(
      (Seq(lit(1).as("_tag")) ++ leftCols.map(col) :+
        lit(null).cast(payloadStruct).as("_asof")): _*)
    val r = right.select(
      (Seq(lit(0).as("_tag")) ++ leftCols.map {
        case c if c == keyCol || c == orderCol => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } :+ struct(payload.map(col): _*).as("_asof")): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }

  /** Column-expression variant of the left/right split entry: as-of
    * join of purchases against clicks within one events table. */
  def purchasesWithLatestClick(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "value")
    join(purchases, clicks, "user_id", "event_id", Seq("event_id", "value"))
      .withColumnsRenamed(Map(
        "value" -> "purchase_value",
        "asof_event_id" -> "click_event_id",
        "asof_value" -> "click_value"))
  }
}
