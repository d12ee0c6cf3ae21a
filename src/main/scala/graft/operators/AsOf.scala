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

  /** Direction variants (pandas merge_asof parity), same union-tag
    * single-Exchange lattice as `join`:
    *  - "backward": latest right at-or-before (delegates to `join`)
    *  - "forward":  earliest right at-or-after (mirror frame; rights
    *    sort after lefts on order-key ties so an exactly-simultaneous
    *    right row is still matched)
    *  - "nearest":  closer of the two fills by order-key distance,
    *    ties to backward. Both fills ride the ONE shuffled union —
    *    the second window only re-sorts in-partition, it never
    *    re-shuffles.
    */
  def joinDirectional(left: DataFrame, right: DataFrame, keyCol: String,
                      orderCol: String, payload: Seq[String],
                      direction: String): DataFrame =
    joinDirectional(left, right, keyCol, orderCol, payload, direction,
      tolerance = None)

  /** merge_asof with `tolerance`: a fill only matches within
    * `tolerance` of the left row's order key. Pandas semantics for
    * "nearest": tolerance filters EACH side's candidate first, then
    * the nearer survivor wins — so an out-of-range backward fill
    * still loses to an in-range forward fill (a post-hoc filter on
    * the picked row would get that case wrong). Same one-Exchange
    * union-tag lattice; the tolerance check is a null-out on the
    * filled struct, no extra shuffle. */
  def joinDirectional(left: DataFrame, right: DataFrame, keyCol: String,
                      orderCol: String, payload: Seq[String],
                      direction: String, tolerance: Option[Long])
      : DataFrame = direction match {
    case "backward" if tolerance.isEmpty =>
      join(left, right, keyCol, orderCol, payload)
    case "backward" =>
      val fields = (orderCol +: payload).distinct
      val base = join(left, right, keyCol, orderCol, fields)
      val ok = col(s"asof_$orderCol").isNotNull &&
        col(orderCol) - col(s"asof_$orderCol") <= tolerance.get
      val nulled = payload.foldLeft(base)((df, c) =>
        df.withColumn(s"asof_$c", when(ok, col(s"asof_$c"))))
      if (payload.contains(orderCol)) nulled
      else nulled.drop(s"asof_$orderCol")
    case "forward" | "nearest" =>
      val leftCols = left.columns.toSeq
      val fields = (orderCol +: payload).distinct
      val payloadStruct = org.apache.spark.sql.types.StructType(
        fields.map(c => org.apache.spark.sql.types.StructField(
          c, right.schema(c).dataType, nullable = true)))
      val l = left.select(
        (Seq(lit(1).as("_tag")) ++ leftCols.map(col) :+
          lit(null).cast(payloadStruct).as("_p")): _*)
      val r = right.select(
        (Seq(lit(0).as("_tag")) ++ leftCols.map {
          case c if c == keyCol || c == orderCol => col(c)
          case c => lit(null).cast(left.schema(c).dataType).as(c)
        } :+ struct(fields.map(col): _*).as("_p")): _*)
      val u = l.unionByName(r)
      // forward frame: rights sort AFTER lefts at equal order key
      // (_tag desc puts tag=0 last), so [current, following] sees them
      val wF = Window.partitionBy(keyCol)
        .orderBy(col(orderCol), col("_tag").desc)
        .rowsBetween(0, Window.unboundedFollowing)
      val withF0 = u.withColumn("_fwd",
        first(col("_p"), ignoreNulls = true).over(wF))
      // tolerance: null the fill when its order-key distance exceeds
      // the bound (a null _fwd keeps null — `when` propagates it)
      val withF = tolerance.fold(withF0)(t => withF0.withColumn("_fwd",
        when(col(s"_fwd.$orderCol") - col(orderCol) <= t, col("_fwd"))))
      val filled =
        if (direction == "forward") withF.withColumn("_pick", col("_fwd"))
        else {
          val wB = Window.partitionBy(keyCol)
            .orderBy(col(orderCol), col("_tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
          val withB0 = withF
            .withColumn("_bwd", last(col("_p"), ignoreNulls = true).over(wB))
          val withB = tolerance.fold(withB0)(t => withB0.withColumn("_bwd",
            when(col(orderCol) - col(s"_bwd.$orderCol") <= t, col("_bwd"))))
          withB
            .withColumn("_pick", when(col("_fwd").isNull, col("_bwd"))
              .when(col("_bwd").isNull, col("_fwd"))
              .when(col(orderCol) - col(s"_bwd.$orderCol") <=
                col(s"_fwd.$orderCol") - col(orderCol), col("_bwd"))
              .otherwise(col("_fwd")))
        }
      filled.filter(col("_tag") === 1)
        .select((leftCols.map(col) ++
          payload.map(c => col(s"_pick.$c").as(s"asof_$c"))): _*)
    case other => throw new IllegalArgumentException(
      s"direction must be backward|forward|nearest, got $other")
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
