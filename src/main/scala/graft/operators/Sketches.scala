package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the forms that replace their
  * exact twins at 100 TB, where an exact distinct or percentile is a
  * full shuffle of every distinct value but a sketch is a fixed-size
  * mergeable state (HyperLogLog++ / KLL respectively) that partial-
  * aggregates map-side like any sum.
  *
  * ScalaTest-gated (Round3Spec asserts error bounds against the exact
  * twins): sketch outputs are implementation-defined, so there is no
  * cross-engine oracle by design.
  */
object Sketches {
  /** Per-event-type approximate cardinality + quantiles next to the
    * row count: one partial-aggregable pass. rsd = relative standard
    * deviation of the HLL++ estimate (0.02 ≈ 1.5 KB of state). */
  def approxStats(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        approx_count_distinct(col("value"), rsd).as("approx_values"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)),
          lit(10000)).as("value_quantiles"))

  /** Exact twin for the error-bound assertion (and the form you run
    * when the cardinality is known-small). */
  def exactStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("exact_users"),
        countDistinct(col("value")).as("exact_values"))
}
