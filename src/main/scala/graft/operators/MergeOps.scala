package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (SCD type-1 upsert) compiled to one full-outer join.
  *
  * Vanilla Spark has no MERGE INTO statement (that lives in table
  * formats); the engine-level primitive is the same plan every such
  * format executes underneath: full-outer join base-to-updates on
  * the key, update rows take the update-side values, unmatched
  * update rows insert, unmatched base rows carry through.
  *
  * Scale notes: both sides shuffle once on the key — with the base
  * stored as a bucketed table on the key (Sinks.bucketedTable) the
  * base side's exchange disappears and the merge cost is
  * O(updates) + a co-located join, which is the production shape
  * for continuous ingestion at 100 TB.
  */
object MergeOps {
  /** Upsert `updates` into `base` on `key`.
    *
    * Output schema = base schema + `merge_action` (update | insert |
    * keep). Shared non-key columns take the update value when an
    * update row matches; base-only columns survive unchanged and are
    * NULL on inserted rows. Update-side values must be non-null for
    * matched rows to count as replacements (a null update value
    * falls back to the base value, coalesce semantics).
    *
    * PRECONDITION: `updates` must carry at most one row per key —
    * duplicate update keys multiply matched base rows through the
    * full-outer join (k update rows for one base key emit k output
    * rows), silently breaking the one-row-per-key upsert contract.
    * Callers with multi-row update feeds must pre-collapse, e.g.
    * last-wins: updates.groupBy(key).agg(cols.map(c =>
    * max_by(col(c), col(versionCol)).as(c)): _*) — kept OUT of this
    * operator so callers whose feeds are already unique (the common
    * CDC-compacted case) don't pay a redundant shuffle. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val shared = updates.columns.filter(c => c != key && base.columns.contains(c))
    require(shared.nonEmpty || updates.columns.sameElements(Array(key)),
      s"updates share no non-key columns with base: ${updates.columns.mkString(",")}")
    val joined = base.as("b")
      .join(updates.as("u"), col(s"b.$key") === col(s"u.$key"), "full_outer")
    val outKey = coalesce(col(s"b.$key"), col(s"u.$key")).as(key)
    val outCols = base.columns.filterNot(_ == key).map { c =>
      if (shared.contains(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      else col(s"b.$c").as(c)
    }
    val action = when(col(s"b.$key").isNull, lit("insert"))
      .when(col(s"u.$key").isNull, lit("keep"))
      .otherwise(lit("update")).as("merge_action")
    joined.select((outKey +: outCols.toSeq :+ action): _*)
  }

  /** SCD type-2 merge: history-preserving upsert. The base is a
    * version history — (key, value, valid_from, valid_to NULL for
    * the current row); `updates` carries one (key, value) per key
    * effective at `asOf`. Semantics per key:
    *  - value changed: the current row CLOSES (valid_to = asOf) and
    *    a new current row (valid_from = asOf) appends;
    *  - value unchanged or key absent from updates: history carries
    *    through untouched;
    *  - brand-new key: one new current row.
    * Closed history rows always pass through unchanged — only each
    * key's single current row can be affected, so the same
    * unique-update-key precondition as [[upsert]] applies.
    *
    * Plan: ONE left join of base onto updates (only current rows can
    * match by construction of the predicate) + a left-anti join for
    * the inserts, both on the same key partitioning; the close/append
    * fan-out is a 2-element array explode on changed rows only, a
    * narrow generator. Bucket the base on the key and the production
    * form is exchange-free on the history side, exactly as type-1. */
  def scd2Upsert(base: DataFrame, updates: DataFrame, key: String,
                 valueCol: String, asOf: Long): DataFrame = {
    val u = updates.select(col(key), col(valueCol).as("u_value"))
    val joined = base.join(u, Seq(key), "left")
    val changed = col("valid_to").isNull && col("u_value").isNotNull &&
      col("u_value") =!= col(valueCol)
    val versions = joined.select(
      col(key), explode(
        when(changed, array(
          struct(col(valueCol).as("v"), col("valid_from").as("vf"),
            lit(asOf).as("vt")),
          struct(col("u_value").as("v"), lit(asOf).as("vf"),
            lit(null).cast("long").as("vt"))))
        .otherwise(array(
          struct(col(valueCol).as("v"), col("valid_from").as("vf"),
            col("valid_to").as("vt"))))).as("r"))
      .select(col(key), col("r.v").as(valueCol),
        col("r.vf").as("valid_from"), col("r.vt").as("valid_to"))
    val inserts = u.join(base.select(key).distinct(), Seq(key), "left_anti")
      .select(col(key), col("u_value").as(valueCol),
        lit(asOf).as("valid_from"), lit(null).cast("long").as("valid_to"))
    versions.unionByName(inserts)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time snapshot over an SCD2 frame ([[scd2Upsert]]'s
    * output shape): the dimension's state exactly as of `asOf` —
    * the time-travel read that makes the SCD2 history worth its
    * storage (reproduce yesterday's report, join facts to the dim
    * version that was live when they happened). A narrow filter on
    * the interval-halfopen contract [valid_from, valid_to); no
    * exchange at all, and on a valid_from-clustered layout the scan
    * prunes to the files overlapping T. */
  def scd2AsOf(scd2: DataFrame, asOf: Long): DataFrame =
    scd2.filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .withColumn("snap_t", lit(asOf))

  /** Snapshot diff (CDC between two corpus versions): classify every
    * key as added / removed / changed / same by full-outer joining
    * the two snapshots and comparing an xxhash64 of the compared
    * columns — the payloads themselves never ship, only (key, 8-byte
    * hash), so the diff's shuffle is O(keys), not O(data). The
    * production use is crawl-to-crawl corpus drift: what entered,
    * what left, what silently changed. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, tag: String) =
      df.select(col(key).as(s"${tag}_k"),
        xxhash64(compareCols.map(col): _*).as(s"${tag}_h"))
    hashed(oldSnap, "o")
      .join(hashed(newSnap, "n"), col("o_k") === col("n_k"), "full_outer")
      .select(coalesce(col("o_k"), col("n_k")).as(key),
        when(col("o_k").isNull, lit("added"))
          .when(col("n_k").isNull, lit("removed"))
          .when(col("o_h") === col("n_h"), lit("same"))
          .otherwise(lit("changed")).as("change"))
  }
}
