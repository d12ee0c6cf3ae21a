package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults tuned for the test harness (`local[32]`,
  * 32 shuffle partitions); on a real cluster the same builder is used
  * with `master` unset and `spark.sql.shuffle.partitions` sized to
  * ~2-3x total cores. AQE stays on in both: it coalesces small
  * shuffle partitions, re-plans skew joins, and converts
  * sort-merge->broadcast at runtime, which is exactly what the
  * 100 TB deployment needs.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // measured-and-rejected (r13): parallelismFirst=false +
      // advisoryPartitionSizeInBytes=64m ran a 60-key small-query
      // subset 10.85 -> 12.06 s at sf0.1 — coalescing mid-size
      // shuffles to one 64 MB partition costs more parallelism than
      // the per-task overhead it saves; AQE's parallelism-first
      // default is already right for both this box and the cluster.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Money sums ride the scaled-BIGINT kernel by default since
      // r13: Kernels.moneyScaled reproduces the DECIMAL cast's exact
      // rounding per row (Round6Spec pins value AND schema parity vs
      // the DECIMAL route, incl. the 8.165-class traps), the agg
      // buffer is a compact long instead of per-row BigDecimal, and
      // the measured exactness tax drops ~4.7x -> ~1.8x (SURVEY
      // §5.4: q1 1.0 -> 0.37 s at sf0.1). Session conf — tests and
      // probes can still flip it off per session, and
      // SPARK_GRAFT_FAST_MONEY=false A/Bs the DECIMAL route.
      .config("spark.graft.fastMoneySums",
        sys.env.getOrElse("SPARK_GRAFT_FAST_MONEY", "true"))
      // 160+ gated queries are ~500 whole-stage-codegen stages; the
      // default 100-entry generated-class cache evicts constantly and
      // every run re-Janino-compiles nearly every stage. Static conf:
      // must be set before the first SparkSession in the JVM.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // The events table carries INT64(TIMESTAMP(NANOS)) which Spark 4
      // rejects by default; session-wide opt-in (see Tables.events,
      // which converts the raw nanos to native us precision).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // graft's Catalyst extensions: the row_number<=k -> TopKPerGroup
      // optimizer rewrite + the planner strategy for its physical node
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** RocksDB streaming state store — the 100 TB deployment's state
    * backend. The default HDFSBackedStateStoreProvider keeps every
    * key's state as JVM heap objects (state size is bounded by
    * executor heap, GC pauses scale with map size); RocksDB keeps it
    * off-heap on local SSD with changelog checkpointing, so per-key
    * state (withLatestFrom caches, top-k heaps, funnel progress over
    * billions of users) is bounded by disk, not heap. Session conf,
    * picked up by queries STARTED after the call — flip it before
    * `.start()`, not mid-query; existing checkpoints keep their
    * original provider. Local tests run both providers
    * (StreamingSpec) to pin provider-independence of results. */
  def useRocksDBStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    // write per-batch deltas, compact in the background — turns each
    // commit from a full SST upload into an O(changed keys) append
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }
}
