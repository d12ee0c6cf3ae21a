package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reactive
import graft.sources.Tables

object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Semantic checks of the batch reactive algebra (the DuckDB oracle
  * covers exact values; these assert the *reactive* invariants). */
class ReactiveSpec extends AnyFunSuite {
  import TestSession._
  private lazy val ev = Tables.events(spark, sf).cache()

  test("rxDistinctUntilChanged never emits consecutive repeats per key") {
    val out = Reactive.rxDistinctUntilChanged(ev)
    val bad = out
      .withColumn("prev", lag("event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")))
      .filter(col("prev") === col("event_type"))
    assert(bad.count() === 0)
  }

  test("rxTake caps per-key stream length at n; rxSkip is the complement") {
    val take = Reactive.rxTake(ev, 5)
    assert(take.groupBy("user_id").count().agg(max("count")).head.getLong(0) <= 5)
    val total = ev.count()
    assert(take.count() + Reactive.rxSkip(ev, 5).count() === total)
  }

  test("rxDebounce keeps only events followed by >= gap silence") {
    val out = Reactive.rxDebounce(ev, 600000L)
    // every kept event must not have a successor within the gap
    val joined = out.join(ev.select(col("user_id"),
        col("event_id").as("other_id"), col("ts").as("other_ts")), Seq("user_id"))
      .join(ev.select(col("event_id"), col("ts")), Seq("event_id"))
      .filter(col("other_id") > col("event_id") &&
        unix_millis(col("other_ts")) - unix_millis(col("ts")) < 600000L &&
        unix_millis(col("other_ts")) >= unix_millis(col("ts")))
    // a violation = kept event with the *next* event inside the gap
    val nextIds = ev.withColumn("next_id", lead("event_id", 1).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")))
    val viol = out.join(nextIds.select("event_id", "next_id"), Seq("event_id"))
      .join(ev.select(col("event_id").as("next_id"), col("ts").as("next_ts")),
        Seq("next_id"))
      .join(ev.select(col("event_id"), col("ts")), Seq("event_id"))
      .filter(unix_millis(col("next_ts")) - unix_millis(col("ts")) < 600000L)
    assert(viol.count() === 0)
  }

  test("rxZip pairs i-th purchase with i-th click and truncates") {
    val out = Reactive.rxZip(ev)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").count().withColumnRenamed("count", "np")
    val c = ev.filter(col("event_type") === "click")
      .groupBy("user_id").count().withColumnRenamed("count", "nc")
    val expected = p.join(c, "user_id")
      .select(least(col("np"), col("nc")).as("n")).agg(sum("n")).head.getLong(0)
    assert(out.count() === expected)
  }

  test("rxScan is monotone in running_n and consistent with totals") {
    val out = Reactive.rxScan(ev)
    val last = out.groupBy("user_id").agg(max("running_n").as("n"))
    val counts = ev.groupBy("user_id").count()
    assert(last.join(counts, "user_id")
      .filter(col("n") =!= col("count")).count() === 0)
  }

  test("rxWithLatestFrom only emits clicks with a preceding purchase") {
    val out = Reactive.rxWithLatestFrom(ev).cache()
    val clicks = ev.filter(col("event_type") === "click")
    assert(out.count() <= clicks.count())
    assert(out.filter(col("latest_purchase").isNull).count() === 0)
  }

  test("rxOnErrorResume truncates streams at first error") {
    val out = Reactive.rxOnErrorResume(ev)
    // no kept normal event may come at/after its user's first error
    val firstErr = ev.filter(col("event_type") === "error")
      .groupBy("user_id").agg(min("event_id").as("err_id"))
    val bad = out.filter(col("event_type") =!= "fallback")
      .join(firstErr, Seq("user_id"))
      .filter(col("event_id") >= col("err_id"))
    assert(bad.count() === 0)
  }
}
