package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Signals
import graft.sources.Tables

class SignalsSpec extends AnyFunSuite {
  import TestSession._

  test("signals evaluate in dependency order regardless of map order") {
    val out = Signals.derive(Tables.events(spark, sf), Map(
      "gross" -> "net * (1 + tax_rate)",       // depends on net, tax_rate
      "net" -> "value * 0.9",                  // depends on base column
      "tax_rate" -> "0.2",
      "gross2x" -> "gross * 2"))               // depends on gross
    val r = out.selectExpr("value", "net", "gross", "gross2x").head()
    val v = r.getDouble(0)
    assert(r.getDouble(1) === v * 0.9)
    assert(r.getDouble(2) === v * 0.9 * 1.2)
    assert(r.getDouble(3) === v * 0.9 * 1.2 * 2)
  }

  test("cyclic signals are rejected with the cycle path") {
    val ex = intercept[Signals.CyclicSignalException] {
      Signals.order(Map(
        "a" -> "b + 1", "b" -> "c + 1", "c" -> "a + 1"))
    }
    assert(ex.cycle.length >= 2)
  }

  test("self-reference is a cycle") {
    intercept[Signals.CyclicSignalException] {
      Signals.order(Map("x" -> "x + 1"))
    }
  }

  test("streaming dedup drops re-delivered events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.ReactiveStreams.Ev]
    val e = graft.streaming.ReactiveStreams
      .Ev(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0)
    mem.addData(Seq(e, e.copy(value = 2.0),
      e.copy(event_id = 2, value = 3.0)))
    val q = graft.streaming.ReactiveStreams.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
      assert(got.map(_.getAs[Long]("event_id")).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }
}
