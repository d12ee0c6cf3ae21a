package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_json, xxhash64}
import org.apache.spark.sql.types.MapType

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round profiler: decomposes a registry query's
  * wall-clock into plan-build / optimize / execute phases and counts
  * the Spark jobs, stages and tasks each warm execution schedules —
  * the fixed-overhead census behind the r13 "286 queries < 0.5 s"
  * attack. Usage:
  *
  *   runMain graft.tools.ProfileQ <sfDir> q1,q2,...
  *
  * Prints one line per query:
  *   name build_ms opt_ms exec1_ms exec2_ms exec3_ms jobs stages tasks
  * (jobs/stages/tasks are for the LAST warm execution only).
  */
object ProfileQ {
  private def checksum(df: DataFrame): Unit = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: MapType => to_json(col(f.name))
        case _          => col(f.name)
      }
    }
    df.select(xxhash64(cols.toSeq: _*).as("h"))
      .agg(org.apache.spark.sql.functions.expr("bit_xor(h)")).head()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    println("name build_ms opt_ms exec1_ms exec2_ms exec3_ms " +
      "jobs stages tasks task_ms")
    graft.SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val build = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val opt = ms(t1)
        val t2 = System.nanoTime()
        checksum(fn(spark, sfDir))
        val e1 = ms(t2)
        val t3 = System.nanoTime()
        checksum(fn(spark, sfDir))
        val e2 = ms(t3)
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        val t4 = System.nanoTime()
        checksum(fn(spark, sfDir))
        val e3 = ms(t4)
        // listener events are async; give the bus a beat to drain
        Thread.sleep(150)
        println(f"$name $build%.0f $opt%.0f $e1%.0f $e2%.0f $e3%.0f " +
          s"${jobs.get} ${stages.get} ${tasks.get} ${taskMs.get}")
      }
    spark.stop()
  }
}
