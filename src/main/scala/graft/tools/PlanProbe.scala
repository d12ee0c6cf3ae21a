package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off: print the AQE-final plan + per-stage timing of named
  * queries at a given SF dir (diagnosis aid for scale probes). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"\n===== $name @ $sfDir : ${"%.2f".format(sec)} s =====")
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).trim)
    }
    spark.stop()
  }
}
