package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-dump tool for the optimization rounds: writes the
  * `.explain("formatted")` output of named registry queries to
  * `<outDir>/<name>.txt` so before/after plan claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.Explain <sfDir> <outDir> [q1,q2,...]
  * (no query list = every registry key; same env/session as Bench).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        val txt =
          try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
        java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
          txt.getBytes("UTF-8"))
        println(s"wrote $name")
      }
    spark.stop()
  }
}
