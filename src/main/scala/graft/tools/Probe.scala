package graft.tools

/** Ad-hoc timing probe for individual SparkEntry queries (dev tool).
  * Usage: runMain graft.tools.Probe <sfDir> <queryName>...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, d).count()
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
