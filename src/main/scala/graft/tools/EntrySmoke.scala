package graft.tools

/** Replicates the driver's t1 smoke: entry(spark) must return >0 rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
