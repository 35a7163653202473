package graft.tools

/** Dev probe: run one entry at a given SF and print the full failure. */
object ProbeFail {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val spark = graft.GraftSession.builder("32").appName("probe-fail").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.queryExecution.toRdd.count()
      println(f"$name OK rows=$n in ${(System.nanoTime()-t0)/1e9}%.2f s")
    } catch { case e: Throwable =>
      println(s"$name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      var c = e.getCause
      var i = 0
      while (c != null && i < 5) { println(s"  cause: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause; i += 1 }
    }
    spark.stop()
  }
}
