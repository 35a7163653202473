package graft.tools
/** Dev probe: time one or more SparkEntry queries (comma-separated)
  * cold + warm at a given sf dir — the targeted perf loop next to the
  * full graft.Bench run.
  * Usage: runMain graft.tools.ProbeTime <name[,name...]> [sfDir] [reps] */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.builder("32").appName("probe-time").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val timings = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name ${timings.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
