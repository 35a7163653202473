package graft.tools

/** Dev micro-bench: time N passes of one or more SparkEntry queries
  * (comma-separated) on one JVM — the targeted inner loop next to the
  * full graft.Bench run, for iterating on a single operator's plan
  * without paying the whole headline suite per measurement. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 5
    val spark = graft.GraftSession.builder("32").appName("bench-one").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      qs(name)(spark, sfDir).queryExecution.toRdd.count() // untimed JIT + artifact warmup
      var rows = 0L
      val times = (1 to passes).map { _ =>
        graft.operators.Dedup.releaseIntermediates()
        val t0 = System.nanoTime()
        rows = qs(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f rows=$rows passes=" +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
