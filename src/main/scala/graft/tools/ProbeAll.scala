package graft.tools

/** Dev probe: one timed pass of EVERY SparkEntry query (after an
  * untimed warm pass), printed slowest-first — finds per-entry outliers
  * the 35-entry headline bench can't see (how text_langid's 16.8 s at
  * sf1 was caught). */
object ProbeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("32").appName("probe-all").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val times = qs.keys.toSeq.sorted.flatMap { name =>
      try {
        qs(name)(spark, sfDir).queryExecution.toRdd.count() // warm
        graft.operators.Dedup.releaseIntermediates()
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).queryExecution.toRdd.count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Exception =>
          println(s"ERR $name: ${e.getMessage.take(80)}"); None
      }
    }
    times.sortBy(-_._2).foreach { case (n, t) => println(f"ALL $t%8.3f  $n") }
    println(f"ALL-TOTAL ${times.map(_._2).sum}%.1f s over ${times.size} entries")
    spark.stop()
  }
}
