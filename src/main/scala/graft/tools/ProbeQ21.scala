package graft.tools

/** Dev probe: timing + AQE-final plan of tpch_q21 and dedup_minhash at a
  * given sf dir (default the sf1 fixture). */
object ProbeQ21 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/target/sf1"
    val spark = graft.GraftSession.create("probe-q21")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PQ $label%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val q21 = graft.SparkEntry.queries("tpch_q21")
    time("q21(cold)")(q21(spark, dir).count())
    (1 to 3).foreach(i => time(s"q21(warm$i)")(q21(spark, dir).count()))
    val df = q21(spark, dir); df.count()
    println(df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("HashAggregate") || l.contains("Sort ")).mkString("\n"))
    val mh = graft.SparkEntry.queries("dedup_minhash")
    time("minhash(cold)")(mh(spark, dir).count())
    (1 to 3).foreach(i => time(s"minhash(warm$i)")(mh(spark, dir).count()))
    spark.stop()
  }
}
