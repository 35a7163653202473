package graft.tools

/** Dev probe: print the AQE-final shuffle-exchange count per headline
  * entry — the source data for PlanFingerprintSpec's pinned counts. */
object ProbeExchanges {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("8").appName("probe-exch").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = (graft.Bench.relational ++ graft.Bench.pipeline).sorted
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val n = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning") ||
        l.contains("Exchange SinglePartition"))
      println(s"""    "$name" -> $n,""")
    }
    spark.stop()
  }
}
