package graft.tools

/** Dev probe: print the AQE-final plan's join/exchange skeleton and any
  * BroadcastExchange subtree roots for a named entry at a given sf dir. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val entry = if (args.length > 0) args(0) else "tpch_q5"
    val dir = if (args.length > 1) args(1) else "/root/repo/target/sf1"
    val spark = graft.GraftSession.create("probe-plan")
    val df = graft.SparkEntry.queries(entry)(spark, dir)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"PP $entry first ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val t1 = System.nanoTime()
    graft.SparkEntry.queries(entry)(spark, dir).queryExecution.toRdd.count()
    println(f"PP $entry warm ${(System.nanoTime() - t1) / 1e9}%.3f s")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(finalPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("HashAggregate") || l.contains("Sort ") || l.contains("FileScan"))
      .mkString("\n"))
    finalPlan.foreach {
      case b: BroadcastExchangeExec =>
        println(s"BROADCAST rows=${b.metrics.get("numOutputRows").map(_.value)} " +
          s"size=${b.metrics.get("dataSize").map(_.value)}")
      case _ =>
    }
    spark.stop()
  }
}
