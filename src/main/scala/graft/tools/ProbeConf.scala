package graft.tools

/** Dev probe: print the session values of the runtime-filter and AQE
  * confs the round-19 optimization notes cite. */
object ProbeConf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("probe-conf")
    Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      "spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes"
    ).foreach { k =>
      val v = try spark.conf.get(k) catch { case _: Throwable => "<unset>" }
      println(s"CONF $k = $v")
    }
    spark.stop()
  }
}
