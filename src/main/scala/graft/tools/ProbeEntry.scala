package graft.tools
/** Drives the driver's flagship smoke check: SparkEntry.entry rows > 0. */
object ProbeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").appName("probe-entry").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    assert(n > 0, "flagship entry returned no rows")
    spark.stop()
  }
}
