package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe for the verify loop — drives the public Engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    // deliberately NOT setting nanosAsLong here: ParquetNanos.read must
    // set it dynamically (the driver's own session may lack it)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.engine.Engine.forDir(spark, "/root/testdata/sf0.001")
    try { e.executeJson("""{"select":[]}""") } catch { case ex: Throwable => println("P1 " + ex.getClass.getSimpleName + ": " + ex.getMessage) }
    try { e.executeJson("""{"select":["event_type",{"COUNT":"*"}],"from":"events","group_by":["event_type"],"order_by":[{"col":"no_such","dir":"desc"}]}""").collect() } catch { case ex: Throwable => println("P2 " + ex.getClass.getSimpleName + ": " + ex.getMessage) }
    try { e.executeJson("""{"select":[{"COUNT":"*"}],"from":"events","where":[{"col":"bogus","op":"eq","val":1}]}""").collect() } catch { case ex: Throwable => println("P3 " + ex.getClass.getSimpleName + ": " + ex.getMessage) }
    val df = e.executeJson("""{"select":["event_type",{"SUM":"value"}],"from":"events","group_by":["event_type"],"order_by":[{"col":"SUM(value)","dir":"desc"}]}""")
    println("P4 top: " + df.collect().head)
    val t0=System.nanoTime
    e.executeJson("""{"select":["event_type",{"SUM":"value"}],"from":"events","group_by":["event_type"],"order_by":[{"col":"SUM(value)","dir":"desc"}]}""").collect()
    println(f"P4 cached route=${e.lastRoute} in ${(System.nanoTime-t0)/1e6}%.1f ms")
    val pe = graft.SparkEntry.preparedEngine(spark, "/root/testdata/sf0.001")
    val routed = pe.executeJson("""{"select":["day",{"SUM":"value"}],"from":"events","where":[{"col":"event_type","op":"eq","val":"purchase"},{"col":"day","op":"eq","val":"2024-01-15"}],"group_by":["day"]}""")
    println("P5 route=" + pe.lastRoute + " rows=" + routed.collect().toList)
    spark.stop()
  }
}
/** Probe for the Catalyst rewrite: raw spark.sql over the prepared fact
  * table must scan the rollup instead. */
object ProbeRewrite {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.preparedEngine(spark, "/root/testdata/sf0.001")
    val root = "/root/repo/target/prepared/sf0.001"
    val rule = graft.catalyst.AggRewriteRule.configure(spark, s"$root/events",
      graft.prepare.Prepare.defaultAggregates(),
      name => spark.read.parquet(s"$root/aggregates/$name"))
    spark.read.parquet(s"$root/events").createOrReplaceTempView("events_fact")
    val df = spark.sql("SELECT event_type, sum(value) s, avg(value) a FROM events_fact GROUP BY event_type ORDER BY event_type")
    df.show(5, false)
    println("R1 fired=" + rule.fired)
    println("R2 plan-scans-rollup=" + df.queryExecution.executedPlan.toString.contains("agg_type_day_value"))
    spark.stop()
  }
}
