package graft.tools
import org.apache.spark.sql.functions._

/** Does approx_percentile at max accuracy equal DuckDB quantile_disc? */
object ProbeApct {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").appName("probe-apct").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val ev = graft.schema.DirCatalog(s"/root/testdata/$sf").table(spark, "events")
      val r = ev.groupBy(col("event_type")).agg(
        expr(s"approx_percentile(value, 0.5, ${Int.MaxValue})").as("exactish"),
        expr("approx_percentile(value, 0.5, 1000)").as("a1000"))
        .orderBy(col("event_type")).collect()
      println(s"APCT $sf " + r.map(x =>
        (x.getString(0), x.getDouble(1), x.getDouble(2))).mkString(" "))
    }
    spark.stop()
  }
}
