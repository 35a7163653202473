package graft.tools
import org.apache.spark.sql.functions._

/** Timing + candidate counts for the prefix-filtered dedup at sf0.1. */
object ProbePrefix {
  import ProbePerf.t
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-prefix").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val dir = "/root/testdata/sf0.1"
    for (rep <- 1 to 3)
      t(s"dedup_prefix#$rep")(println("rows=" +
        qs("dedup_prefix")(spark, dir).count()))
    spark.stop()
  }
}
