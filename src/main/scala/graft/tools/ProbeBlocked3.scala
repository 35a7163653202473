package graft.tools
import org.apache.spark.sql.functions._

/** Explain + counts for the blocked entry at sf0.1. */
object ProbeBlocked3 {
  import ProbePerf.t
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-blocked3").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val df = qs("dedup_ngram_blocked")(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    t("run1")(println("rows=" + df.count()))
    t("run2")(println("rows=" + df.count()))
    spark.stop()
  }
}
