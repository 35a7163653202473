package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Sub-stage timings of the count-based blocked formulation at sf0.1. */
object ProbeBlocked4 {
  import ProbePerf.t
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-blocked4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sigs")(sigs.count())
    val hs = sigs.select(col("id"), col("hs"))
    for (rep <- 1 to 3) {
      val inv = hs.select(col("id"), explode(col("hs")).as("g"))
      val dfc = inv.groupBy(col("g")).agg(count(lit(1)).as("c"))
      val invR = inv.join(dfc.filter(col("c").between(2, 30)).select(col("g")), Seq("g"))
      t(s"invR#$rep")(invR.count())
      val joined = invR.select(col("g"), col("id").as("a_id"))
        .join(invR.select(col("g"), col("id").as("b_id")), Seq("g"))
        .filter(col("a_id") < col("b_id"))
      t(s"join#$rep")(joined.count())
      val pairs = joined.groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("shared_rare"))
      t(s"pairs#$rep")(pairs.count())
      t(s"full#$rep")(Dedup.ngramJaccardPairsBlockedFromSigs(sigs, 0.3, 30).count())
    }
    println("partitions after shuffle: " +
      hs.select(col("id"), explode(col("hs")).as("g")).groupBy("g").count().rdd.getNumPartitions)
    spark.stop()
  }
}
