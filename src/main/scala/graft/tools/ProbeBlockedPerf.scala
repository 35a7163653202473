package graft.tools
import org.apache.spark.sql.functions._
/** Stage timing for the blocked n-gram dedup at sf0.1 (docSigs warm). */
object ProbeBlockedPerf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-bp").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.sources.ParquetNanos.read(spark, s"$dir/documents.parquet")
    val sigs = graft.operators.Dedup.signatures(docs, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count() // warm
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime - t0) / 1e9}%6.2f s  rows=$n")
    }
    val inv = sigs.select(col("id"), explode(col("hs")).as("g"))
    t("inv explode+count")(inv.count())
    val dfc = inv.groupBy(col("g")).agg(count(lit(1)).as("c"))
    t("df count")(dfc.count())
    val invR = inv.join(dfc.filter(col("c").between(2, 10)).select(col("g")), Seq("g"))
    t("rare filter join")(invR.count())
    val pairs = invR.select(col("g"), col("id").as("a_id"))
      .join(invR.select(col("g"), col("id").as("b_id")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared_rare"))
    t("candidate self-join+agg")(pairs.count())
    t("full operator")(graft.operators.Dedup
      .ngramJaccardPairsBlockedFromSigs(sigs, threshold = 0.3, dfCap = 10).count())
    t("full operator again")(graft.operators.Dedup
      .ngramJaccardPairsBlockedFromSigs(sigs, threshold = 0.3, dfCap = 10).count())
    spark.stop()
  }
}
