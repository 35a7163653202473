package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProbePerf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PERF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    t("warmup")(docs.count())
    val sh = Dedup.shingleDf(docs, "doc_id", "text", 3)
    t("shingleDf_explode")(sh.select(explode(col("sh"))).count())
    t("full_minhash")(Dedup.minhashPairs(docs, "doc_id", "text", 32, 2, 0.5).count())
    t("full_ngram_blocked")(Dedup.ngramJaccardPairsBlocked(docs, "doc_id", "text", 3, 0.3, 50).count())
    t("full_simhash")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    t("full_ngram_exact")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3).count())
    spark.stop()
  }
}
