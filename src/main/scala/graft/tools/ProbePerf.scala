package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
/** Stage timings of the dedup pipelines at sf0.1 (staged operators). */
object ProbePerf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PERF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    t("warmup")(docs.count())
    val sh = Dedup.shingleDf(docs, "doc_id", "text", 3)
    t("shingleDf_explode")(sh.select(explode(col("sh"))).count())
    t("full_minhash")(Dedup.minhashPairs(docs, "doc_id", "text", 32, 2, 0.5).count())
    t("full_ngram_blocked")(Dedup.ngramJaccardPairsBlocked(docs, "doc_id", "text", 3, 0.3, 50).count())
    t("full_simhash")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    // blocked internals
    import graft.functions.Staging.bound
    val hs = sh.select(col("id"), bound(col("sh"))(s => transform(s, x => xxhash64(x))).as("hs"))
    val inv = hs.select(col("id"), explode(col("hs")).as("g"))
    t("inv")(inv.count())
    val rare = inv.groupBy(col("g")).agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 50))
    t("rare")(rare.count())
    val cand = rare.select(explode(flatten(transform(col("ids"), a =>
        filter(transform(col("ids"), b => struct(a.as("a"), b.as("b"))),
          p => p.getField("a") < p.getField("b"))))).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
    t("cand_raw")(println("cand_raw_rows=" + cand.count()))
    t("cand_distinct")(println("cand_rows=" + cand.dropDuplicates("a_id","b_id").count()))
    spark.stop()
  }
}
