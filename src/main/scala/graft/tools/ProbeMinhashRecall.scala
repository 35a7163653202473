package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Does banded MinHash (32 hashes, 2 rows/band) find EXACTLY the pairs
  * with exact shingle-jaccard >= 0.5 on the test corpora? (If yes the
  * dedup_minhash entry is oracle-able by the exact-jaccard SQL.) */
object ProbeMinhashRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-mh").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = graft.sources.ParquetNanos.read(spark, s"/root/testdata/$sf/documents.parquet")
      val mh = Dedup.minhashPairs(docs, "doc_id", "text", 32, 2, 0.5)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL $sf minhash=${mh.size} exact=${exact.size} " +
        s"missed=${(exact -- mh).size} extra=${(mh -- exact).size}")
    }
    spark.stop()
  }
}
