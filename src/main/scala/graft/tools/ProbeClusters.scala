package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
object ProbeClusters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    val t0 = System.nanoTime()
    val n = Dedup.clusters(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)).count()
    println(f"PERF clusters ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    spark.stop()
  }
}
