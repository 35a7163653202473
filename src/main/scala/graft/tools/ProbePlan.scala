package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.shingleDf(docs, "doc_id", "text", 3)
    println("=== shingleDf optimized ===")
    println(sh.queryExecution.optimizedPlan.treeString.take(3000))
    println("=== explode(sh) optimized ===")
    println(sh.select(explode(col("sh"))).queryExecution.optimizedPlan.treeString.take(3000))
    spark.stop()
  }
}
