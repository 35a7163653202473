package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object ProbeCosine {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PERF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val q = e.filter(col("vec_id") < 100) // 100 x 2000 = 200k pairs
    t("warm")(e.count())
    val pairs = e.crossJoin(broadcast(q.select(col("vec_id").as("qid"), col("embedding").as("qv"))))
    t("native_1")(pairs.select(avg(Similarity.cosine(col("embedding"), col("qv")))).collect())
    t("native_2")(pairs.select(avg(Similarity.cosine(col("embedding"), col("qv")))).collect())
    t("composable_1")(pairs.select(avg(Similarity.cosineComposable(col("embedding"), col("qv")))).collect())
    t("composable_2")(pairs.select(avg(Similarity.cosineComposable(col("embedding"), col("qv")))).collect())
    spark.stop()
  }
}
