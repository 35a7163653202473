package graft.tools
/** Timing for prefixJaccardPairs at sf0.1. */
object ProbePrefixPerf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-pp").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    docs.count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.7).count()
      println(f"run$i ${(System.nanoTime - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
