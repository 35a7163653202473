package graft.tools
import graft.tools.ProbePerf.t

/** 3 reps of the four headline dedup queries at sf0.1 in one JVM —
  * the A/B harness for shingle-pipeline changes (±20% single-run noise
  * makes single measurements useless). */
object ProbeDedupQuartet {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-quartet").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val dir = "/root/testdata/sf0.1"
    val names = Seq("dedup_minhash", "dedup_ngram_jaccard",
      "dedup_ngram_blocked", "dedup_clusters")
    names.foreach(n => qs(n)(spark, dir).count()) // warm codegen/IO
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      names.foreach { n => t(s"$n#$rep")(qs(n)(spark, dir).count()) }
      println(f"QUARTET#$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
