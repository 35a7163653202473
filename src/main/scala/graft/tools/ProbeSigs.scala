package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: native ShingleSigs / WordCount / BpeCount vs their
  * composable HOF formulations, same session, full-plan toRdd timing. */
object ProbeSigs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder("32").appName("probe-sigs").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")

    def timeIt(label: String)(mk: => DataFrame): Unit = {
      mk.queryExecution.toRdd.count() // warm
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${times.min}%.3f " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }

    timeIt("sigs-composable")(
      graft.operators.Dedup.signaturesComposable(docs, "doc_id", "text", 3))
    timeIt("sigs-native")(
      graft.operators.Dedup.signatures(docs, "doc_id", "text", 3))
    timeIt("tokcnt-composable")(docs.select(
      graft.operators.TextAnalysis.tokenCountComposable(col("text")).as("n"),
      graft.operators.TextAnalysis.tokenCountBpeComposable(col("text")).as("b")))
    timeIt("tokcnt-native")(docs.select(
      graft.operators.TextAnalysis.tokenCount(col("text")).as("n"),
      graft.operators.TextAnalysis.tokenCountBpe(col("text")).as("b")))
    spark.stop()
  }
}
