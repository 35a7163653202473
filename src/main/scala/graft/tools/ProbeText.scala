package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: component timing for the text-scoring entries (round 12 —
  * after the toRdd protocol fix these became the largest absolute
  * entries at sf10; attribute the per-doc cost).
  * Usage: runMain graft.tools.ProbeText [sfDir] */
object ProbeText {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf1"
    val spark = graft.GraftSession.builder("32").appName("probe-text").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysis

    val docs = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def timeIt(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.count()
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    timeIt("scan-only")(docs.select(col("doc_id"), length(col("text")).as("l")))
    timeIt("lower")(docs.select(length(lower(col("text"))).as("l")))
    timeIt("tokens-size")(docs.select(TextAnalysis.tokenCount(col("text")).as("n")))
    timeIt("one-occurrence")(docs.select(
      ((length(col("text")) - length(replace(col("text"), lit(" the "), lit("")))) / 5)
        .as("c")))
    timeIt("stop7")(docs.select(
      Seq("the", "and", "of", "to", "in", "is", "that")
        .map(w => ((length(col("text")) -
          length(replace(col("text"), lit(s" $w "), lit("")))) / (w.length + 2)))
        .reduce(_ + _).as("c")))
    timeIt("punct-regex")(docs.select(
      length(regexp_replace(col("text"), "[^\\p{Punct}]", "")).as("p")))
    timeIt("punct-count")(docs.select(
      regexp_count(col("text"), lit("[\\p{Punct}]")).as("p")))
    timeIt("alpha-rlike")(docs.select(size(filter(
      TextAnalysis.tokens(col("text")), w => w.rlike("[A-Za-z]"))).as("a")))
    timeIt("alpha-count")(docs.select(size(filter(
      TextAnalysis.tokens(col("text")),
      w => regexp_count(w, lit("[A-Za-z]")) > 0)).as("a")))
    val letters = ('a' to 'z').mkString + ('A' to 'Z').mkString
    timeIt("alpha-translate")(docs.select(size(filter(
      TextAnalysis.tokens(col("text")),
      w => length(translate(w, letters, "")) < length(w))).as("a")))
    timeIt("quality-full")(docs.select(
      round(TextAnalysis.qualityScore(col("text")), 4).as("q")))
    timeIt("quality-staged")(
      TextAnalysis.qualityScored(docs, "doc_id", "text")
        .select(col("doc_id"), round(col("quality"), 4).as("quality")))
    timeIt("gopher-full")(
      TextAnalysis.gopherSignals(docs, "doc_id", "text"))
    spark.stop()
  }
}
