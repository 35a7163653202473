package graft.tools

import org.apache.spark.sql.functions._

/** Scale-ladder evidence for the Bloom decontamination path: runs the
  * exact membership join (`text_decontaminate`) and the Bloom-prefiltered
  * variant (`text_decontaminate_bloom`) on a given fixture, recording
  * wall time (toRdd protocol), output-row parity, and the state sizes
  * that justify the Bloom shape at 100 TB — benchmark distinct n-grams,
  * corpus n-gram volume, Bloom filter bytes (~1.2 B/n-gram at 1% fpp)
  * vs the exact path's 8 B/n-gram hashed relation, and the corpus rows
  * surviving the codegen pre-filter (matches + ~fpp of the corpus).
  *
  * With a third argument `benchPct`, the benchmark slice becomes
  * `doc_id % 100 < benchPct` instead of the entries' fixed 100-doc slice
  * and both paths are timed directly from [[graft.operators.Dedup]] —
  * the LARGE-benchmark regime (a big eval-suite n-gram set) where the
  * Bloom's bounded state is the difference between a broadcastable
  * membership test and a corpus-wide shuffle.
  *
  * Usage: runMain graft.tools.ProbeBloomLadder <sfDir> [label] [benchPct]
  */
object ProbeBloomLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val label = if (args.length > 1) args(1) else new java.io.File(sfDir).getName
    val benchPct = if (args.length > 2) Some(args(2).toInt) else None
    val spark = graft.GraftSession.builder("32")
      .appName("probe-bloom-ladder").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
    val benchPred = benchPct match {
      case Some(p) => pmod(col("doc_id"), lit(100)) < p
      case None => col("doc_id") < 100
    }
    val corpusInv = d.filter(!benchPred)
      .select(col("doc_id").as("id"),
        graft.functions.ShingleSigs.shingleSigs(lower(col("text")), 8).as("hs"))
      .select(col("id"), explode(col("hs")).as("g"))
    val benchShingles = d.filter(benchPred)
      .select(graft.functions.ShingleSigs
        .shingleSigs(lower(col("text")), 8).as("hs"))
      .select(explode(col("hs")).as("g")).distinct()

    val nBench = benchShingles.count()
    val nCorpus = corpusInv.count()
    val bloom = benchShingles.stat.bloomFilter("g", math.max(1L, nBench), 0.01)
    val bloomBytes = bloom.bitSize() / 8
    val survivors = corpusInv.filter(graft.functions.BloomMightContainLong
      .mightContainLong(col("g"), bloom)).count()

    def time(build: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val warmRows = build().queryExecution.toRdd.count()
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        build().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (best, warmRows)
    }
    val (exactB, bloomB): (() => org.apache.spark.sql.DataFrame,
                           () => org.apache.spark.sql.DataFrame) =
      benchPct match {
        case None =>
          (() => graft.SparkEntry.queries("text_decontaminate")(spark, sfDir),
           () => graft.SparkEntry.queries("text_decontaminate_bloom")(spark, sfDir))
        case Some(_) =>
          (() => graft.operators.Dedup.contaminationCounts(
             d.filter(!benchPred), "doc_id", "text",
             d.filter(benchPred), "doc_id", "text", n = 8),
           () => graft.operators.Dedup.contaminationCountsBloom(
             d.filter(!benchPred), "doc_id", "text",
             d.filter(benchPred), "doc_id", "text", n = 8))
      }
    val (tExact, rowsExact) = time(exactB)
    val (tBloom, rowsBloom) = time(bloomB)
    require(rowsExact == rowsBloom,
      s"result divergence: exact=$rowsExact bloom=$rowsBloom")

    val json = "{" +
      s""""metric":"bloom_ladder","label":"$label","sf":"$sfDir",""" +
      s""""bench_ngrams":$nBench,"corpus_ngrams":$nCorpus,""" +
      s""""bloom_bytes":$bloomBytes,""" +
      s""""exact_relation_bytes":${nBench * 8},""" +
      s""""prefilter_survivors":$survivors,""" +
      f""""survivor_frac":${survivors.toDouble / math.max(1L, nCorpus)}%.5f,""" +
      f""""sec_exact":$tExact%.3f,"sec_bloom":$tBloom%.3f,""" +
      s""""rows":$rowsExact}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/bloom_ladder_$label.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
