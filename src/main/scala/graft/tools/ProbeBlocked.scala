package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall-clock attribution of
  * Dedup.ngramJaccardPairsBlockedFromSigs at a given SF — which of
  * rep-collapse / inverted-index build / candidate self-join / profile
  * verify / replica expansion dominates the headline entry's time. */
object ProbeBlocked {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder("32").appName("probe-blocked").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
    // session-persisted signature table, like the entry's artifact
    val sigs = Dedup.signatures(docs, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.queryExecution.toRdd.count()
    val dfc = Dedup.shingleDocFreq(Dedup.repSignatures(sigs)._2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dfc.queryExecution.toRdd.count()
    Dedup.releaseIntermediates()

    def timeIt(label: String)(mk: => DataFrame): Unit = {
      mk.queryExecution.toRdd.count() // warm
      Dedup.releaseIntermediates()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Dedup.releaseIntermediates()
        dt
      }
      println(f"$label%-24s min=${times.min}%.3f " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }

    // full operator (what the bench times)
    timeIt("full") {
      Dedup.ngramJaccardPairsBlockedFromSigs(sigs, threshold = 0.3,
        dfCap = 10, docFreq = Some(dfc))
    }
    // stage A: rep collapse only (the two pooled persists materialized)
    timeIt("repSignatures") {
      val (rep, repSigs) = Dedup.repSignatures(sigs)
      rep.join(repSigs, "id").select(col("g"))
    }
    // stage B: rep + inverted index with df classes
    timeIt("invC") {
      val (_, repSigs) = Dedup.repSignatures(sigs)
      repSigs.select(col("id"), explode(col("hs")).as("g"))
        .join(dfc.filter(col("c") >= 2), Seq("g"))
        .select(col("id"), col("g"), col("c"))
    }
    // stage C: candidates (rare self-join + pair counts) on top of invC
    timeIt("pairs") {
      val (_, repSigs) = Dedup.repSignatures(sigs)
      val invC = graft.operators.Dedup.pooledPersist(
        repSigs.select(col("id"), explode(col("hs")).as("g"))
          .join(dfc.filter(col("c") >= 2), Seq("g"))
          .select(col("id"), col("g"), col("c")))
      val invR = invC.filter(col("c") <= 10).select(col("id"), col("g"))
      val p = invR.select(col("g"), col("id").as("a_id"))
        .join(invR.select(col("g"), col("id").as("b_id")).hint("shuffle_hash"),
          Seq("g"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("shared_rare"))
      p
    }
    spark.stop()
  }
}
