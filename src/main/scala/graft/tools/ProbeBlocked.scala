package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.Staging.bound

/** Stage-by-stage timing of ngramJaccardPairsBlocked at sf0.1. */
object ProbeBlocked {
  import ProbePerf.t
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-blocked").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    t("warmup")(docs.count())
    val sh = Dedup.shingleDf(docs, "doc_id", "text", 3)
    val hs = sh.select(col("id"),
      bound(col("sh"))(s => transform(s, x => xxhash64(x))).as("hs"))
    t("hs_count")(hs.count())
    val inv = hs.select(col("id"), explode(col("hs")).as("g"))
    t("inv_count")(inv.count())
    val rare = inv.groupBy(col("g"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 30))
    t("rare_count")(rare.count())
    val candidates = rare
      .select(explode(flatten(transform(col("ids"), a =>
        filter(transform(col("ids"), b => struct(a.as("a"), b.as("b"))),
          p => p.getField("a") < p.getField("b"))))).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
    t("cand_raw_count")(candidates.count())
    val cd = candidates.dropDuplicates("a_id", "b_id")
    t("cand_dedup_count")(cd.count())
    val aSh = hs.select(col("id").as("a_id"), col("hs").as("a_sh"))
    val bSh = hs.select(col("id").as("b_id"), col("hs").as("b_sh"))
    val joined = cd.join(aSh, "a_id").join(bSh, "b_id")
    t("verify_join_count")(joined.count())
    val out = joined
      .withColumn("jaccard", Dedup.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= 0.3)
    t("verify_full")(out.count())
    t("e2e_again")(Dedup.ngramJaccardPairsBlocked(docs, "doc_id", "text", 3, 0.3, 30).count())
    // ---- replicate the Bench session state step by step ----
    t("prepared_engine")(graft.SparkEntry.preparedEngine(spark, "/root/testdata/sf0.1"))
    t("e2e_after_prepare")(Dedup.ngramJaccardPairsBlocked(docs, "doc_id", "text", 3, 0.3, 30).count())
    val qs = graft.SparkEntry.queries
    t("minhash_entry")(qs("dedup_minhash")(spark, "/root/testdata/sf0.1").count())
    t("ngram_entry")(qs("dedup_ngram_jaccard")(spark, "/root/testdata/sf0.1").count())
    t("e2e_after_dedups")(qs("dedup_ngram_blocked")(spark, "/root/testdata/sf0.1").count())
    t("clusters_entry")(qs("dedup_clusters")(spark, "/root/testdata/sf0.1").count())
    t("e2e_after_clusters")(qs("dedup_ngram_blocked")(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
