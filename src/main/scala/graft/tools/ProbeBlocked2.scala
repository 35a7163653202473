package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup

/** Stage timings for blocked-jaccard formulations over the persisted
  * signature table at sf0.1 (3 reps each; single runs are ±20%). */
object ProbeBlocked2 {
  import ProbePerf.t
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-blocked2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sigs_materialize")(sigs.count())
    val hs = sigs.select(col("id"), col("hs"))
    val inv = hs.select(col("id"), explode(col("hs")).as("g"))
    t("inv_count")(inv.count())

    for (rep <- 1 to 3) {
      // window formulation
      val inv2w = inv
        .withColumn("c", count(lit(1)).over(Window.partitionBy(col("g"))))
        .filter(col("c").between(2, 30))
      t(s"w_inv2#$rep")(inv2w.count())
      val candW = inv2w.groupBy(col("g")).agg(collect_list(col("id")).as("ids"))
        .select(explode(flatten(transform(col("ids"), a =>
          filter(transform(col("ids"), b => struct(a.as("a"), b.as("b"))),
            p => p.getField("a") < p.getField("b"))))).as("p"))
        .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
        .dropDuplicates("a_id", "b_id")
      t(s"w_cand#$rep")(candW.count())

      // agg+join formulation
      val dfc = inv.groupBy(col("g")).agg(count(lit(1)).as("c"))
        .filter(col("c").between(2, 30))
      val inv2j = inv.join(dfc.select(col("g")), Seq("g"))
      t(s"j_inv2#$rep")(inv2j.count())
      val candJ = inv2j.select(col("g"), col("id").as("a_id"))
        .join(inv2j.select(col("g"), col("id").as("b_id")), Seq("g"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .dropDuplicates("a_id", "b_id")
      t(s"j_cand#$rep")(candJ.count())

      // agg-once + bounded-collect formulation (no join-back, no window)
      val candA = inv.groupBy(col("g"))
        .agg(collect_list(col("id")).as("ids"), count(lit(1)).as("c"))
        .filter(col("c").between(2, 30))
        .select(explode(flatten(transform(col("ids"), a =>
          filter(transform(col("ids"), b => struct(a.as("a"), b.as("b"))),
            p => p.getField("a") < p.getField("b"))))).as("p"))
        .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
        .dropDuplicates("a_id", "b_id")
      t(s"a_cand#$rep")(candA.count())

      // verify join cost on top of the best candidate set
      val aSh = hs.select(col("id").as("a_id"), col("hs").as("a_sh"))
      val bSh = hs.select(col("id").as("b_id"), col("hs").as("b_sh"))
      val out = candJ.join(aSh, "a_id").join(bSh, "b_id")
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_sh"), col("b_sh"))).cast("double").as("inter"),
          (size(col("a_sh")) + size(col("b_sh"))).cast("double").as("tot"))
        .withColumn("jaccard",
          when(col("tot") - col("inter") > 0,
            col("inter") / (col("tot") - col("inter"))).otherwise(lit(0.0)))
        .filter(col("jaccard") >= 0.3)
      t(s"verify_on_j#$rep")(out.count())
    }
    spark.stop()
  }
}
