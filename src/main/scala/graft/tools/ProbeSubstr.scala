package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: stage timing of dedup_substrings at a given sf dir. */
object ProbeSubstr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.create("probe-substr")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PS $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val entry = graft.SparkEntry.queries("dedup_substrings")
    time("full(cold)")(entry(spark, dir).collect().length)
    (1 to 3).foreach(i => time(s"full(warm$i)")(entry(spark, dir).collect().length))

    // pieces
    import graft.functions.Staging.bound
    val docs = graft.sources.ParquetNanos.read(spark, s"$dir/documents.parquet")
    val w = 16
    val MersenneP = (1L << 31) - 1
    val toks = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(lower(col("text"))).as("t"))
      .filter(size(col("t")) >= w)
    val ex = toks.select(col("doc_id"),
        posexplode(bound(col("t"))(t =>
          transform(t, x => pmod(xxhash64(x), lit(MersenneP))))))
      .withColumnRenamed("col", "h")
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wSum = wOrd.rowsBetween(Window.currentRow, w - 1)
    val keyedPlan = ex
      .withColumn("ws", sum(col("h")).over(wSum))
      .withColumn("le", lead(col("h"), w - 1).over(wOrd))
      .filter(col("le").isNotNull)
      .select(col("doc_id"), col("pos"),
        (col("ws") * lit(1000003L) + col("h") * lit(131L) + col("le")).as("k"))
    time("keyed.count(no-ckpt)")(keyedPlan.count())
    time("keyed.count2(no-ckpt)")(keyedPlan.count())
    val keyed = time("localCheckpoint")(keyedPlan.localCheckpoint(false))
    val hot = keyed.groupBy(col("k"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("k"))
    time("hot.count")(hot.count())
    val surv = keyed.join(hot, Seq("k")).select(col("doc_id"), col("pos"))
    time("surv.count")(surv.count())
    val survPos = surv.groupBy(col("doc_id")).agg(collect_list(col("pos")).as("ps"))
    time("survPos.count")(survPos.count())
    val fin = docs.select(col("doc_id"), col("text").as("__text"))
      .join(survPos, Seq("doc_id"))
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(lower(col("__text"))).as("t"), col("ps"))
      .select(col("doc_id"), col("t"), explode(col("ps")).as("pos"))
      .select(col("doc_id"),
        md5(to_binary(concat_ws(" ", slice(col("t"), col("pos") + 1, lit(w))),
          lit("utf-8"))).as("fp"))
      .groupBy(col("fp")).agg(
        min(col("doc_id")).as("keep_doc"),
        count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
    time("final.count")(fin.count())
    spark.stop()
  }
}
