package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: per-stage timing attribution for the substring-window
  * dedup (mirrors Dedup.substringDupWindows' stages so the residual vs
  * the ≤1.0 s sf0.1 bar can be attributed — see PLANS.md).
  * Usage: runMain graft.tools.ProbeSubstr [sfDir] */
object ProbeSubstr {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("32").appName("probe-substr").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Staging.bound
    import graft.operators.TextAnalysis
    val w = 16
    val MersenneP = (1L << 31) - 1

    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val raw = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text").as("__text")).repartition()

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      timeIt("replica-gate-agg") {
        raw.agg(count(lit(1)).cast(DoubleType),
          count_distinct(md5(to_binary(col("__text"), lit("utf-8"))))
            .cast(DoubleType)).collect()
      }
      timeIt("replica-gate-xxh") {
        raw.agg(count(lit(1)).cast(DoubleType),
          count_distinct(xxhash64(col("__text"))).cast(DoubleType)).collect()
      }
      timeIt("replica-gate-xxh-sample4") {
        raw.filter(pmod(xxhash64(col("doc_id")), lit(4)) === 0)
          .agg(count(lit(1)).cast(DoubleType),
            count_distinct(xxhash64(col("__text"))).cast(DoubleType)).collect()
      }
      val toks = raw
        .select(col("doc_id"), TextAnalysis.tokens(lower(col("__text"))).as("t"),
          lit(1L).as("n_g"))
        .filter(size(col("t")) >= w).persist()
      timeIt("tokenize+persist")(toks.count())
      val o1 = (w - 1) / 3; val o2 = 2 * (w - 1) / 3; val o3 = w - 1
      val keyed = toks
        .select(col("doc_id"), col("n_g"), bound(col("t"))(t =>
          transform(t, x => pmod(xxhash64(x), lit(MersenneP)))).as("hs"))
        .select(col("doc_id"), col("n_g"), posexplode(bound(col("hs"))(hs =>
          transform(sequence(lit(1), size(hs) - lit(w - 1)), i =>
            element_at(hs, i) * lit(1000003L) +
              element_at(hs, i + o1) * lit(524287L) +
              element_at(hs, i + o2) * lit(8191L) +
              element_at(hs, i + o3) * lit(131L)))))
        .withColumnRenamed("col", "k")
      timeIt("key-cpu-only")(keyed.agg(max(col("k")), count(lit(1))).collect())
      timeIt("hashagg-minmax") {
        keyed.groupBy(col("k"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
            max(col("n_g")).as("mg"))
          .filter(col("mn") =!= col("mx") || col("mg") >= 2).count()
      }
      timeIt("objagg-collectlist") {
        keyed.groupBy(col("k"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
            max(col("n_g")).as("mg"),
            collect_list(struct(col("doc_id"), col("pos"))).as("ps"))
          .filter(col("mn") =!= col("mx") || col("mg") >= 2)
          .select(explode(col("ps")).as("s")).count()
      }
      toks.unpersist(blocking = true)
    }
    spark.stop()
  }
}
