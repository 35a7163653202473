package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage attribution for the NATIVE substring-window shape
  * (SubstrWindowKeys; round 13): reps aggregate / keyed-shuffle branch /
  * full entry. Usage: runMain graft.tools.ProbeSubstr2 [sfDir] */
object ProbeSubstr2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf1"
    val spark = graft.GraftSession.builder("32").appName("probe-substr2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = 16
    val MersenneP = (1L << 31) - 1

    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val raw0 = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text").as("__text"))
    val raw = raw0.repartition()

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val reps = timeIt("reps-agg") {
        val r = raw0
          .select(col("doc_id"),
            md5(to_binary(col("__text"), lit("utf-8"))).as("g"))
          .groupBy(col("g"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_g"))
          .select(col("doc_id"), col("n_g"))
          .persist()
        r.count(); r
      }
      val weighted = raw.join(reps, "doc_id")
      val keyed = weighted.select(col("doc_id"), col("n_g"),
        graft.functions.SubstrWindowKeys
          .substrWindowKeys(lower(col("__text")), w, MersenneP).as("ks"))
      timeIt("native-keys-cpu") {
        keyed.select(col("doc_id"), explode(col("ks")).as("k"))
          .agg(max(col("k")), count(lit(1))).collect()
      }
      timeIt("keyed-shuffle-survpos") {
        val PosBits = 24
        keyed
          .select(col("n_g"), shiftleft(col("doc_id"), PosBits).as("__hi"),
            posexplode(col("ks")))
          .select(col("n_g"), (col("__hi") + col("pos")).as("p"), col("col").as("k"))
          .groupBy(col("k"))
          .agg(min(col("p")).as("mn"), max(col("p")).as("mx"),
            max(col("n_g")).as("mg"), collect_list(col("p")).as("ps"))
          .filter(shiftright(col("mn"), PosBits) =!=
            shiftright(col("mx"), PosBits) || col("mg") >= 2)
          .select(explode(col("ps")).as("p"))
          .select(shiftright(col("p"), PosBits).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)))
          .queryExecution.toRdd.count()
      }
      timeIt("full-entry") {
        graft.operators.Dedup.substringDupWindows(
          graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet"),
          "doc_id", "text", w, replicaGate = Some(true))
          .queryExecution.toRdd.count()
      }
      reps.unpersist()
      graft.operators.Dedup.releaseIntermediates()
    }
    spark.stop()
  }
}
