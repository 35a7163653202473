package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of dedup_ngram_blocked at a given
  * sf dir (default sf0.1) to localize warm-pass cost. Not part of any
  * gate — a measurement harness like [[Probe]]. */
object ProbeBlocked {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.create("probe-blocked")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PB $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val entry = graft.SparkEntry.queries("dedup_ngram_blocked")
    // warmup + 3 timed passes of the full entry
    time("full(cold)")(entry(spark, dir).collect().length)
    (1 to 3).foreach(i => time(s"full(warm$i)")(entry(spark, dir).collect().length))

    // now the pieces, on the same written artifacts
    val base = s"target/prepared/pipeline/v3/${dir.replaceAll("[^A-Za-z0-9.]+", "_")}"
    val sigs = spark.read.parquet(s"$base/signatures")
    val dfc = spark.read.parquet(s"$base/shingle_df")
    time("sigs.count")(sigs.count()); time("dfc.count")(dfc.count())
    val hs = sigs.select(col("id"), col("hs"))
    val inv = hs.select(col("id"), explode(col("hs")).as("g"))
    val invR = inv.join(dfc.filter(col("c").between(2, 10)).select(col("g")), Seq("g"))
    time("invR.count")(invR.count())
    val pairs = invR.select(col("g"), col("id").as("a_id"))
      .join(invR.select(col("g"), col("id").as("b_id")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared_rare"))
    time("pairs.count")(pairs.count())
    time("pairs.count2")(pairs.count())
    val stops = inv.join(dfc.filter(col("c") > 10).select(col("g")), Seq("g"))
      .groupBy(col("id")).agg(collect_list(col("g")).as("stop"))
    time("stops.count")(stops.count())
    val prof = hs.select(col("id"), size(col("hs")).as("n_sh"))
      .join(stops, Seq("id"), "left")
    time("prof.count")(prof.count())
    val a = prof.select(col("id").as("a_id"), col("n_sh").as("a_n"), col("stop").as("a_stop"))
    val b = prof.select(col("id").as("b_id"), col("n_sh").as("b_n"), col("stop").as("b_stop"))
    val full = pairs.join(a, "a_id").join(b, "b_id")
      .withColumn("shared", col("shared_rare") +
        size(array_intersect(coalesce(col("a_stop"), array()), coalesce(col("b_stop"), array()))))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("a_n") + col("b_n") - col("shared")).cast("double"))
      .filter(col("jaccard") >= 0.3)
    time("full-pieces.count")(full.count())
    time("full-pieces.count2")(full.count())
    spark.stop()
  }
}
