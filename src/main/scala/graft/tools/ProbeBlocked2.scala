package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: plan + AQE-final shape of the blocked-jaccard candidate
  * stage, and variant timings. */
object ProbeBlocked2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.create("probe-blocked2")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PB $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val base = s"target/prepared/pipeline/v3/${dir.replaceAll("[^A-Za-z0-9.]+", "_")}"
    val sigs = spark.read.parquet(s"$base/signatures").persist()
    val dfc = spark.read.parquet(s"$base/shingle_df").persist()
    sigs.count(); dfc.count()
    val hs = sigs.select(col("id"), col("hs"))
    val inv = hs.select(col("id"), explode(col("hs")).as("g"))
    val invR = inv.join(dfc.filter(col("c").between(2, 10)).select(col("g")), Seq("g"))
    val pairs = invR.select(col("g"), col("id").as("a_id"))
      .join(invR.select(col("g"), col("id").as("b_id")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared_rare"))
    time("pairs.warmup")(pairs.count())
    println("=== pairs plan (AQE final) ===")
    println(pairs.queryExecution.executedPlan.toString.take(6000))
    (1 to 3).foreach(i => time(s"pairs$i")(pairs.count()))

    // variant: collect_list per g, in-group i<j expansion of SORTED ids
    val grouped = invR.groupBy(col("g")).agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as a_id, y as b_id))))")).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared_rare"))
    time("grouped.warmup")(grouped.count())
    (1 to 3).foreach(i => time(s"grouped$i")(grouped.count()))

    // variant: shuffle-hash preferred
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    time("pairs-shj.warmup")(pairs.count())
    (1 to 3).foreach(i => time(s"pairs-shj$i")(pairs.count()))
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.stop()
  }
}
