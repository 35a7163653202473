package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: same-session timing of the round-12 staged funnel
  * (3 filter/join stages) vs the round-13 fused one-shuffle form —
  * cross-run sf10 suite numbers drift with box state, so the shape
  * claim is pinned by ONE session measuring both. */
object ProbeFunnel {
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.schema.DirCatalog(dir).table(s, "events")

  private def staged(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val sgn = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val clk = e.filter(col("event_type") === "click")
      .join(sgn, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val pur = e.filter(col("event_type") === "purchase")
      .join(clk, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    sgn.agg(count(lit(1)).as("n_signup"))
      .crossJoin(broadcast(clk.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(pur.agg(count(lit(1)).as("n_purchase"))))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/target/sf10"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder("32").appName("probe-funnel").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, build: () => DataFrame): Unit = {
      build().queryExecution.toRdd.count()
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        build().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-8s min=${ts.min}%.3f passes=" +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    time("staged", () => staged(spark, dir))
    time("fused", () => graft.SparkEntry.queries("ext_funnel")(spark, dir))
    time("staged", () => staged(spark, dir))
    time("fused", () => graft.SparkEntry.queries("ext_funnel")(spark, dir))
    spark.stop()
  }
}
