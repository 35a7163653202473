package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Emits `explain("formatted")` for the plans PLANS.md documents.
  * Run: sbt 'runMain graft.tools.ProbeExplain' (sf0.01). */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").appName("probe-explain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"

    def show(name: String, df: DataFrame): Unit = {
      println(s"\n######## $name ########")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    val eng = graft.SparkEntry.preparedEngine(spark, sfDir, cacheResults = false)

    show("routed_rollup (MV-routed aggregate; never touches the fact table)",
      eng.executeJson(
        """{"select":["event_type",{"SUM":"value"},{"COUNT":"*"}],
           "from":"events","group_by":["event_type"]}"""))

    show("partition_pruned_scan (filters on partition cols -> PartitionFilters)",
      eng.executeJson(
        """{"select":["event_id","value"],"from":"events",
           "where":[{"col":"event_type","op":"eq","val":"purchase"},
                    {"col":"day","op":"eq","val":"2024-01-15"}]}"""))

    val li = graft.sources.ParquetNanos.read(spark, s"$sfDir/lineitem.parquet")
    val ord = graft.sources.ParquetNanos.read(spark, s"$sfDir/orders.parquet")
    show("broadcast_dim_join (small side broadcast, no shuffle of the fact)",
      li.join(broadcast(ord.filter(col("o_totalprice") > 400000.0)),
          li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q")))

    show("topk (ORDER BY + LIMIT -> TakeOrderedAndProject, no global sort)",
      graft.sources.ParquetNanos.read(spark, s"$sfDir/events.parquet")
        .orderBy(col("value").desc).limit(10))

    spark.stop()
  }
}
