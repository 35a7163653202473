package graft.prepare

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.AggTableDef
import graft.schema.EventTime

/** The prepare phase: raw events -> query-optimized layout.
  *
  * The reference does this with a 6-worker multiprocessing pool, per-worker
  * temp partition files and a manual merge step (prepare_optimized.py:
  * 399-467, 347-397). In Spark the whole thing is ONE declarative job:
  * `read -> withColumns -> write.partitionBy(...)` — task parallelism over
  * file splits replaces the pool, and the output committer replaces the
  * merge (SURVEY §3.2). At 100 TB this is exactly the shape you want: no
  * shuffle at all (partitionBy shreds within each task), linear scaling
  * with executors, and the layout gives every later query partition
  * pruning for free.
  *
  * Layout written under `outRoot`:
  * {{{
  *   events/ event_type=<t>/day=<d>/part-*.parquet   (ZSTD, with stats)
  *   aggregates/<name>/part-*.parquet                 (one per AggTableDef)
  *   stats/part-*.parquet                             (key/value dataset stats)
  * }}}
  * mirroring the reference's `type=<t>/day=<d>.parquet` + `aggregates/` +
  * `stats.parquet` (README.md:261-276).
  */
object Prepare {

  /** Rollups materialized by default for the harness `events` table —
    * the analogues of the reference's five aggregate tables
    * (prepare_optimized.py:111-266, P5-P10): same shapes, our schema. */
  def defaultAggregates(typeCol: String = "event_type",
                        valueCol: String = "value"): Seq[AggTableDef] = Seq(
    // P5 daily_revenue: per-day money (reference filters impressions;
    // here the unfiltered (type, day) cube subsumes it — see P8)
    AggTableDef("agg_type_day_value", "events", Nil,
      keys = Seq(typeCol, "day"), measures = Seq(valueCol)),
    // P9 advertiser_type_counts analogue: per (user, type) activity cube
    AggTableDef("agg_user_type", "events", Nil,
      keys = Seq("user_id", typeCol), measures = Seq(valueCol)),
    // P10 minute_revenue analogue: per (day, minute) value rollup
    AggTableDef("agg_day_minute_value", "events", Nil,
      keys = Seq("day", "minute"), measures = Seq(valueCol)))

  /** Run the full prepare job. `events` is the raw table (CSV or parquet
    * already loaded); derived time columns are added here. */
  def run(spark: SparkSession, events: DataFrame, outRoot: String,
          aggregates: Seq[AggTableDef] = defaultAggregates(),
          partitionCols: Seq[String] = Seq("event_type", "day")): Unit = {
    val derived = EventTime.withDerived(events)

    // 1. Partitioned fact table. ZSTD + row-group stats, like the
    //    reference's writer settings (prepare_optimized.py:88-93).
    derived.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .option("compression", "zstd")
      .parquet(s"$outRoot/events")

    // 2. Rollup tables. Computed from the freshly written partitioned
    //    layout (cheaper re-read: columnar + pruned) — each is one
    //    partial-aggregate shuffle, output is tiny.
    val fact = EventTime.withDerived(spark.read.parquet(s"$outRoot/events"))
    aggregates.foreach { d =>
      d.build(fact).write
        .mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .parquet(s"$outRoot/aggregates/${d.name}")
    }

    // 3. Dataset statistics, key/value (reference: prepare_optimized.py:
    //    279-332). One pass, all stats in a single aggregation.
    val typeCol = partitionCols.head
    val statsRow = fact.agg(
      count(lit(1)).as("total_rows"),
      min(col("day")).cast(StringType).as("min_day"),
      max(col("day")).cast(StringType).as("max_day"),
      approx_count_distinct(col("user_id")).as("approx_users")).collect()(0)
    val perType = fact.groupBy(col(typeCol)).count().collect()
      .map(r => (s"rows_${r.get(0)}", r.getLong(1).toString))
    import spark.implicits._
    val kv = Seq(
      ("total_rows", statsRow.getLong(0).toString),
      ("min_day", statsRow.getString(1)),
      ("max_day", statsRow.getString(2)),
      ("approx_users", statsRow.getLong(3).toString)) ++ perType
    kv.toDF("key", "value").coalesce(1).write
      .mode(SaveMode.Overwrite).parquet(s"$outRoot/stats")
  }
}
