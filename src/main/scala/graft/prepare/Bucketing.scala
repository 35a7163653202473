package graft.prepare

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * Two tables bucketed into the same number of buckets on the join key
  * sort-merge-join with ZERO exchange: each task reads bucket i of both
  * sides. At 100 TB this converts every recurring fact-fact join on a
  * stable key (orders-lineitem, events-sessions) from a full dual shuffle
  * into a local merge — the single biggest recurring-shuffle eliminator
  * available to a lakehouse layout, and the reason prepare-phase layout
  * decisions matter more than per-query tuning. `sortBy` additionally
  * removes the per-task sort when Spark reads one file per bucket.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table registered in the
    * session catalog. Idempotent per session. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
                    key: String, numBuckets: Int, path: String): Unit = {
    if (spark.catalog.tableExists(table)) return
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .option("compression", "zstd")
      .saveAsTable(table)
  }

  /** Shuffle-free equi-join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
