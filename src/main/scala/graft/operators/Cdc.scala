package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: changelog compaction (latest-per-key),
  * snapshot merge/upsert, and SCD type-2 dimension builds.
  *
  * These are the incremental-ingest primitives of a 100 TB pipeline: a
  * crawl or CDC feed lands as an append-only change log, and the engine
  * must fold it into the servable snapshot without reprocessing the
  * corpus. The reference engine has no incremental story (its prepare
  * phase re-reads the full CSV dump, reference `prepare_optimized.py`);
  * here compaction cost scales with the DELTA, and the merge is one
  * full-outer shuffle join on the key — never a corpus rewrite.
  *
  * Scale notes:
  *  - latestPerKey is a single window (one shuffle on the key). When the
  *    change log is huge and keys are hot, pre-aggregate with
  *    max_by/struct-max instead (same result, map-side partial) — see
  *    [[latestPerKeyAgg]].
  *  - mergeUpsert shuffles both sides on the key once; with a bucketed
  *    base table ([[graft.prepare.Bucketing]]) the base side's exchange
  *    disappears, which is how a 100 TB snapshot absorbs a daily delta
  *    without a full shuffle.
  */
object Cdc {

  /** Latest change per key: row_number over (key / orderCols desc), rn=1.
    * Ties broken by the LAST orderCol (pass an id). One shuffle. */
  def latestPerKey(changes: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Window-free formulation of [[latestPerKey]] for hot-key change logs:
    * lexicographic struct-MAX aggregates with map-side partials, so a key
    * with a million changes costs one combiner cell per task instead of a
    * million rows through one reducer. `payloadCols` are carried through
    * the struct. */
  def latestPerKeyAgg(changes: DataFrame, keyCols: Seq[String],
                      orderCols: Seq[Column],
                      payloadCols: Seq[String]): DataFrame = {
    val packed = struct(
      (orderCols.zipWithIndex.map { case (c, i) => c.as(s"o$i") } ++
        payloadCols.map(c => col(c).as(c))): _*)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__m"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Merge a compacted delta into a base snapshot (the MERGE INTO /
    * upsert statement, expressed relationally):
    *  - delta op == deleteOp  -> key dropped (even if absent from base);
    *  - delta present (other) -> delta's payload wins (update or insert);
    *  - base only             -> base row kept.
    * `payload` maps output column -> (baseCol, deltaCol). One full-outer
    * shuffle join on the key; no corpus rewrite. */
  def mergeUpsert(base: DataFrame, delta: DataFrame, key: String,
                  opCol: String, deleteOp: String,
                  payload: Seq[(String, (String, String))]): DataFrame = {
    val b = base.withColumnRenamed(key, "__bk")
    val d = delta.withColumnRenamed(key, "__dk")
    // shuffle_hash, build = delta (a compacted changeset is the smaller
    // side of every MERGE): Spark supports full-outer shuffled hash
    // joins, and SMJ's per-partition sorts of both keyed inputs are
    // wasted work here
    b.join(d.hint("shuffle_hash"), col("__bk") === col("__dk"), "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= deleteOp)
      .select(coalesce(col("__dk"), col("__bk")).as(key) +:
        payload.map { case (out, (bc, dc)) =>
          when(col("__dk").isNotNull, col(dc)).otherwise(col(bc)).as(out)
        } :+
        when(col("__dk").isNotNull, lit("delta")).otherwise(lit("base"))
          .as("src"): _*)
  }

  /** SCD type-2 dimension build from a change stream: one row per
    * version, effective-dated [valid_from, valid_to) via lead(), open
    * interval (null valid_to) marks the current version. One window
    * shuffle on the key. `attrs` are the tracked attribute columns. */
  def scd2(changes: DataFrame, key: String, tsCol: Column,
           tieBreak: Column, attrs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(tsCol.asc, tieBreak.asc)
    changes.select(
      (col(key) +: attrs) ++ Seq(
        row_number().over(w).as("version"),
        tsCol.as("valid_from"),
        lead(tsCol, 1).over(w).as("valid_to")): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
