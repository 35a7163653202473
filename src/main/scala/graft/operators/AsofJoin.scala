package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row whose
  * timestamp is <= the left timestamp, per key. (The canonical
  * time-series operator Spark lacks natively; Pandas merge_asof /
  * DuckDB ASOF JOIN semantics, backward direction, inclusive.)
  *
  * Implementation is the union-and-carry-forward formulation — the
  * scalable shape for a distributed engine:
  *   1. union left and right rows tagged by side, right rows carrying
  *      their payload columns, left rows carrying null payloads;
  *   2. one shuffle+sort per key on (ts, side) with right-before-left at
  *      equal ts (inclusive match);
  *   3. last_value(payload, ignoreNulls) over the unbounded-preceding
  *      window carries each right payload forward to the left rows that
  *      follow it;
  *   4. keep only left rows.
  * Cost: exactly one shuffle and one sort — the same as a sort-merge
  * join, with no range-explosion. Works unchanged at any scale; skewed
  * keys can pre-salt the union with [[Relational.saltedJoin]]'s scheme
  * only if a single key's timeline exceeds one executor's sort budget
  * (rare: timelines compress well).
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     lookup timeline
    * @param keys      equality join keys (present in both sides)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   columns of `right` to attach (null when no right
    *                  row at or before the left row's time)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofBackward needs at least one payload column")
    val leftCols = left.columns.toSeq
    // All payload columns travel inside ONE struct marker that is non-null
    // for every right row: last(__m, ignoreNulls) then keys off "a right
    // row exists at or before this ts", not off the payload value — a
    // matched right row whose payload IS NULL stays NULL (merge_asof /
    // DuckDB ASOF semantics) instead of leaking an older non-null value.
    val mType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    // side 0 = right (sorts before left at equal ts -> inclusive <=)
    val rightTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct(payload.map(col): _*).as("__m")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val leftTagged = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(mType).as("__m")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val unioned = rightTagged.unionByName(leftTagged)
    // __m as the final sort key makes right-row ties at equal __ts
    // deterministic: the max payload struct wins (field-by-field order)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__c", last(col("__m"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(
        (keys.map(col) :+ col("__ts").as(leftTs)) ++
          leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col) ++
          payload.map(c => col("__c").getField(c).as(c)): _*)
  }
}
