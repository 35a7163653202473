package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each user's event stream into sessions at
  * inactivity gaps.
  *
  * Batch formulation is the classic gaps-and-islands: lag(ts) within
  * (user ORDER BY ts), mark gap > timeout as a session boundary, running
  * sum of boundaries = session index. One shuffle on user_id, everything
  * else window functions — at 100 TB this is the right shape (no state
  * store, no driver involvement). The streaming analogue lives in
  * [[graft.streaming.StreamOps.sessionizeStream]] with
  * flatMapGroupsWithState.
  */
object Sessionize {

  /** Per-session summary: (user_id, session_id, n_events, session_start,
    * session_end). `timeoutMinutes` inactivity closes a session. */
  def sessions(events: DataFrame, userCol: String = "user_id",
               tsCol: String = "ts", timeoutMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val withGap = events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull, 1)
          .when(unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev"))
            > timeoutMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }
}
