package graft.tools

import org.apache.spark.sql.functions._

/** Profile the stream_join verify cost (round-19 judge item 7): is the
  * ~6 s verify row dominated by micro-batch COUNT, by state-store commit
  * fan-out, or by fixed streaming machinery? Runs the entry's exact
  * stream-stream interval join at a given SF and prints, per micro-batch,
  * the StreamingQueryProgress durations (addBatch / getBatch / walCommit /
  * commitOffsets) and state-operator metrics (rows updated, commit time),
  * then re-runs at a different shuffle-partition override to separate
  * per-partition commit fan-out from per-batch fixed cost.
  *
  * Usage: runMain graft.tools.ProbeStreamJoin [sfDir] [partitionsCsv]
  */
object ProbeStreamJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val parts = (if (args.length > 1) args(1) else "4,1,8")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.create("probe-stream-join")
    spark.sparkContext.setLogLevel("WARN")
    // Stage the single-file fixture into a directory exactly like the
    // entry's eventsStream helper (file-stream sources require a dir)
    // and mirror its nanos-vs-micros ts handling: the raw file is
    // copied verbatim, so a TIMESTAMP(NANOS) fixture streams ts as
    // LongType nanos converted post-read.
    import org.apache.spark.sql.types._
    val tsNanos = graft.sources.ParquetNanos
      .nanosFields(spark, s"$sfDir/events.parquet").contains("ts")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", if (tsNanos) LongType else TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val name0 = new java.io.File(sfDir).getName
    val streamDir = new java.io.File(s"/root/repo/target/tmp/events_stream_$name0")
    if (!new java.io.File(streamDir, "events.parquet").exists()) {
      streamDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        java.nio.file.Paths.get(s"$streamDir/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    parts.foreach { p =>
      // stateful streaming disables AQE, so shuffle.partitions IS the
      // state-store partition count (x4 store providers per partition
      // for a stream-stream join: left/right x keyToNumValues/
      // keyWithIndexToValue)
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val ev = graft.streaming.StreamOps.parquetStream(
        spark, streamDir.toString, schema,
        nanosCols = if (tsNanos) Set("ts") else Set.empty)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("r_ts"), col("event_id").as("r_id"))
      val joined = graft.streaming.StreamOps.intervalJoinStreams(
        purchases, clicks, "user_id", "l_ts", "r_ts", windowMinutes = 30)
      val t0 = System.nanoTime()
      val q = joined.select(col("l_id"), col("r_id")).writeStream
        .format("memory").queryName(s"psj_$p")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val n = spark.table(s"psj_$p").count()
      println(f"== partitions=$p wall=$wall%.2f s rows=$n batches=${q.recentProgress.length}")
      q.recentProgress.foreach { pr =>
        val d = pr.durationMs
        val so = pr.stateOperators.map(s =>
          s"rowsUpd=${s.numRowsUpdated} commitMs=${s.commitTimeMs} " +
            s"memUsed=${s.memoryUsedBytes}").mkString("; ")
        println(s"  batch=${pr.batchId} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")} " +
          s"inputRows=${pr.numInputRows} [$so]")
      }
    }
    spark.stop()
  }
}
