package graft.tools

import org.apache.spark.sql.functions._

/** Scale evidence for the video frame-sampling economics: the whole point
  * of strided sampling at 100 TB is that SKIPPED FRAMES ARE NEVER DECODED,
  * so decode cost scales with kept frames while container parse + I/O
  * scale with clip bytes. This probe measures decodeVideoFrames over the
  * same materialized clip table at stride 1/2/4 and prints wall seconds +
  * decoded-frame counts — the decode-bound fraction should fall roughly
  * with the kept-frame ratio. Results go to BASELINE_MEASURED.md.
  *
  * Usage: runMain graft.tools.ProbeVideoStride [sfDir] [passes]
  */
object ProbeVideoStride {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder("32").appName("probe-video-stride")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")

    // Materialize the clip table once so every stride measurement times
    // ONLY parse+decode+featurize, not the fixture encode.
    val clipPath = "/root/repo/target/tmp/video_clips_probe"
    graft.operators.Multimodal.videoMediaTable(spark, docs, "doc_id")
      .write.mode("overwrite").parquet(clipPath)
    val clips = spark.read.parquet(clipPath) // self-written, no ts columns
    val nClips = clips.count()
    val totalBytes = clips.agg(sum(octet_length(col("blob")))).collect()(0).getLong(0)
    println(f"clips=$nClips totalBytes=$totalBytes")

    Seq(1, 2, 4).foreach { stride =>
      val df = graft.operators.Multimodal.decodeVideoFrames(spark, clips, stride)
      df.queryExecution.toRdd.count() // untimed warmup
      var rows = 0L
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        rows = df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"stride=$stride%-2d framesDecoded=$rows%-8d min=${times.min}%.3f s " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
