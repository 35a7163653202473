package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Skew-adversarial ladder: on a [[MakeSkew]] fixture (one user owning
  * ~20% of all events), measures each skew defense against the naive
  * form it replaces, recording WALL time and MAX TASK time — the number
  * that actually bounds a 1000-executor job, since a straggling reducer
  * holds the whole stage. Every pair is checked for result parity
  * before its timings are trusted: counts + an order-independent
  * bit_xor(xxhash64) checksum where the id set IS the result (top-k,
  * join), and a measure-covering full-outer-join compare for the
  * aggregates (exact counts, sums within relative 1e-9 — plain and
  * salted fold doubles in different orders). Inputs are pre-projected
  * and CACHED so the
  * timed deltas isolate the shuffle/reduce stage where the straggler
  * lives (a cold parquet scan's decode tasks otherwise cap max_task_ms
  * for every form equally and mask the reducer delta).
  *
  * Shapes, each in its documented adversarial regime:
  *  - top-k per event_type — FEW HUGE groups (5 types x 2M rows), the
  *    [[Relational.topKPerGroupSalted]] regime where a plain window
  *    sorts every group through one reducer: plain with Spark's
  *    WindowGroupLimit rank-limit pushdown ON (the 4.x default — the
  *    optimizer's own rescue, measured so the salted operator's
  *    remaining value is stated honestly), plain with it OFF (the
  *    straggler a pre-3.5 engine or a non-rank-limit window shape
  *    pays), and salted with it OFF (the plan-level rescue that does
  *    not depend on the optimizer rule).
  *  - fact-dim equi-join on the HOT USER key with broadcast DISABLED
  *    (simulating a dim too big to broadcast): sort-merge with AQE
  *    skew-split off (straggler), with it on (runtime rescue), and
  *    [[Relational.saltedJoin]] (the static defense that works without
  *    AQE). The fact side carries the props payload so hot-partition
  *    shuffle bytes are realistic; AQE thresholds are scaled to the
  *    fixture (8 MB vs the 256 MB production default — the fixture's
  *    hot partition is ~10^2 MB where a 100 TB table's would be tens
  *    of GB; the trigger condition hot >> median is the same).
  *  - grouped sum/count per user: plain hash aggregate vs
  *    [[Relational.saltedAggregate]] — expected to TIE OR INVERT,
  *    because partial (map-side) aggregation already bounds
  *    per-reducer rows for algebraic aggs; recorded so the honest
  *    boundary of "when do I need salt" is measured, not asserted.
  *  - grouped MEDIAN per user — the aggregate that actually straggles:
  *    exact percentile is holistic (its partial buffers carry every
  *    value, so the hot key's rows all reach one reducer's merge) vs
  *    approx_percentile, whose bounded MERGEABLE sketch restores the
  *    map-side compression algebraic aggs get for free. Gated on the
  *    hot user's median agreeing within 1% before timings are trusted
  *    (the sketch is approximate — equality is the wrong gate).
  *
  * Usage: runMain graft.tools.ProbeSkewLadder <skewDir> [label]
  */
object ProbeSkewLadder {
  private class MaxTask extends SparkListener {
    private var mx = 0L
    private var n = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      mx = math.max(mx, e.taskInfo.duration); n += 1
    }
    def reset(): Unit = synchronized { mx = 0L; n = 0L }
    def snap: (Long, Long) = synchronized { (mx, n) }
  }

  def main(args: Array[String]): Unit = {
    val skewDir = args(0)
    // label is embedded raw in the artifact JSON AND the output file
    // name: whitelist it (advisor round-17, low — a quote/backslash
    // would corrupt the JSON and the path). skewDir is JSON-escaped at
    // emit time below.
    val label = (if (args.length > 1) args(1)
                 else new java.io.File(skewDir).getName)
      .replaceAll("[^A-Za-z0-9._-]", "_")
    def jsonStr(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val spark = graft.GraftSession.builder("32")
      .appName("probe-skew-ladder").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTask
    spark.sparkContext.addSparkListener(listener)

    val raw = graft.sources.ParquetNanos.read(spark, s"$skewDir/events.parquet")
    // narrow frame for window/agg shapes; payload-ful frame for the join
    // repartition(64): the single ~36 MB fixture file scans as ~5 input
    // splits, and a cache inherits them — 2M-row MAP tasks whose ~1 s
    // read+shuffle-write then dominates max_task_ms in EVERY form,
    // masking the reducer-side skew the probe exists to show
    val evN = raw.select(col("event_id"), col("user_id"), col("event_type"),
      col("value")).repartition(64).persist()
    val evJ = raw.select(col("event_id"), col("user_id"), col("props"))
      .repartition(64).persist()
    val total = evN.count(); evJ.count()
    val hotRows = evN.filter(col("user_id") === MakeSkew.HotUser).count()
    require(hotRows > 0,
      s"fixture $skewDir has no rows for HotUser=${MakeSkew.HotUser} — " +
        "it was built with an older MakeSkew hot-key constant; regenerate " +
        "with `runMain graft.tools.MakeSkew <inDir> <outDir> [k] [hotPct]`")
    println(f"rows=$total hot=$hotRows (${hotRows.toDouble / total}%.3f)")

    // dim: one row per user; broadcast stays DISABLED for all join forms
    val dim = evN.select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u_"), col("user_id")))
      .persist()
    dim.count()

    def timed(build: () => DataFrame,
              confs: Map[String, String]): (Double, Long, Long, Long) = {
      val saved = confs.keys.map(k =>
        k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val rows = build().queryExecution.toRdd.count() // warm
        val runs = (1 to 3).map { _ =>
          listener.reset()
          val t0 = System.nanoTime()
          build().queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          val (mx, n) = listener.snap
          (sec, mx, n)
        }
        val best = runs.minBy(_._1)
        (best._1, best._2, best._3, rows)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // order-independent content checksum (bit_xor, not sum: summing
    // full-range xxhash64 values overflows Long under ANSI)
    def checksum(df: DataFrame, idCol: String): Long =
      df.agg(expr(s"bit_xor(xxhash64($idCol))")).collect()(0).getLong(0)

    val noBcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val aqeSkewOn = noBcast ++ Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")
    val aqeSkewOff = noBcast ++ Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "false")
    val groupLimitOff = Map(
      "spark.sql.optimizer.windowGroupLimitThreshold" -> "-1")

    val orderCols = Seq(("value", false), ("event_id", true))
    def topkPlain() =
      Relational.topKPerGroup(evN, Seq("event_type"), orderCols, 10)
    def topkSalted() =
      Relational.topKPerGroupSalted(evN, Seq("event_type"), orderCols, 10,
        disambig = "event_id", saltFactor = 32)
    def joinPlain() =
      evJ.hint("merge").join(dim, Seq("user_id"))
        .select(col("event_id"), col("props"), col("user_tag"))
    def joinSalted() =
      Relational.saltedJoin(evJ, dim, Seq("user_id"),
          disambig = "event_id", saltFactor = 16)
        .select(col("event_id"), col("props"), col("user_tag"))
    def aggPlain() =
      evN.groupBy(col("user_id")).agg(sum(col("value")).as("sum_value"),
        count(lit(1)).as("cnt"))
    def aggSalted() =
      Relational.saltedAggregate(evN, Seq("user_id"), disambig = "event_id",
        aggs = Seq(("sum", "value", "sum_value"), ("count", "event_id", "cnt")))
    def medianExact() =
      evN.groupBy(col("user_id"))
        .agg(expr("percentile(value, 0.5)").as("p50"))
    def medianSketch() =
      evN.groupBy(col("user_id"))
        .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"))

    // parity before timing: each defense must return the naive result
    require(checksum(topkPlain(), "event_id") == checksum(topkSalted(), "event_id")
        && topkPlain().count() == topkSalted().count(), "topk parity")
    val (jpRows, jsRows) = (joinPlain().count(), joinSalted().count())
    require(jpRows == jsRows && jpRows == total, "join parity")
    // agg parity must cover the MEASURES, not just the key set (a salt
    // bug that double-counts partials would keep user_id/count intact):
    // full outer join, exact cnt equality, sums within relative 1e-9
    // (plain and salted fold in different orders — bitwise equality is
    // the wrong gate for doubles)
    val p = aggPlain().withColumnRenamed("sum_value", "sp")
      .withColumnRenamed("cnt", "cp")
    val q = aggSalted().withColumnRenamed("sum_value", "ss")
      .withColumnRenamed("cnt", "cs")
    val aggBad = p.join(q, Seq("user_id"), "full_outer")
      .filter(col("cp").isNull || col("cs").isNull || col("cp") =!= col("cs")
        || abs(col("sp") - col("ss")) > lit(1e-9) * greatest(
             abs(col("sp")), abs(col("ss")), lit(1.0)))
      .count()
    require(aggBad == 0, s"agg parity: $aggBad mismatched groups")
    val hotP50 = Seq(medianExact(), medianSketch()).map(df =>
      df.filter(col("user_id") === MakeSkew.HotUser)
        .collect()(0).getDouble(1))
    require(math.abs(hotP50(0) - hotP50(1)) <= 0.01 * math.abs(hotP50(0)),
      s"median gate: exact=${hotP50(0)} sketch=${hotP50(1)}")

    val forms: Seq[(String, () => DataFrame, Map[String, String])] = Seq(
      ("topk_type_grouplimit", () => topkPlain(), Map.empty),
      ("topk_type_plain", () => topkPlain(), groupLimitOff),
      ("topk_type_salted", () => topkSalted(), groupLimitOff),
      ("join_smj_noskewfix", () => joinPlain(), aqeSkewOff),
      ("join_smj_aqeskew", () => joinPlain(), aqeSkewOn),
      ("join_salted", () => joinSalted(), aqeSkewOff),
      ("agg_plain", () => aggPlain(), Map.empty),
      ("agg_salted", () => aggSalted(), Map.empty),
      ("median_exact", () => medianExact(), Map.empty),
      ("median_sketch", () => medianSketch(), Map.empty))

    val results = forms.map { case (name, build, confs) =>
      val (sec, maxMs, tasks, rows) = timed(build, confs)
      println(f"$name%-26s sec=$sec%7.3f max_task_ms=$maxMs%6d tasks=$tasks%5d rows=$rows")
      s""""$name":{"sec":${f"$sec%.3f"},"max_task_ms":$maxMs,"tasks":$tasks,"rows":$rows}"""
    }

    val json = "{" +
      s""""metric":"skew_ladder","label":"$label","sf":"${jsonStr(skewDir)}",""" +
      s""""rows":$total,"hot_rows":$hotRows,""" +
      f""""hot_frac":${hotRows.toDouble / total}%.4f,""" +
      s""""forms":{${results.mkString(",")}}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/skew_ladder_$label.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
