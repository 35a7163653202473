package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Protocol: build the prepared layout first (prepare phase, reported
  * separately as "prepare_sec" — the reference also excludes prepare from
  * query timings), then measure each headline query cold (first timed
  * pass) and warm (THREE further passes; the reported per-query number is
  * the per-query MINIMUM of the warm passes — the reference's published
  * numbers are warm-cache too, BASELINE.md).
  *
  * Noise robustness (round-7 lesson): BENCH_r07's official artifact was
  * corrupted by a concurrent process on the driver box — a single timed
  * pass per phase meant one CPU-starved window inflated the round's
  * numbers 8x with no way to tell contention from regression. Three warm
  * passes with a per-query min make a transient stall invisible unless it
  * covers ALL passes, and the emitted "contended" flag self-diagnoses the
  * residue: it trips when any query's best warm time exceeds 1.5x its
  * cold time (no plan property can produce that — warm re-runs reuse JIT,
  * shuffle files and page cache) or when a query's warm passes disagree
  * by more than 3x among themselves. All three warm passes are written to
  * target/bench_detail.json so a flagged run can be audited after the
  * fact (stdout carries only the compact line — the driver's output-tail
  * capture truncated the inline detail in earlier rounds).
  *
  * Measurement hygiene (round-6 lesson): the relational group is warmed
  * and measured COMPLETELY before any pipeline query runs, because the
  * pipeline group persists shared intermediates (signature/pair-count
  * tables, the IVF index) whose resident blocks put the join-heavy
  * queries under memory/GC pressure they would never see in isolation.
  * The untimed JIT warmup is therefore per-GROUP (relational queries
  * warm the relational group; pipeline queries the pipeline group), so
  * no pipeline table is resident when the relational group is timed.
  * NOTE on "cold_sec": the warmup pass reads the same parquet
  * immediately before the cold pass, so OS page cache and footer caches
  * are WARM — cold_sec is the first timed pass after warmup (warm
  * caches, warm JIT), i.e. first-plan-contact cost, NOT true cold I/O.
  * The 1.5x-cold contention heuristic below is calibrated against that
  * definition; do not retune it against a true-cold model.
  * Operator-internal persists are dropped (Dedup.releaseIntermediates)
  * between pipeline passes so repeated invocations measure the operator,
  * not the accumulation. */
/** Minimal extractor over `tools/bench_oracle.py --totals` output
  * (target/oracle_totals.json). Extracted from the bench main so the
  * number pattern is unit-testable: python's json.dump emits exponent
  * notation (e.g. `1e-05`) for very small per-entry DuckDB times, and
  * the pre-round-18 `[0-9.]+` pattern parsed that as `1.0` — silently
  * corrupting the embedded spark-over-duckdb ratio for that entry
  * (round-18 advisor; pinned by OracleTotalsSpec). */
private[graft] object OracleTotals {
  private val Num = "-?[0-9][0-9.]*(?:[eE][+-]?[0-9]+)?"

  /** Scalar field: number (incl. exponent form), quoted string, or bool. */
  def field(s: String, k: String): Option[String] =
    ("\"" + k + "\":\\s*(" + Num + "|\"[^\"]*\"|true|false)").r
      .findFirstMatchIn(s).map(_.group(1))

  /** Flat per-entry map ("queries1"/"queries2"): numbers only —
    * the totals file's complete=true guarantees no timeout/error
    * strings survived into the maps. */
  def entryMap(s: String, k: String): Map[String, Double] =
    ("\"" + k + "\":\\s*\\{([^}]*)\\}").r.findFirstMatchIn(s)
      .map(_.group(1)).toSeq
      .flatMap(("\"([^\"]+)\":\\s*(" + Num + ")").r.findAllMatchIn(_)
        .map(m => m.group(1) -> m.group(2).toDouble))
      .toMap

  /** Flat string array (the subset-run "subset" key); empty when the
    * key is absent (a full-suite totals file). */
  def stringList(s: String, k: String): Seq[String] =
    ("\"" + k + "\":\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(s)
      .map(_.group(1)).toSeq
      .flatMap("\"([^\"]+)\"".r.findAllMatchIn(_).map(_.group(1)))
}

object Bench {

  /** Relational / routing / join / window headline set — measured first,
    * in a cache-clean session. */
  val relational: Seq[String] = Seq(
    "r9_agg_sum", "r13_order_multi", "ext_global_agg",
    "route_reagg_type", "route_residual_filters",
    "scan_partition_pruned",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q10",
    "tpch_q9", "tpch_q13", "tpch_q21",
    "join_shuffle_fact", "join_broadcast_dim",
    "ext_window_topk_per_group", "ext_asof_join", "ext_moving_avg",
    "ext_rollup", "sessionize",
    "ext_cdc_compact", "ext_merge_upsert", "ext_merge_upsert_bucketed",
    "ext_funnel")

  /** LLM-pipeline headline set — dedup, ANN, text scoring, packing;
    * builds (and legitimately reuses) the shared prepare-once tables. */
  val pipeline: Seq[String] = Seq(
    "dedup_minhash", "dedup_ngram_jaccard", "dedup_ngram_blocked",
    "dedup_clusters", "dedup_substrings", "pipeline_curate_pack",
    "ann_brute_topk", "ann_ivf_topk", "text_quality",
    "text_gopher_rules", "ext_pack_sequences")

  val headline: Seq[String] = relational ++ pipeline

  /** Second headline group (round 16): the families added after round 12
    * that the frozen 35-entry headline never timed at bench scale —
    * multimodal decode, the routed z-order box, quantized ANN, Bloom
    * decontamination, the epoch shuffle. Same protocol (untimed group
    * warmup, cold pass, min-of-[[WarmPasses]] warm, contended flag);
    * measured AFTER group 1 and reported under separate keys, so group-1
    * totals stay comparable to the r14/r15 artifacts. DuckDB twins:
    * tools/bench_oracle.py GROUP2 times the same entries' oracles. */
  val extended: Seq[String] = Seq(
    "mm_features", "mm_video_frames", "mm_audio_features",
    "route_zorder_box", "ann_int8_topk", "ann_ivfpq_topk",
    "ann_ivfpq_residual", "text_decontaminate_bloom", "ext_shuffle_order")

  /** Warm timed passes per query; the reported number is the minimum. */
  val WarmPasses = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_BENCH_ONLY: comma-separated headline subset, for scale
    // fixtures where part of the suite is infeasible BY DESIGN (the
    // exact pair-table baselines are quadratic in the MakeSfN replica
    // factor). The official per-round artifact always runs the full
    // headline; subset artifacts record their subset in the JSON.
    val only = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = GraftSession.builder(cpus).appName("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    SparkEntry.preparedEngine(spark, sfDir) // prepare phase (not timed per-query)
    val prepareSec = (System.nanoTime() - t0) / 1e9

    val qs = SparkEntry.queries
    def timeOne(name: String): Double = {
      val start = System.nanoTime()
      // Execute the query AS WRITTEN: a DataFrame .count() lets Catalyst
      // prune every cardinality-preserving projection/window, so a
      // SELECT-shaped entry times a bare parquet row count (caught at
      // sf10 in round 12: text_quality "0.13 s" was a pruned scan while
      // the DuckDB side's fetchall paid 45 s of real scoring — and the
      // same held for gopher_rules, moving_avg, pack_sequences at every
      // scale). toRdd executes the full physical plan — every column of
      // every row materializes (UnsafeRow) — without collecting results
      // to the driver, matching the oracle's full-materialization
      // protocol.
      try { qs(name)(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - start) / 1e9
    }

    /** Measure one group: untimed JIT-warmup pass, one timed cold pass,
      * then [[WarmPasses]] timed warm passes (pass-wise, so the passes
      * alternate through the whole group like real workloads do).
      * `release` runs between pipeline passes to drop operator-internal
      * pooled persists — shared prepare-once tables survive by design. */
    def measure(group: Seq[String], release: () => Unit)
        : (Seq[(String, Double)], Map[String, Seq[Double]]) = {
      group.foreach(timeOne) // untimed JIT warmup for this group only
      release()
      val cold = group.map(n => n -> timeOne(n))
      val warm = (1 to WarmPasses).map { _ =>
        release(); group.map(n => n -> timeOne(n)).toMap
      }
      (cold, group.map(n => n -> warm.map(_(n))).toMap)
    }

    val noop = () => ()
    def picked(g: Seq[String]) = if (only.isEmpty) g else g.filter(only)
    val active = picked(relational) ++ picked(pipeline)
    val rel = measure(picked(relational), noop)
    val pipe = measure(picked(pipeline),
      () => graft.operators.Dedup.releaseIntermediates())
    // group 2 runs strictly AFTER group 1 so its artifact builds and
    // resident blocks can't contaminate the comparable group-1 numbers
    val activeExt = picked(extended)
    val ext = measure(activeExt,
      () => graft.operators.Dedup.releaseIntermediates())

    val cold = rel._1 ++ pipe._1
    val warmAll: Map[String, Seq[Double]] = rel._2 ++ pipe._2
    val warmBest = active.map(n =>
      n -> warmAll(n).filter(_ >= 0).minOption.getOrElse(-1.0))
    val coldExt = ext._1
    val warmAllExt: Map[String, Seq[Double]] = ext._2
    val warmBestExt = activeExt.map(n =>
      n -> warmAllExt(n).filter(_ >= 0).minOption.getOrElse(-1.0))

    // contention self-diagnosis: warm best > 1.5x cold is physically
    // impossible from plan properties alone (floor of 0.15s keeps
    // scheduler jitter on sub-100ms queries from tripping it), and warm
    // passes disagreeing >3x among themselves means something else had
    // the CPU mid-run.
    val coldMap = (cold ++ coldExt).toMap
    val warmMap = warmAll ++ warmAllExt
    val suspects = (active ++ activeExt).flatMap { n =>
      val c = coldMap(n); val ws = warmMap(n).filter(_ >= 0)
      if (c < 0 || ws.isEmpty) None
      else if (ws.min > 1.5 * math.max(c, 0.15)) Some(s"$n:warm>1.5x-cold")
      else if (ws.max > 3.0 * math.max(ws.min, 0.15)) Some(s"$n:warm-spread>3x")
      else None
    }

    def fmt(xs: Iterable[(String, Double)]) =
      xs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def fmtSeq(xs: Iterable[(String, Seq[Double])]) =
      xs.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val total = warmBest.map(_._2).filter(_ >= 0).sum
    val coldTotal = cold.map(_._2).filter(_ >= 0).sum
    val totalExt = warmBestExt.map(_._2).filter(_ >= 0).sum
    val coldTotalExt = coldExt.map(_._2).filter(_ >= 0).sum
    // Same-scale DuckDB comparison for BOTH groups, when a prior
    // `tools/bench_oracle.py <sfDir> <outdir> ... --totals` run left its
    // totals file for this sf dir: the ratio rides the bench artifact so
    // the round ledger carries spark-vs-duckdb without a side channel.
    // Stale-safety: the file records its sfDir (mismatch drops it) and a
    // completeness flag (a timeout/error-shrunk DuckDB total would
    // overstate the ratio — refused). Subset agreement: a full-suite
    // Spark run only embeds a FULL-suite totals file (no "subset" key),
    // and a SPARK_GRAFT_BENCH_ONLY run only embeds a totals file whose
    // recorded ORACLE_BENCH_ONLY subset matches its own exactly —
    // anything else would compare different query sets (round-18 judge:
    // sf10 needs twin ratios, which only the subset protocol can time).
    // duck._1 = full embed (per-entry DuckDB + ratio maps) for the DETAIL
    // file; duck._2 = scalar totals/ratios only for STDOUT. Round-17
    // lesson (BENCH_r17 parsed:null): the four per-entry maps pushed the
    // single stdout line past the driver's output-tail window, truncating
    // its HEAD — the driver artifact lost the headline number entirely.
    // Per-entry maps therefore live ONLY in target/bench_detail.json.
    val duck: (String, String) = {
      val p = java.nio.file.Paths.get("target/oracle_totals.json")
      if (!java.nio.file.Files.exists(p)) ("", "")
      else {
        val s = java.nio.file.Files.readString(p).trim
        def field(k: String): Option[String] = OracleTotals.field(s, k)
        def entryMap(k: String): Map[String, Double] = OracleTotals.entryMap(s, k)
        val sfOk = field("sf").exists(_.stripPrefix("\"").stripSuffix("\"") == sfDir)
        val complete = field("complete").contains("true")
        val oracleSubset = OracleTotals.stringList(s, "subset").toSet
        val subsetOk =
          if (only.isEmpty) oracleSubset.isEmpty else oracleSubset == only
        (for {
          _ <- Option.when(sfOk && complete && subsetOk)(())
          t1 <- field("group1_total"); t2 <- field("group2_total")
        } yield {
          val r1 = if (t1.toDouble > 0) total / t1.toDouble else -1.0
          val r2 = if (t2.toDouble > 0) totalExt / t2.toDouble else -1.0
          // per-entry spark-over-duckdb ratios for BOTH groups (round-16
          // judge, What's missing #3): a regression inside a group is
          // visible in the round artifact itself, not just the totals
          def ratios(spark: Seq[(String, Double)], duckM: Map[String, Double]) =
            spark.flatMap { case (n, sp) =>
              duckM.get(n).filter(_ > 0).filter(_ => sp >= 0)
                .map(d => n -> sp / d)
            }
          val (d1, d2) = (entryMap("queries1"), entryMap("queries2"))
          val perEntry =
            if (d1.isEmpty && d2.isEmpty) "" // pre-round-17 totals file
            else
              s""""duckdb_queries":${fmt(warmBest.flatMap { case (n, _) =>
                d1.get(n).map(n -> _) })},""" +
              s""""duckdb_queries2":${fmt(warmBestExt.flatMap { case (n, _) =>
                d2.get(n).map(n -> _) })},""" +
              s""""ratio_queries":${fmt(ratios(warmBest, d1))},""" +
              s""""ratio_queries2":${fmt(ratios(warmBestExt, d2))},"""
          val scalars =
            s""""duckdb_group1_total_sec":$t1,"duckdb_group2_total_sec":$t2,""" +
            s""""spark_over_duckdb_group1":${f"$r1%.3f"},""" +
            s""""spark_over_duckdb_group2":${f"$r2%.3f"},"""
          (scalars + perEntry, scalars)
        }).getOrElse(("", ""))
      }
    }
    def group2Of(duckPart: String) =
      s""""group2_total_sec":${f"$totalExt%.3f"},""" +
      s""""queries2":${fmt(warmBestExt)},""" +
      s""""group2_cold_total_sec":${f"$coldTotalExt%.3f"},""" + duckPart
    val group2 = group2Of(duck._1)
    val group2Compact = group2Of(duck._2)
    val detail =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":${fmt(warmBest)},"cold_sec":${fmt(cold ++ coldExt)},""" +
      s""""cold_total_sec":${f"$coldTotal%.3f"},"prepare_sec":${f"$prepareSec%.3f"},""" +
      group2 +
      s""""warm_passes":${fmtSeq((active ++ activeExt).map(n => n -> warmMap(n)))},""" +
      (if (only.isEmpty) "" else
        s""""subset":${only.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""") +
      s""""contended":${suspects.nonEmpty},""" +
      s""""contention_detail":${suspects.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""cold_note":"first timed pass after untimed warmup; OS/page caches warm",""" +
      s""""sf":"$sfDir"}"""
    // Full per-pass detail goes to a FILE: the driver's output-tail
    // capture truncated it mid-JSON in BENCH_r08/r10, losing the warm
    // passes to the artifact. The file survives; stdout stays compact.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_detail.json"), detail + "\n")
    // Compact summary is the ONLY stdout JSON line — any tail window
    // catches it whole.
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":${fmt(warmBest)},""" +
      group2Compact +
      s""""cold_total_sec":${f"$coldTotal%.3f"},"prepare_sec":${f"$prepareSec%.3f"},""" +
      (if (only.isEmpty) "" else
        s""""subset":${only.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""") +
      s""""contended":${suspects.nonEmpty},"sf":"$sfDir"}""")
    spark.stop()
  }
}
