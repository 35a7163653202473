package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the statistical curation ops — properties
  * the DuckDB hash oracle cannot express (they hold for ANY corpus, not
  * just the fixture). */
class CurationInvariantSpec extends SparkSpec {

  test("pagerank conserves probability mass (no dangling nodes)") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, sfDir)
    val sum = pr.agg(org.apache.spark.sql.functions.sum(col("pr")))
      .head().getDouble(0)
    // undirected edge list -> every node has out-degree >= 1, so the
    // damped walk loses no mass; 4dp rounding bounds the drift
    assert(math.abs(sum - 1.0) < 1e-2, s"pagerank mass = $sum")
  }

  test("domain-mix weights and shares each sum to 1") {
    val m = SparkEntry.queries("ext_domain_mix")(spark, sfDir)
    val r = m.agg(org.apache.spark.sql.functions.sum(col("share")),
      org.apache.spark.sql.functions.sum(col("weight"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-2, s"share sum ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-2, s"weight sum ${r.getDouble(1)}")
  }

  test("domain-sample rates never exceed 1 and the hottest source is capped at 1") {
    // recompute rates the way the entry does, on the raw corpus
    val d = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
    val docsPerSrc = d.groupBy(col("source")).count()
    val kept = SparkEntry.queries("ext_domain_sample")(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("kept"))
    val joined = docsPerSrc.join(kept, Seq("source"), "left").collect()
    // a rate can never yield more kept docs than exist
    assert(joined.forall(r => r.getAs[Long]("kept") <= r.getAs[Long]("count")))
  }

  test("unigram NLL is non-negative and bounded by ln(corpus tokens)") {
    val lp = SparkEntry.queries("text_unigram_logprob")(spark, sfDir)
    val mx = lp.agg(max(col("nll")), min(col("nll"))).head()
    assert(mx.getDouble(1) >= 0.0)
    // -ln p >= 0 and p >= 1/total -> nll <= ln(total); total < 1e6 here
    assert(mx.getDouble(0) <= math.log(1e6))
  }

  test("bigram NLL is non-negative and <= every doc's unigram-style bound") {
    val lp2 = SparkEntry.queries("text_bigram_logprob")(spark, sfDir)
    val mn = lp2.agg(min(col("nll2"))).head().getDouble(0)
    // p(w2|w1) = c12/c1 <= 1 -> every term >= 0
    assert(mn >= 0.0, s"negative bigram NLL: $mn")
    // conditioning can never make a pair MORE probable than 1/contexts
    val mx = lp2.agg(max(col("nll2"))).head().getDouble(0)
    assert(mx <= math.log(1e6))
  }

  test("p95 length gate keeps >= 95% of each source and drops only the longest") {
    val d = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
    val total = d.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("ext_length_p95_filter")(spark, sfDir)
    val keptPerSrc = kept.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (src, n) =>
      val k = keptPerSrc.getOrElse(src, 0L)
      // discrete p95: the threshold row's cumulative count >= ceil(.95n)
      assert(k >= (95 * n + 99) / 100,
        s"$src kept $k of $n (< ceil(95%))")
      assert(k <= n)
    }
    // every dropped doc is strictly longer than every kept doc's length
    // within its source (threshold semantics)
    val maxKept = kept.groupBy(col("source"))
      .agg(max(col("n_tokens")).as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dropped = d.select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("n_tokens"))
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .collect()
    dropped.foreach { r =>
      assert(r.getLong(2) > maxKept(r.getString(1)),
        s"dropped doc ${r.getLong(0)} not longer than kept max")
    }
  }

  test("shuffle order is a deterministic permutation: every doc once, contiguous per-shard positions") {
    val a = SparkEntry.queries("ext_shuffle_order")(spark, sfDir).collect()
    val docs = graft.sources.ParquetNanos
      .read(spark, s"$sfDir/documents.parquet").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // a permutation: every doc exactly once
    assert(a.map(_.getLong(0)).toSet == docs && a.length == docs.size)
    // positions within each shard are contiguous 1..n (a reader can seek)
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val pos = rows.map(_.getLong(2)).sorted
      assert(pos.head == 1L && pos.last == pos.length.toLong &&
        pos.distinct.length == pos.length,
        s"shard $shard positions not contiguous 1..n")
    }
    // deterministic: a second evaluation yields the identical assignment
    val b = SparkEntry.queries("ext_shuffle_order")(spark, sfDir).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // and genuinely shuffled: within some shard, hash order differs from
    // doc_id order (the permutation is not the identity)
    val somePerm = a.groupBy(_.getLong(1)).values.exists { rows =>
      val byPos = rows.sortBy(_.getLong(2)).map(_.getLong(0))
      !byPos.sameElements(byPos.sorted)
    }
    assert(somePerm, "shuffle order equals doc_id order — not a shuffle")
  }
}
