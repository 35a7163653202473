package graft.tools

/** ANN quality evidence: recall@k of each approximate top-k entry
  * against the brute-force exact entry, on the same fixture and query
  * set the entries themselves use. The correctness gate already proves
  * each method computes ITS OWN contract exactly (oracle restates the
  * same algorithm); this artifact answers the other question a user
  * asks — how close the approximation is to the true neighbors.
  *
  * recall@k = |approx_ids(q) ∩ brute_ids(q)| / k, averaged over queries.
  * Ties at the cosine boundary can make two exact methods disagree on
  * the k-th neighbor; recall is reported raw (no tie forgiveness).
  *
  * Usage: runMain graft.tools.ProbeAnnRecall <sfDir> [label]
  */
object ProbeAnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val label = if (args.length > 1) args(1) else new java.io.File(sfDir).getName
    val spark = graft.GraftSession.builder("32")
      .appName("probe-ann-recall").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def neighborSets(entry: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(entry)(spark, sfDir)
        .select("q_id", "n_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

    val brute = neighborSets("ann_brute_topk")
    val k = brute.values.map(_.size).max

    val methods = Seq("ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
      "ann_ivfpq_topk", "ann_int8_topk", "ann_ivfpq_residual")
    val recalls = methods.map { m =>
      val approx = neighborSets(m)
      val r = brute.toSeq.map { case (q, ids) =>
        approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
      }
      m -> r.sum / r.size
    }
    recalls.foreach { case (m, r) =>
      System.err.println(f"$m%-16s recall@$k = $r%.3f")
    }

    // The entries run DEMO parameters; the recall/cost knob is the
    // point, so also measure tuned variants of each family: fewer LSH
    // planes = bigger buckets (more candidates, higher recall), larger
    // PQ refine shortlist, more IVF probes.
    import org.apache.spark.sql.functions.col
    val e = graft.sources.ParquetNanos.read(spark, s"$sfDir/embeddings.parquet")
    val qs = e.filter(col("vec_id") < 10)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      val r = brute.toSeq.map { case (q, ids) =>
        approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
      }
      r.sum / r.size
    }
    val cb = graft.operators.Quantization.trainPq(
      e, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val tuned = Seq(
      "lsh_planes4" -> (() => graft.operators.Similarity.lshTopK(
        e, qs, "vec_id", "embedding", k = k, numPlanes = 4)),
      "pq_refine16" -> (() => graft.operators.Quantization.pqTopK(
        e, qs, "vec_id", "embedding", k = k, cb, refine = 16)),
      "ivfpq_probe8_refine16" -> (() => graft.operators.Quantization.ivfPqTopK(
        e, qs, "vec_id", "embedding", k = k, nlist = 16, nprobe = 8,
        m = 8, kCodes = 16, refine = 16)),
      // residual encoding at the ENTRY parameters (nprobe=6, refine=4)
      // and tuned — the FAISS IndexIVFPQ shape; compare against
      // ann_ivfpq_topk / ivfpq_probe8_refine16 at matching knobs
      "ivfpq_residual_entry" -> (() => graft.operators.Quantization
        .ivfPqResidualTopK(e, qs, "vec_id", "embedding", k = k,
          nlist = 16, nprobe = 6, m = 8, kCodes = 16, refine = 4)),
      "ivfpq_residual_p8_r16" -> (() => graft.operators.Quantization
        .ivfPqResidualTopK(e, qs, "vec_id", "embedding", k = k,
          nlist = 16, nprobe = 8, m = 8, kCodes = 16, refine = 16)))
      .map { case (n, b) => n -> recallOf(b()) }
    tuned.foreach { case (m, r) =>
      System.err.println(f"$m%-24s recall@$k = $r%.3f (tuned)")
    }

    val json = "{" +
      s""""metric":"ann_recall","label":"$label","sf":"$sfDir",""" +
      s""""k":$k,"queries":${brute.size},""" +
      (recalls ++ tuned).map { case (m, r) => "\"" + m + f"""":$r%.3f""" }
        .mkString(",") + "}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/ann_recall_$label.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
