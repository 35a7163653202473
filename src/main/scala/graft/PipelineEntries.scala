package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Multimodal, Sessionize, Similarity, TextAnalysis}
import graft.streaming.StreamOps

/** Training-data pipeline operator entries (dedup, similarity search,
  * text analysis, multimodal, sessionization, streaming) and their DuckDB
  * oracles. Merged into [[SparkEntry.queries]].
  *
  * Oracle notes:
  *  - DuckDB `regexp_replace` needs the 'g' flag to mean replace-all
  *    (Spark replaces all by default);
  *  - everything arithmetic is stated in the same operation order on both
  *    sides so doubles match bit-for-bit before the final round(.,4);
  *  - LSH/IVF-based ops ARE oracled where the hash family / training
  *    loop is engine-portable (portable md5-56 planes, deterministic
  *    Lloyd unrolled in SQL); the ScalaTest suite additionally pins
  *    their recall against exact ground truth.
  */
object PipelineEntries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.sources.ParquetNanos.read(s, s"$dir/documents.parquet")

  /** Deterministic corpus cap for the O(N²) VERIFICATION BASELINES
    * (dedup_prefix, dedup_simhash, dedup_embedding_cosine): beyond
    * `cap` rows, both engines restrict to the same id-modulo sample
    * (m = ceil(n/cap), keep id % m == 0). m == 1 at the shipped small
    * SFs, so sf0.01/sf0.1 outputs are byte-identical to the uncapped
    * form; at the 10x+ scale fixtures the baselines — whose oracles
    * exhaustively enumerate pairs and whose own contract is
    * recall-verification on a sample, never production dedup — get a
    * bounded input that the single-node oracle can restate (the
    * previous GRAFT_VERIFY_SKIP rows now get real verdicts at every
    * scale). Plain modulo (not a hash) so the DuckDB oracle states the
    * identical sample; the MakeSfN fixtures offset replica ids by
    * multiples of 10^7, so an id-modulo sample keeps whole replica
    * groups together and the sampled corpus still contains near-dups. */
  private[graft] def moduloCap(df: DataFrame, idCol: String, cap: Long,
                               memoKey: Option[String] = None): DataFrame = {
    // m is a corpus constant; `memoKey` callers (the entries, keyed per
    // (session, sfDir, table)) pay the row-count job once per session
    // instead of once per entry CONSTRUCTION — un-memoized, the eager
    // count() landed inside Bench's timed region on every pass and in
    // every Verify build (round-12 advice).
    def computeM: Long = {
      val n = df.count()
      if (n <= cap) 1L else (n + cap - 1) / cap
    }
    val m = memoKey match {
      case Some(k) => moduloCapMemo.computeIfAbsent(
        df.sparkSession.sparkContext.applicationId + ":" + k + ":" + cap,
        _ => java.lang.Long.valueOf(computeM)).longValue()
      case None => computeM
    }
    if (m == 1L) df else df.filter(pmod(col(idCol), lit(m)) === 0)
  }
  private val moduloCapMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  /** Shared pipeline intermediates as WRITTEN prepare artifacts.
    *
    * The expensive corpus-scale stages behind the dedup/ANN entries —
    * the hashed-shingle signature table, the shared-shingle pair counts,
    * the verified jaccard>=0.5 pair set, the shingle document
    * frequencies, the IVF index — are prepare-once-query-many, exactly
    * like the rollup layouts. They are therefore materialized as ZSTD
    * parquet under `target/prepared/pipeline/<corpus>/<name>` on first
    * use and READ back on every use after that, including from a fresh
    * session/JVM: the build runs once per corpus, not once per session.
    * (`rm -rf target/prepared` invalidates, same as the rollups — the
    * CLAUDE.md gate note.) Oracles are unaffected: DuckDB recomputes
    * from raw text, and the hash-verified jaccard equals the
    * string-verified one (hashing preserves set cardinalities w.h.p.).
    *
    * The per-(session, key) memo keeps repeated queries from re-listing
    * the directory. */
  private val artifactMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]
  private val artifactLock = new Object
  /** Bump whenever the BUILD LOGIC of any artifact changes (edits to
    * Dedup / Similarity / Quantization / this file): the version is part
    * of the on-disk path, so parquet written by an older build is never
    * silently reused across JVMs — the gates would otherwise validate
    * stale results. The derived-artifact CHAIN all rides this one
    * version (residual_codes <- ivf_centroids + residual_codebooks;
    * ivfpq_codes <- ivf_centroids + pq_codebooks; pq_codes <-
    * pq_codebooks_i2; ivf_centroids_base <- ivfTrain), so an edit to
    * trainPq / encodePq / ivfTrain / encode WITHOUT a bump silently
    * reuses stale coded corpora that the oracle then "confirms" (it
    * reads the same stale parquet) — advisor, round 19. */
  private[graft] val ArtifactVersion = 7
  private def artifactRoot(dir: String): String =
    s"target/prepared/pipeline/v$ArtifactVersion/" +
      dir.replaceAll("[^A-Za-z0-9.]+", "_")
  private def artifactPath(dir: String, name: String): String =
    s"${artifactRoot(dir)}/$name"

  /** Placeholder in oracle SQL for the corpus's absolute artifact root:
    * oracles of entries whose trained state is parquet-persisted (the
    * residual IVF+PQ index) read that state instead of unrolling the
    * training — [[graft.Verify]] substitutes the token per sfDir before
    * dumping oracle_sql.json, so the DuckDB gate sees a plain path. */
  private[graft] val ArtifactToken = "__GRAFT_PIPELINE_ART__"
  private[graft] def resolveOracle(sql: String, dir: String): String =
    sql.replace(ArtifactToken,
      new java.io.File(artifactRoot(dir)).getAbsolutePath)
  private def artifact(s: SparkSession, dir: String, name: String)
                      (build: => DataFrame): DataFrame = {
    val key = s.sparkContext.applicationId + ":" + dir + ":" + name
    // NOT computeIfAbsent: artifact builds are recursive (pair_counts
    // builds from docSigs, which re-enters this map under a different
    // key), and a nested computeIfAbsent on the same ConcurrentHashMap
    // throws IllegalStateException("Recursive update") or livelocks when
    // the keys land in the same bin. get + reentrant-synchronized build +
    // put: nested lookups never run inside a CHM mapping function.
    val hit = artifactMemo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = artifactMemo.get(key)
      if (again != null) return again
      val path = artifactPath(dir, name)
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        build.write.mode("overwrite")
          .option("compression", "zstd").parquet(path)
      // Session-lifetime persist of the scan: artifacts are corpus-
      // constant inputs shared by several entries per pass, and lazy —
      // blocks materialize on first use and stay resident across passes.
      // Deliberately NOT Dedup.pooledPersist: Bench releases pooled
      // intermediates between passes to measure the operator, but
      // re-reading a constant index table per pass is not part of any
      // operator's cost (round-8 bench showed +31% on the blocked
      // jaccard from exactly that re-read).
      val df = s.read.parquet(path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      artifactMemo.put(key, df)
      df
    }
  }

  /** Hashed-shingle signature table (Dedup.signatures): the headline
    * dedup queries (minhash, exact/blocked n-gram jaccard, clusters) all
    * start from it, so the tokenize+shingle+hash corpus scan — the
    * single most expensive dedup stage — runs once per corpus ever
    * (~16 bytes/shingle on disk: trivial next to the corpus). */
  private def docSigs(s: SparkSession, dir: String): DataFrame =
    artifact(s, dir, "signatures")(
      Dedup.signatures(docs(s, dir), "doc_id", "text", n = 3))

  /** Replica-fraction gate for the MinHash exact-replica pre-pass,
    * measured ONCE per (session, corpus) off the persisted signature
    * artifact's `g` digest. The fraction is a corpus constant; leaving
    * the decision to [[Dedup.minhashPairsFromSigs]]'s adaptive default
    * would re-pay a 2-stage aggregate + collect on EVERY query execution
    * (bench r11: +0.5 s per warm dedup_minhash pass at sf0.1). */
  private val replicaGateMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]
  private def replicaGate(s: SparkSession, dir: String): Boolean =
    replicaGateMemo.computeIfAbsent(
      s.sparkContext.applicationId + ":" + dir,
      _ => {
        import org.apache.spark.sql.types.DoubleType
        val row = docSigs(s, dir)
          .agg(count(lit(1)).cast(DoubleType),
            count_distinct(col("g")).cast(DoubleType)).collect()(0)
        java.lang.Boolean.valueOf(row.getDouble(1) <= 0.8 * row.getDouble(0))
      }).booleanValue()

  /** Shared-shingle pair-count table (Dedup.pairCountsFromSigs over
    * [[docSigs]]): the inverted-index self-join + count aggregation is
    * the single expensive stage behind EVERY set-overlap near-dup
    * measure — exact Jaccard (two thresholds: the 0.3 report and the
    * 0.5 cluster edges) and containment all filter these five integer
    * columns. One written join pays for all of them; each measure is
    * then a codegen'd arithmetic filter over a parquet scan. */
  private def docPairCounts(s: SparkSession, dir: String): DataFrame =
    artifact(s, dir, "pair_counts")(
      Dedup.pairCountsFromSigs(docSigs(s, dir)))

  /** Verified near-dup pair table (exact jaccard >= 0.5 over
    * [[docPairCounts]]): cluster resolution and representative
    * materialization both consume exactly this pair set — the written
    * `pairs/` artifact of a cluster-scale dedup pipeline. */
  private def jaccardPairs05(s: SparkSession, dir: String): DataFrame =
    artifact(s, dir, "pairs_j05")(
      Dedup.jaccardFromPairCounts(docPairCounts(s, dir), threshold = 0.5))

  /** Shingle document-frequency table over the exact-text
    * REPRESENTATIVES of [[docSigs]] (Dedup.repSignatures): the blocked
    * jaccard's candidate filter and the stop-shingle profile both read
    * this |vocab| table. Rep-based since round 13 — the blocked
    * contract counts df over distinct-text representatives, so replica
    * factors never inflate a shingle past dfCap. */
  private def docShingleDf(s: SparkSession, dir: String): DataFrame =
    artifact(s, dir, "shingle_df")(
      Dedup.shingleDocFreq(Dedup.repSignatures(docSigs(s, dir))._2))

  /** Shared rep-collapse index over [[docSigs]] — three prepare-once
    * artifacts (round 20) consumed by every rep-based set-overlap pass
    * (blocked jaccard, stop-profile pairs, stop-profile families):
    * `rep_map` (g, id, cnt), `rep_sigs` (id, hs), and `rep_inverted`
    * (id, g, c) — the df-CLASSIFIED inverted index (rep-based df >= 2).
    * Before round 20 each invocation re-derived all three per pass
    * (a corpus aggregate + a join + an explode-join-persist); both the
    * rare-candidate branch (c <= dfCap) and the stop-profile branch
    * (c > dfCap) are now filters over the persisted classified index —
    * the [[docShingleDf]]/[[docPairCounts]] discipline. Cap-agnostic:
    * the operators apply their own dfCap filters, so blocked (cap 10)
    * and the stop passes (cap 5) read the same three tables. */
  private val repIdxMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Dedup.RepIndex]
  private def repIndex(s: SparkSession, dir: String): Dedup.RepIndex = {
    val key = s.sparkContext.applicationId + ":" + dir
    val hit = repIdxMemo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = repIdxMemo.get(key)
      if (again != null) return again
      val rep = artifact(s, dir, "rep_map")(
        Dedup.repSignatures(docSigs(s, dir))._1)
      val repSigs = artifact(s, dir, "rep_sigs")(
        Dedup.repSignatures(docSigs(s, dir))._2)
      val inverted = artifact(s, dir, "rep_inverted")(
        repSigs.select(col("id"), explode(col("hs")).as("g"))
          .join(docShingleDf(s, dir).filter(col("c") >= 2), Seq("g"))
          .select(col("id"), col("g"), col("c")))
      val v = Dedup.RepIndex(rep, repSigs, inverted)
      repIdxMemo.put(key, v)
      v
    }
  }

  /** IVF index (Lloyd-trained centroids + bucketed corpus) — index
    * TRAINING is prepare-phase work written once per corpus
    * (`ivf_centroids`, `ivf_buckets`); the per-query cost is nprobe
    * bucket joins + exact re-rank. Centroids are nlist x dim — bounded
    * driver state by contract, collected from the written table. */
  // NOT computeIfAbsent, for all three trained-state memos below: the
  // build closures run Spark actions and re-enter artifact() (and could
  // re-enter EACH OTHER from a future artifact build), and a nested
  // re-entry inside a ConcurrentHashMap mapping function throws
  // IllegalStateException("Recursive update") or livelocks. Same
  // get + reentrant-synchronized-build + put discipline as artifact()
  // itself, on the same lock (reentrant, so artifact() calls inside the
  // build are safe).
  private val ivfMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Seq[Float]], DataFrame)]
  private def ivfIndex(s: SparkSession, dir: String): (Array[Seq[Float]], DataFrame) = {
    val key = s.sparkContext.applicationId + ":" + dir
    val hit = ivfMemo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = ivfMemo.get(key)
      if (again != null) return again
      val centDf = artifact(s, dir, "ivf_centroids") {
        val trained = Similarity.ivfTrain(embeddings(s, dir),
          "vec_id", "embedding", nlist = 16, iters = 3)
        import s.implicits._
        trained.toSeq.zipWithIndex
          .map { case (v, i) => (i, v) }.toDF("bucket", "centroid")
      }
      val cent: Array[Seq[Float]] = centDf.orderBy(col("bucket"))
        .select(col("centroid")).collect().map(_.getSeq[Float](0))
      val bucketed = artifact(s, dir, "ivf_buckets")(
        Similarity.ivfBucketedCorpus(embeddings(s, dir),
          "vec_id", "embedding", cent))
      val v = (cent, bucketed)
      ivfMemo.put(key, v)
      v
    }
  }
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    graft.sources.ParquetNanos.read(s, s"$dir/embeddings.parquet")

  /** IVF centroids trained on ann_ivf_increment's BASE slice
    * (vec_id % 10 >= 2) — prepare-phase artifact (`ivf_centroids_base`,
    * round 20): the increment entry previously re-ran the full Lloyd
    * training (init collect + 3 rounds, a driver aggregate+collect per
    * round) on EVERY invocation; the nightly-append query path only
    * ASSIGNS the increment to the existing centroids. Same
    * write/collect-back discipline as [[ivfIndex]]: every value is
    * float-representable (float-rounded Lloyd means; init vectors are
    * corpus floats), so the parquet round trip is bit-exact and the
    * DuckDB oracle reads literally the same trained state. */
  private val ivfBaseMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Seq[Float]]]
  private def ivfBaseCentroids(s: SparkSession, dir: String): Array[Seq[Float]] = {
    val key = s.sparkContext.applicationId + ":" + dir
    val hit = ivfBaseMemo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = ivfBaseMemo.get(key)
      if (again != null) return again
      val centDf = artifact(s, dir, "ivf_centroids_base") {
        val trained = Similarity.ivfTrain(
          embeddings(s, dir).filter(pmod(col("vec_id"), lit(10)) >= 2),
          "vec_id", "embedding", nlist = 16, iters = 3)
        import s.implicits._
        trained.toSeq.zipWithIndex
          .map { case (v, i) => (i, v) }.toDF("bucket", "centroid")
      }
      val cent: Array[Seq[Float]] = centDf.orderBy(col("bucket"))
        .select(col("centroid")).collect().map(_.getSeq[Float](0))
      ivfBaseMemo.put(key, cent)
      cent
    }
  }

  /** Residual-PQ codebooks over the [[ivfIndex]] centroids (the FAISS
    * IndexIVFPQ trained state), persisted as `residual_codebooks`
    * (s, j, cent: array<double>) and COLLECTED BACK from the written
    * table, so the engine and the DuckDB oracle consume literally the
    * same parquet state — every codebook value is float-representable
    * (trainPq float-rounds means; init subvectors are corpus floats), so
    * the write/read round trip is bit-exact. m*k*(dim/m) doubles: driver
    * state stays codebook-sized by contract. */
  private val residualCbMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Array[Double]]]]
  private def residualCodebooks(s: SparkSession, dir: String,
                                cent: Array[Seq[Float]]): Array[Array[Array[Double]]] = {
    val key = s.sparkContext.applicationId + ":" + dir
    val hit = residualCbMemo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = residualCbMemo.get(key)
      if (again != null) return again
      val cbDf = artifact(s, dir, "residual_codebooks") {
        val trained = graft.operators.Quantization.trainResidualCodebooks(
          embeddings(s, dir), "vec_id", "embedding", cent,
          m = 8, kCodes = 16, iters = 3)
        import s.implicits._
        trained.zipWithIndex.flatMap { case (sub, si) =>
          sub.zipWithIndex.map { case (cw, j) => (si, j, cw.toSeq) }
        }.toSeq.toDF("s", "j", "cent")
      }
      val rows = cbDf.collect()
      val m = rows.map(_.getInt(0)).max + 1
      val kk = rows.map(_.getInt(1)).max + 1
      // completeness: a truncated/partial artifact read would otherwise
      // leave null cells surfacing as an opaque NPE far from the cause
      // (advisor, round 19)
      require(rows.length == m * kk,
        s"residual_codebooks incomplete: ${rows.length} rows for ${m}x$kk")
      val out = Array.ofDim[Array[Double]](m, kk)
      rows.foreach { r =>
        out(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      residualCbMemo.put(key, out)
      out
    }
  }

  /** Plain (non-residual) PQ codebooks over the corpus vectors,
    * persisted per (artifact name, iters) as `(s, j, cent:
    * array<double>)` and COLLECTED BACK from the written table — the
    * [[residualCodebooks]] discipline: every value is
    * float-representable (trainPq float-rounds means; init subvectors
    * are corpus floats), so the write/read round trip is bit-exact and
    * the DuckDB oracle consumes literally the same parquet state.
    * Two instances exist because two entries trained with different
    * iteration counts long before the artifacts did: `pq_codebooks`
    * (iters=3, ann_ivfpq_topk) and `pq_codebooks_i2` (iters=2,
    * ann_pq_topk) — the artifact must reproduce each entry's historical
    * values exactly. */
  private val pqCbMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Array[Double]]]]
  private def pqCodebooksAt(s: SparkSession, dir: String,
                            name: String, iters: Int): Array[Array[Array[Double]]] = {
    val key = s.sparkContext.applicationId + ":" + dir + ":" + name
    val hit = pqCbMemo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = pqCbMemo.get(key)
      if (again != null) return again
      val cbDf = artifact(s, dir, name) {
        val trained = graft.operators.Quantization.trainPq(
          embeddings(s, dir), "vec_id", "embedding", m = 8, k = 16,
          iters = iters)
        import s.implicits._
        trained.zipWithIndex.flatMap { case (sub, si) =>
          sub.zipWithIndex.map { case (cw, j) => (si, j, cw.toSeq) }
        }.toSeq.toDF("s", "j", "cent")
      }
      val rows = cbDf.collect()
      val m = rows.map(_.getInt(0)).max + 1
      val kk = rows.map(_.getInt(1)).max + 1
      // completeness: a truncated/partial artifact read would otherwise
      // leave null cells surfacing as an opaque NPE far from the cause
      // (advisor, round 19)
      require(rows.length == m * kk,
        s"$name incomplete: ${rows.length} rows for ${m}x$kk")
      val out = Array.ofDim[Array[Double]](m, kk)
      rows.foreach { r =>
        out(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      pqCbMemo.put(key, out)
      out
    }
  }
  private def pqCodebooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqCodebooksAt(s, dir, "pq_codebooks", iters = 3)

  /** Flat-PQ code table for ann_pq_topk — `(n_id, codes)` persisted once
    * per corpus (`pq_codes`) from the iters=2 codebooks; the flat ADC
    * scan reads this instead of re-encoding the corpus per query. */
  private def pqCoded2(s: SparkSession, dir: String)
      : (Array[Array[Array[Double]]], DataFrame) = {
    val cb = pqCodebooksAt(s, dir, "pq_codebooks_i2", iters = 2)
    val codes = artifact(s, dir, "pq_codes")(
      embeddings(s, dir).select(col("vec_id").as("n_id"),
        graft.operators.Quantization.encodePq(col("embedding"), cb)
          .as("codes")))
    (cb, codes)
  }

  /** IVF+PQ coded corpus — `(n_id, bucket, codes)` persisted once per
    * corpus (`ivfpq_codes`), built from the shared [[ivfIndex]] centroids
    * and [[pqCodebooks]]. Round-19: ann_ivfpq_topk previously re-TRAINED
    * both quantizers and re-ENCODED the whole corpus on every invocation
    * (the exact shape the round-16 int8 finding prescribed away); the
    * query path now scans this narrow code table and re-ranks only the
    * refine*k shortlist against the float vectors. Buckets and codes are
    * deterministic integer functions of persisted float state, so the
    * write/read round trip is exact. */
  private def ivfPqCoded(s: SparkSession, dir: String)
      : (Array[Seq[Float]], Array[Array[Array[Double]]], DataFrame) = {
    val (cent, _) = ivfIndex(s, dir)
    val cb = pqCodebooks(s, dir)
    val coded = artifact(s, dir, "ivfpq_codes")(
      graft.operators.Quantization.pqCodedCorpus(
        embeddings(s, dir), "vec_id", "embedding", cent, cb))
    (cent, cb, coded)
  }

  /** Residual IVF+PQ coded corpus — `(n_id, bucket, codes)` persisted
    * once per corpus (`residual_codes`) from the shared [[ivfIndex]]
    * centroids and [[residualCodebooks]]; same round-19 rationale as
    * [[ivfPqCoded]] (the residual entry persisted only its TRAINED state
    * and still re-assigned + re-encoded the corpus per query). */
  private def residualCoded(s: SparkSession, dir: String,
                            cent: Array[Seq[Float]],
                            cb: Array[Array[Array[Double]]]): DataFrame =
    artifact(s, dir, "residual_codes")(
      graft.operators.Quantization.residualCodedCorpus(
        embeddings(s, dir), "vec_id", "embedding", cent, cb))

  /** Int8 scalar-quantization index: per-dim (min, max) ranges and the
    * ENCODED CODE COLUMN, both parquet-persisted at artifact-build time
    * (the `ivf_centroids` discipline). Quantization is prepare-phase
    * work paid once per corpus — the query path scans the 4x-smaller
    * code table and never re-encodes (round-16 judge finding #2: the
    * previous per-query re-encode made ann_int8_topk the one
    * comparable-workload bench row >2x its DuckDB twin). Ranges are
    * collected back from the WRITTEN table so the engine's plan
    * literals and the DuckDB oracle consume literally the same state
    * (every value is float-representable — corpus float min/max — so
    * the write/read round trip is bit-exact). */
  private val int8Memo = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[(Double, Double)], DataFrame)]
  private def int8Index(s: SparkSession, dir: String): (Array[(Double, Double)], DataFrame) = {
    val key = s.sparkContext.applicationId + ":" + dir
    val hit = int8Memo.get(key)
    if (hit != null) return hit
    artifactLock.synchronized {
      val again = int8Memo.get(key)
      if (again != null) return again
      val rangeDf = artifact(s, dir, "int8_ranges") {
        val tr = graft.operators.Quantization.trainRanges(
          embeddings(s, dir), "embedding")
        import s.implicits._
        tr.zipWithIndex.map { case ((mn, mx), i) => (i, mn, mx) }.toSeq
          .toDF("pos", "mn", "mx")
      }
      val rows = rangeDf.collect()
      val ranges = new Array[(Double, Double)](rows.length)
      rows.foreach(r => ranges(r.getInt(0)) = (r.getDouble(1), r.getDouble(2)))
      val codes = artifact(s, dir, "int8_codes")(
        embeddings(s, dir).select(col("vec_id").as("n_id"),
          graft.operators.Quantization.encode(col("embedding"), ranges)
            .as("codes")))
      val v = (ranges, codes)
      int8Memo.put(key, v)
      v
    }
  }

  /** Hash-sharded greedy sequence packing over (doc_id, lang, n_tokens):
    * route each doc to a deterministic shard (portable md5-56 of doc_id
    * mod [[PackShards]]), run the streaming first-fit running sum per
    * (lang, shard), and mint a globally-unique pack_id = shard * 2^32 +
    * local pack index. The window key has cardinality |langs| x shards,
    * so no single reducer ever sorts the corpus — the per-lang variant
    * of this window is the classic 100 TB scale-killer. */
  private val PackShards = 32
  private def packGreedy(docsTok: DataFrame, budget: Double = 2048.0): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsTok
      .withColumn("shard",
        pmod(Dedup.portableHash56(col("doc_id")), lit(PackShards.toLong)))
      .withColumn("cs", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("shard"),
        (col("shard") * lit(4294967296L) +
          floor((col("cs") - col("n_tokens")) / lit(budget)).cast(LongType))
          .as("pack_id"))
  }
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.schema.DirCatalog(dir).table(s, "events")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------------ text analysis

    "text_token_count" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextAnalysis.tokenCountBpe(col("text")).as("n_tokens_bpe"))),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScored(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("quality"), 4).as("quality"))),

    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    // classifier-eval confusion matrix for the language-ID heuristic
    // against the corpus's labeled lang — one groupBy over the corpus;
    // |langs|² output rows at any scale
    "text_langid_confusion" -> ((s, dir) =>
      docs(s, dir).select(col("lang"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp"))),

    // rolling winnowing sketch over md5-56 k-gram hashes (engine-portable
    // — the DuckDB oracle recomputes the identical sketch)
    "text_winnowing" -> ((s, dir) =>
      TextAnalysis.winnowingSketch(docs(s, dir), "text", "sketch",
          portableHash = true)
        .select(col("doc_id"),
          size(col("sketch")).cast(LongType).as("n_sketch"),
          array_min(col("sketch")).as("sketch_min"))),

    // GPT-2-style pre-tokenizer segment counting (RE2-safe regex, so the
    // oracle segments identically)
    "text_token_bpe_regex" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCountBpeRegex(col("text")).as("n_segments"))),

    // int8-quantized embeddings: codes + reconstruction fidelity
    "ext_quantize_int8" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val ranges = graft.operators.Quantization.trainRanges(e, "embedding")
      e.select(col("vec_id"),
          graft.operators.Quantization.encode(col("embedding"), ranges).as("codes"),
          col("embedding"))
        .select(col("vec_id"),
          element_at(col("codes"), 1).as("c0"),
          element_at(col("codes"), 2).as("c1"),
          round(Similarity.cosine(col("embedding"), col("embedding")), 4).as("self_cos"),
          round(graft.operators.Quantization.cosineQuantized(
            col("codes"), col("codes"), ranges), 4).as("self_cos_q"))
    }),

    // PII profile: URL/email occurrence counts + scrubbed-content md5
    "text_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiProfile(docs(s, dir), "doc_id", "text")),

    // benchmark decontamination: docs sharing any 8-gram with the
    // "benchmark" slice (doc_id < 100 stands in for a benchmark corpus).
    // Excludes the benchmark docs themselves (trivially contaminated).
    "text_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationCounts(
          d.filter(col("doc_id") >= 100), "doc_id", "text",
          d.filter(col("doc_id") < 100), "doc_id", "text", n = 8)
        .select(col("id").as("doc_id"), col("n_contaminated"))
    }),

    // decontamination SCALE PATH: Bloom-filter candidate pre-pass
    // (bounded driver/broadcast state, ~1.2 bytes per benchmark n-gram)
    // + the same exact verify join. Result-identical to
    // text_decontaminate by the no-false-negative Bloom contract, so the
    // oracle is the identical exact-overlap SQL.
    "text_decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationCountsBloom(
          d.filter(col("doc_id") >= 100), "doc_id", "text",
          d.filter(col("doc_id") < 100), "doc_id", "text", n = 8)
        .select(col("id").as("doc_id"), col("n_contaminated"))
    }),

    // Gopher-style quality rules: word count, mean word length,
    // alphabetic-word ratio, stopword presence, combined pass flag
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherSignals(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_words"), col("mean_word_len"),
          col("alpha_ratio"), col("n_stopwords"), col("pass"))),

    // repetition signals: duplicate-token ratio, top-token share,
    // duplicate-bigram ratio (C4/Gopher repetition filters)
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tok"), col("dup_tok_ratio"),
          col("top_tok_share"), col("dup_bigram_ratio"))),

    // lateral view / table generator: positional token explode (first 5
    // tokens per doc) — generator output stays inside whole-stage codegen
    "ext_posexplode" -> ((s, dir) =>
      docs(s, dir).filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(slice(TextAnalysis.tokens(col("text")), 1, 5)))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          col("col").as("tok"))),

    // sequence packing: greedy contiguous fill of a 2048-token budget
    // (the LLM-pretraining batching primitive). Documents are first
    // routed to one of 32 deterministic hash shards (portable md5-56 of
    // doc_id, so the oracle replays the routing), then packed per
    // (lang, shard) with pack_id = floor((cumsum - n) / budget) — the
    // streaming first-fit approximation. Language cardinality is tiny,
    // so a per-lang window would funnel the whole corpus through ONE
    // reducer at scale; the hash shard makes the running sum
    // embarrassingly parallel (|langs| x 32 independent partitions,
    // and nShards scales with the cluster) while each shard is still a
    // valid greedy first-fit stream. pack_id = shard * 2^32 + local id
    // keeps ids globally unique.
    "ext_pack_sequences" -> ((s, dir) =>
      packGreedy(docs(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens")))),

    // flagship composition — the full curation funnel in ONE declarative
    // plan: quality gate (Gopher signals with thresholds fit to the
    // synthetic corpus — no stopword gate, the fake text has none) ∧
    // language filter ∧ near-dup removal (keep cluster representatives,
    // via the shared materialized pair table) → greedy 2048-token
    // sequence packing of the survivors. Every stage is an operator
    // oracled on its own elsewhere; this entry proves they COMPOSE —
    // one Catalyst plan, no intermediate materialization beyond the
    // shared pair table.
    "pipeline_curate_pack" -> ((s, dir) => {
      val d = docs(s, dir)
      // Persist the NARROW signals table before filtering: predicate
      // pushdown otherwise substitutes the quality gates' aliases
      // through the signals projection and re-tokenizes the corpus once
      // per condition (measured 2.0 s vs 0.3 s for the same signals at
      // the 10x fixture — Staging.bound stops CollapseProject but not
      // PushDownPredicates). The cached rows are (id, 3 numbers): tiny
      // at any corpus size. n_words doubles as the packing token count
      // (tokenCount IS size(tokens(text)) — same expression), so the
      // whole entry tokenizes the corpus exactly once.
      val gop = Dedup.pooledPersist(
        TextAnalysis.gopherSignals(d, "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_words"),
            col("mean_word_len"), col("alpha_ratio")))
      val passTok = gop
        .filter(col("n_words") >= 50 &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_ratio") >= 0.8)
        .select(col("doc_id"), col("n_words").cast(LongType).as("n_tokens"))
      val dropIds = Dedup.clusters(jaccardPairs05(s, dir))
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      val keep = d.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
        .join(passTok, "doc_id")
        .join(dropIds, Seq("doc_id"), "left_anti")
      // hash-sharded greedy packing (see ext_pack_sequences): the lang
      // filter above collapses the corpus to ONE language, so a per-lang
      // window here would be a single-reducer sort of everything kept
      packGreedy(keep).select(col("doc_id"), col("n_tokens"),
        col("shard"), col("pack_id"))
    }),

    // corpus vocabulary: top-100 tokens by frequency
    "text_term_freq" -> ((s, dir) =>
      TextAnalysis.termFrequencies(docs(s, dir), "text", 100)),

    // bigram-LM quality score (the KenLM-style step up from the unigram
    // entry): per-doc mean negative log of p(w2|w1) = c(w1 w2)/c(w1),
    // context counts over every non-final token. The bigram vocabulary
    // is far larger than the unigram one, so the logprob table joins by
    // SHUFFLE on the pair key (never broadcast); terms are quantized to
    // 1e-6 integers before the per-doc sum (order-free, cross-engine
    // exact). Docs with <2 tokens have no bigrams and drop out.
    "text_bigram_logprob" -> ((s, dir) => {
      // native bigrams (TokenOps.bigrams) exploded straight off the scan:
      // the explode drops 0/1-token docs for free, so no size filter
      // re-evaluates the computed token column (the PushDownPredicates
      // trap), and the context counts derive from the SAME exploded
      // bigrams — a bigram's first component IS a non-final token, so the
      // old second corpus scan + slice explode was counting the identical
      // multiset
      val pairs = docs(s, dir).select(col("doc_id"),
        explode(graft.functions.TokenOps.bigrams(
          graft.functions.TokenOps.tokens(lower(col("text"))))).as("pair"))
      val ctx = pairs
        .select(substring_index(col("pair"), " ", 1).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val bi = pairs.groupBy(col("pair")).agg(count(lit(1)).as("c12"))
      val lp = bi.join(ctx, substring_index(col("pair"), " ", 1) === col("w1"))
        .select(col("pair"),
          round(log(col("c12").cast(DoubleType) / col("c1").cast(DoubleType))
            * lit(1000000.0), 0).cast(LongType).as("q"))
      // hashed final join: only (doc_id, 8-byte key) ride the wide
      // exchange, never the bigram strings
      pairs.select(col("doc_id"), xxhash64(col("pair")).as("h"))
        .join(lp.select(xxhash64(col("pair")).as("h"), col("q")), "h")
        .groupBy(col("doc_id"))
        .agg(round(-sum(col("q")).cast(DoubleType) /
            (count(lit(1)).cast(DoubleType) * lit(1000000.0)), 4).as("nll2"),
          count(lit(1)).as("n_bigrams"))
    }),

    // two unrolled BPE merge rounds — the tokenizer-TRAINER loop as
    // relational passes: each round finds the corpus-wide top adjacent
    // pair (total order: count desc, pair asc; a 1-row driver scalar,
    // like graph_pagerank's node count) and merges every left-to-right
    // non-overlapping occurrence corpus-wide via plain string replace
    // over a double-spaced canonical form (each gap widens to two
    // spaces, so one match's consumed boundary never starves an
    // adjacent match; the \s+ tokenizer re-normalizes). Output: top-20
    // vocabulary after 2 merges. The oracle replays both rounds with
    // scalar subqueries.
    "text_bpe_merge2" -> ((s, dir) => {
      // bigrams + the merge step are native single passes over the token
      // array (TokenOps.bigrams / bpeMergePair — the HOF zip_with pair
      // build and the padded double-space replace + re-tokenize chain
      // they replaced are pinned equivalent by ShingleSigsPropertySpec);
      // explode drops the empty bigram arrays of 0/1-token docs, so no
      // size filter re-evaluates the computed column
      def pairsOf(d: DataFrame): DataFrame =
        d.select(explode(graft.functions.TokenOps.bigrams(col("t"))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      def topPair(d: DataFrame): String =
        pairsOf(d).orderBy(col("cnt").desc, col("pair").asc)
          .limit(1).collect()(0).getString(0)
      def merged(d: DataFrame, pair: String): DataFrame = {
        val Array(w1, w2) = pair.split(" ", 2)
        d.select(graft.functions.TokenOps
          .bpeMergePair(col("t"), w1, w2).as("t"))
      }
      val t0 = docs(s, dir)
        .select(TextAnalysis.tokens(lower(col("text"))).as("t"))
      val t1 = merged(t0, topPair(t0))
      val t2 = merged(t1, topPair(t1))
      t2.select(explode(col("t")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(20)
    }),

    // CCNet-style unigram LM quality score: corpus unigram probabilities
    // -> per-doc mean negative log-likelihood (low = fluent under the
    // corpus distribution, high = outlier). One shuffle to count terms;
    // the corpus total is a 1-row aggregate broadcast back onto the
    // |vocab| table (NEVER a Window.partitionBy() — an empty-key window
    // funnels the whole vocabulary, billions of rows at web scale,
    // through one partition); the |vocab|-row logprob table joins the
    // exploded corpus WITHOUT a broadcast hint — a whitespace-token web
    // vocabulary (typos, URLs) is 10^8-10^9 rows, past any broadcast
    // threshold, so the hint would OOM the driver before the plan runs;
    // AQE still broadcasts it when the runtime size fits (as it does at
    // test scale), matching text_bigram_logprob's stated rationale.
    // Log-probs are quantized to 1e-6 integers
    // BEFORE the per-doc sum so the aggregation is exact and order-free
    // (a double sum re-associates across partitions and can flip the
    // 4dp output between engines — the emb_label_centroid precedent).
    "text_unigram_logprob" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val tot = counts.agg(sum(col("c")).as("t"))
      val lp = counts.crossJoin(broadcast(tot))
        .select(col("token"),
          round(log(col("c").cast(DoubleType) / col("t").cast(DoubleType))
            * lit(1000000.0), 0).cast(LongType).as("q"))
      // the wide join back onto the exploded corpus carries 8-byte
      // xxhash64 keys, not the token strings (same collision-irrelevance
      // argument as every hash-verified dedup join); the narrow vocab
      // aggregations above still group by the string
      toks.select(col("doc_id"), xxhash64(col("token")).as("h"))
        .join(lp.select(xxhash64(col("token")).as("h"), col("q")), "h")
        .groupBy(col("doc_id"))
        .agg(round(-sum(col("q")).cast(DoubleType) /
            (count(lit(1)).cast(DoubleType) * lit(1000000.0)), 4).as("nll"),
          count(lit(1)).as("n_tok"))
    }),

    // domain skew: KL(source || corpus) over token distributions — how
    // far each source's language drifts from the corpus mix (the
    // domain-weighting diagnostic next to ext_domain_mix). Totals are
    // 1-row / |sources|-row aggregates broadcast back onto the vocab
    // tables (never an empty-key or per-source window — either funnels
    // the per-source vocabulary through one partition at scale); the
    // corpus-probability table itself is |vocab| rows (unbounded at web
    // scale) so its join carries NO broadcast hint — AQE broadcasts it
    // only when the runtime size actually fits; KL
    // terms are quantized to 1e-9 integers before the sum so the
    // per-source aggregation is exact and order-free across engines.
    "text_source_divergence" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("source"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val tot = counts.agg(sum(col("c")).as("t"))
      val corpus = counts.crossJoin(broadcast(tot))
        .select(col("token"),
          (col("c").cast(DoubleType) / col("t").cast(DoubleType)).as("p"))
      val perCnt = toks.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("cs"))
      val perTot = perCnt.groupBy(col("source")).agg(sum(col("cs")).as("ts"))
      val perSrc = perCnt.join(broadcast(perTot), "source")
        .select(col("source"), col("token"),
          (col("cs").cast(DoubleType) / col("ts").cast(DoubleType)).as("ps"))
      perSrc.join(corpus, "token")
        .select(col("source"),
          round(col("ps") * log(col("ps") / col("p")) * lit(1000000000.0), 0)
            .cast(LongType).as("q"))
        .groupBy(col("source"))
        .agg(round(sum(col("q")).cast(DoubleType) / lit(1000000000.0), 4)
            .as("kl"),
          count(lit(1)).as("n_terms"))
    }),

    // corpus-wide adjacent-token-pair frequencies — the statistic a
    // BPE/WordPiece trainer computes per merge iteration (word-level
    // here). Top-50 under a TOTAL order (cnt desc, pair asc) so the
    // cut is deterministic; the shuffle carries (pair, partial-count),
    // never token arrays
    "text_bpe_pairs" -> ((s, dir) => {
      import graft.functions.Staging.bound
      val toks = docs(s, dir)
        .select(TextAnalysis.tokens(lower(col("text"))).as("t"))
        .filter(size(col("t")) >= 2)
      toks.select(explode(bound(col("t"))(t =>
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(50)
    }),

    // per-doc top-3 TF-IDF terms (docs with id < 50 to bound output)
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfIdfTopTerms(docs(s, dir), "doc_id", "text", 3)
        .filter(col("id") < 50)),

    // -------------------------------------------------------------- dedup

    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairsFromSigs(docSigs(s, dir),
        numHashes = 32, rowsPerBand = 2, threshold = 0.5,
        replicaGate = Some(replicaGate(s, dir)))),

    // portable md5-56 signature: the oracle recomputes signatures + all
    // pairs; banding recall for hamming<=3 is GUARANTEED (pigeonhole over
    // 4 bands), so candidate pruning cannot change the output
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(moduloCap(docs(s, dir), "doc_id", 5000L, Some(dir + ":documents")),
          "doc_id", "text", maxHamming = 3,
          portableHash = true)
        .select(col("a_id"), col("b_id"),
          col("hamming").cast(LongType).as("hamming"))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardFromPairCounts(docPairCounts(s, dir), threshold = 0.3)),

    // scale path: df-capped candidate blocking, exact verification.
    // dfCap=10 measured at sf0.1: 2.8x fewer candidate-join rows than
    // cap 30 at full recall (256/256 true pairs — near-dups share many
    // LOW-df shingles, so the cap prunes only non-dup pair fanout)
    "dedup_ngram_blocked" -> ((s, dir) =>
      Dedup.ngramJaccardPairsBlockedFromSigs(docSigs(s, dir),
        threshold = 0.3, dfCap = 10,
        docFreq = Some(docShingleDf(s, dir)),
        index = Some(repIndex(s, dir)))),

    // the df-cap's measured honest boundary (round-17 hot-shingle rung):
    // pairs whose similarity lives ONLY on above-cap shingles — the
    // boilerplate class (navigation chrome, license headers) — are
    // invisible to the capped generator. This pass recovers them:
    // bucket docs by their exact above-cap shingle PROFILE, verify true
    // jaccard within buckets. blocked ∪ stop_profile covers both sides
    // of a cap; this entry's cap is 5 (not blocked's 10) because the
    // sf0.01 corpus has NO df>10 shingle at all — a cap-10 twin would be
    // trivially-green 0 rows, exactly the weak-check class the gates
    // exist to avoid (measured: cap 5 → 13 verified rep pairs at
    // sf0.01, 241 at sf0.1). The shared shingle_df artifact is
    // cap-agnostic (raw rep-based counts; the operator applies the cap),
    // so both entries read the same prepare-once table.
    "dedup_stop_profile" -> ((s, dir) =>
      Dedup.stopProfilePairsFromSigs(docSigs(s, dir),
        threshold = 0.3, dfCap = 5,
        docFreq = Some(docShingleDf(s, dir)), bucketCap = 1000,
        index = Some(repIndex(s, dir)))),

    // the family-level product the stop-profile pass's scale contract
    // prescribes for above-bucketCap boilerplate families (their pair
    // expansion is quadratic BY DEFINITION): the family itself —
    // (family_id = min member doc id, doc_id, family_size), linear at
    // any family size, no self-join, no cap, no lost mass. Same dfCap=5
    // basis and shared shingle_df artifact as dedup_stop_profile.
    "dedup_stop_profile_families" -> ((s, dir) =>
      Dedup.stopProfileFamilies(docSigs(s, dir), dfCap = 5,
        docFreq = Some(docShingleDf(s, dir)),
        index = Some(repIndex(s, dir)))),

    // exact sliding-window substring dup at arbitrary alignment —
    // catches cross-offset spans that dedup_chunks' aligned chunks miss
    "dedup_substrings" -> ((s, dir) =>
      Dedup.substringDupWindows(docs(s, dir), "doc_id", "text", w = 16,
        replicaGate = Some(replicaGate(s, dir)))),

    // exact-recall prefix-filtered pairs (PPJoin): the oracle is the
    // EXHAUSTIVE J>=0.7 pair set — passing proves zero recall loss
    "dedup_prefix" -> ((s, dir) =>
      Dedup.prefixJaccardPairs(moduloCap(docs(s, dir), "doc_id", 5000L, Some(dir + ":documents")),
        "doc_id", "text", n = 3, threshold = 0.7)),

    // exact all-pairs cosine — the VERIFICATION BASELINE for the banded
    // LSH scale path below (O(N^2); never the production path)
    "dedup_embedding_cosine" -> ((s, dir) =>
      Dedup.embeddingCosinePairs(moduloCap(embeddings(s, dir), "vec_id", 2000L, Some(dir + ":embeddings")),
        "vec_id", "embedding", threshold = 0.45)),

    // scale path: banded portable sign-LSH candidates + exact cosine
    // verify (one (band, bucket) shuffle instead of a crossJoin); the
    // oracle replays the identical banded contract (including the
    // corpus-size-derived band width), and PipelineSpec pins recall
    // against the exact baseline
    "dedup_embedding_lsh" -> ((s, dir) =>
      Similarity.lshCosinePairs(embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.45, bands = 16)),

    // SEMANTIC dedup end to end: connected components over the banded
    // embedding-LSH pair table — keep one representative per cluster of
    // mutually-similar embeddings (the SemDeDup shape: candidate
    // buckets -> verified pairs -> cluster resolution), composing the
    // two operators above; the oracle restates the same banded contract
    // plus a recursive-CTE closure
    "dedup_embedding_clusters" -> ((s, dir) =>
      Dedup.clusters(
        Similarity.lshCosinePairs(embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.45, bands = 16))),

    // duplicate-cluster resolution over exact near-dup pairs
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(jaccardPairs05(s, dir))),

    // near-dup graph analytics over the shared verified pair table:
    // node degrees (how duplicated is each doc) and triangle closure
    // (how clique-like the dup neighborhoods are — boilerplate families
    // triangulate, chain-shaped false-positive paths don't). Both are
    // plain joins/aggs over the O(|pairs|) edge list — never the corpus.
    "graph_degrees" -> ((s, dir) => {
      val p = jaccardPairs05(s, dir)
      p.select(col("a_id").as("id")).union(p.select(col("b_id").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    }),

    // triangles (a<b<c): two joins over the ordered edge list — each
    // wedge (a-b, b-c) is closed by probing the third edge (a,c)
    "graph_triangles" -> ((s, dir) => {
      val e = jaccardPairs05(s, dir).select(col("a_id"), col("b_id"))
      val e1 = e.select(col("a_id").as("a"), col("b_id").as("b"))
      val e2 = e.select(col("a_id").as("b"), col("b_id").as("c"))
      val e3 = e.select(col("a_id").as("a"), col("b_id").as("c"))
      e1.join(e2, "b").join(e3, Seq("a", "c"))
        .select(col("a"), col("b"), col("c"))
    }),

    // PageRank over the near-dup graph, 3 synchronous iterations at
    // damping 0.85 (which doc is the HUB of a boilerplate family). Each
    // iteration = one join edges->ranks + one groupBy — the classic
    // Pregel-as-joins shape; state per iteration is |nodes| rows, the
    // corpus never re-enters. The only driver-side value is the node
    // COUNT (one scalar). Oracle unrolls the same 3 iterations in SQL.
    // ACCEPTED FLOAT RISK: the per-node contribution sums are double
    // adds whose association order differs between engines; unlike the
    // quantized entries (emb_label_centroid, text_unigram_logprob) the
    // terms here feed the NEXT iteration, so quantizing would change
    // the algorithm. Node degrees are tiny (sums of <10 terms), so the
    // reassociation error ~1e-16 vs the 5e-5 rounding boundary — a
    // cross-engine 4dp flip needs a value within 1e-11 of a boundary.
    "graph_pagerank" -> ((s, dir) => {
      val p = jaccardPairs05(s, dir)
      val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint(true)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val n = deg.count()
      var pr = deg.select(col("src").as("id"), lit(1.0 / n).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(pr.select(col("id").as("src"), col("pr")), "src")
          .join(deg, "src")
          .select(col("dst").as("id"), (col("pr") / col("deg")).as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        pr = deg.select(col("src").as("id"))
          .join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
      }
      pr.select(col("id"), round(col("pr"), 4).as("pr"))
    }),

    // asymmetric containment near-dups: catches short docs embedded in
    // longer ones, which symmetric jaccard misses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentFromPairCounts(docPairCounts(s, dir), threshold = 0.8)),

    // incremental (cross-corpus) dedup: the pmod-10<2 slice stands in for
    // a new crawl increment checked against the already-accepted corpus.
    // The corpus is never self-joined — cost scales with the increment.
    "dedup_incremental" -> ((s, dir) => {
      val sigs = docSigs(s, dir)
      Dedup.incrementalJaccardPairs(
        sigs.filter(pmod(col("id"), lit(10)) < 2),
        sigs.filter(pmod(col("id"), lit(10)) >= 2), threshold = 0.5)
    }),

    // sub-document exact dedup: 32-token chunks, md5 per chunk, report
    // chunks occurring more than once across the corpus (the C4-style
    // boilerplate detector). One shuffle on the 32-hex digest — chunk
    // text never shuffles.
    "dedup_chunks" -> ((s, dir) => {
      import graft.functions.Staging.bound
      val toks = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokens(lower(col("text"))).as("t"))
      val chunks = toks.select(col("doc_id"),
        explode(bound(col("t"))(t =>
          transform(
            sequence(lit(0),
              greatest(((size(t) - lit(1)) / lit(32)).cast(IntegerType),
                lit(0))),
            i => concat_ws(" ", slice(t, i * lit(32) + lit(1), lit(32))))))
          .as("chunk"))
      chunks
        .groupBy(md5(to_binary(col("chunk"), lit("utf-8"))).as("fp"))
        .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("copies"))
        .filter(col("copies") > 1)
    }),

    // end-to-end dedup materialization: pairs -> clusters -> keep ONE
    // representative (min doc id) per cluster; the anti-join drops the
    // rest. This is the corpus a training pipeline actually trains on.
    "dedup_materialize" -> ((s, dir) => {
      val cl = Dedup.clusters(jaccardPairs05(s, dir))
      docs(s, dir).join(
          cl.filter(col("id") =!= col("cluster_id"))
            .select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
    }),

    // -------------------------------------------------- similarity search

    "ann_brute_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // kNN label classification (the weak-supervision / label-propagation
    // primitive): majority vote over the 5 nearest neighbors, ties to
    // the smallest label — fully deterministic, so the oracle replays
    // the identical vote. Plan shape = the brute top-k (broadcast
    // queries over the corpus scan) + two small aggregations over
    // |queries|*k rows
    "ann_knn_classify" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val nn = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", k = 5)
      val votes = nn
        .join(e.select(col("vec_id").as("n_id"), col("label")), "n_id")
        .groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("votes"))
      graft.operators.Relational.topKPerGroup(votes, Seq("q_id"),
          Seq(("votes", true), ("label", false)), 1)
        .join(e.select(col("vec_id").as("q_id"),
          col("label").as("true_label")), "q_id")
        .select(col("q_id"), col("label").as("pred_label"), col("votes"),
          col("true_label"),
          (col("label") === col("true_label")).as("correct"))
    }),

    // sign-LSH top-k over portable md5-56 hyperplanes: the oracle
    // replays the identical buckets, 1-bit probes, and exact re-rank
    "ann_lsh_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, numPlanes = 6)
    }),

    // IVF top-k from the shared trained index; training is fully
    // deterministic (lowest-id init, 3 Lloyd rounds, argmax ties to the
    // lowest centroid), so the oracle unrolls the identical iterations
    "ann_ivf_topk" -> ((s, dir) => {
      val (cent, bucketed) = ivfIndex(s, dir)
      Similarity.ivfTopKFromIndex(bucketed, cent,
        embeddings(s, dir).filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 4)
    }),

    // incremental IVF index maintenance: a new-vector increment (the
    // pmod slice, mirroring dedup_incremental's crawl-increment shape)
    // is assigned to the EXISTING centroids — no retraining, no base
    // re-scan; at scale this is the nightly index append (assignments
    // append to the bucketed layout, centroids drift-checked offline).
    // The base-slice training is a prepare-once artifact since round 20
    // ([[ivfBaseCentroids]]); the query path scans ONLY the increment
    // slice and assigns it — the oracle reads the identical persisted
    // centroids and replays the assignment.
    "ann_ivf_increment" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val increment = e.filter(pmod(col("vec_id"), lit(10)) < 2)
      Similarity.ivfBucketedCorpus(increment, "vec_id", "embedding",
          ivfBaseCentroids(s, dir))
        .select(col("n_id").as("vec_id"),
          col("bucket").cast(LongType).as("bucket"))
    }),

    // Flat PQ-ADC with exact re-rank over the PERSISTED code table
    // ([[pqCoded2]]: iters=2 codebooks + pq_codes — round 19, the same
    // prepare-once discipline as ann_ivfpq_topk). The oracle reads the
    // identical persisted state and restates only the query-time path.
    // Recall also pinned by tests.
    "ann_pq_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val (cb, codes) = pqCoded2(s, dir)
      graft.operators.Quantization.pqTopKFromCodes(codes, e,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, cb)
    }),

    // IVF + PQ composed (the production ANN layout) over the PERSISTED
    // index: centroids, codebooks and the coded corpus are prepare-phase
    // artifacts ([[ivfPqCoded]]); the query path probes buckets, ADC-
    // scores the code column and re-ranks only the refine*k shortlist
    // against the float table. The oracle reads the same persisted state
    // and restates only the query-time path; recall also pinned by tests
    "ann_ivfpq_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val (cent, cb, coded) = ivfPqCoded(s, dir)
      graft.operators.Quantization.ivfPqTopKFromCodes(coded, e,
        e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cent, cb, nprobe = 6)
    }),

    // int8 scalar-quantized search over the PERSISTED code column
    // (int8Index artifacts): approximate cosine on decoded codes ->
    // refine*k shortlist -> exact float re-rank joined back to the
    // float table for survivors only. The oracle reads the same
    // persisted ranges + codes and restates only the query-time path —
    // still fully hash-verified, now at the production workload shape
    // (scan codes; never re-encode per query).
    "ann_int8_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val (ranges, codes) = int8Index(s, dir)
      graft.operators.Quantization.int8TopKFromCodes(codes, e,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, ranges)
    }),

    // residual IVF+PQ (the FAISS IndexIVFPQ refinement) at the knobs
    // where residual coding pays: recall@5 0.94 vs plain 0.74 at sf0.1
    // (BASELINE_MEASURED round-15 ANN section). Fully oracled since
    // round 16: the trained state — IVF centroids (shared with
    // ann_ivf_topk's `ivf_centroids` artifact: identical nlist=16/
    // iters=3 training) and residual codebooks — is parquet-persisted
    // and the oracle reads it back, restating only the query-time path
    // (assign, residual, encode, residual-ADC, exact re-rank) in SQL.
    "ann_ivfpq_residual" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val (cent, _) = ivfIndex(s, dir)
      val cb = residualCodebooks(s, dir, cent)
      graft.operators.Quantization.ivfPqResidualTopKFromCodes(
        residualCoded(s, dir, cent, cb),
        e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cent, cb, nprobe = 8, refine = 16)
    }),

    // --------------------------------------------------------- multimodal

    "mm_meta" -> ((s, dir) =>
      Multimodal.asMediaTable(docs(s, dir), "doc_id", "text")
        .select(col("media_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"))),

    // REAL image decode: per-doc deterministic PNGs are ImageIO-encoded
    // on the executors, then ImageIO-decoded back and reduced to
    // per-channel pixel sums. PNG is lossless, so the oracle restates the
    // raster formula (Multimodal.imgW/pxR contract) relationally — exact
    // values, while the Spark side exercises the actual codec both ways.
    "mm_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(s,
          Multimodal.pngMediaTable(s, docs(s, dir), "doc_id"))
        .select(col("media_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_px"), col("sum_r"), col("sum_g"), col("sum_b"))),

    // REAL resize over decoded pixels: decode -> nearest-neighbor 2x
    // downsample -> RE-encode -> decode again -> channel sums, so the
    // checked values survived two codec round trips
    "mm_resize" -> ((s, dir) =>
      Multimodal.decodeResize(s,
          Multimodal.pngMediaTable(s, docs(s, dir), "doc_id"), factor = 2)
        .select(col("media_id"),
          col("out_w").cast(LongType).as("out_w"),
          col("out_h").cast(LongType).as("out_h"),
          col("sum_r"), col("sum_g"), col("sum_b"))),

    "mm_chunks" -> ((s, dir) =>
      Multimodal.sampleChunks(
          Multimodal.asMediaTable(docs(s, dir), "doc_id", "text"))
        .select(col("media_id"), col("n_chunks").cast(LongType).as("n_chunks"),
          size(col("kept_chunks")).cast(LongType).as("n_kept"))),

    // REAL audio decode: deterministic PCM16 clips are WAV-encoded via
    // JDK javax.sound.sampled on the executors, decoded back, reduced to
    // integer-exact clip statistics. PCM16-in-WAV is lossless, so the
    // oracle restates the waveform formula (Multimodal.audioN/audioSample)
    "mm_audio_features" -> ((s, dir) =>
      Multimodal.decodeAudioFeatures(s,
        Multimodal.wavMediaTable(s, docs(s, dir), "doc_id"))),

    // REAL audio downsample over decoded samples: decode -> every 2nd
    // sample -> re-encode -> decode again -> statistics
    "mm_audio_downsample" -> ((s, dir) =>
      Multimodal.decodeAudioDownsample(s,
        Multimodal.wavMediaTable(s, docs(s, dir), "doc_id"), factor = 2)),

    // REAL video frame sampling + decode: per-doc deterministic clips are
    // containers of ImageIO-encoded PNG frames (MJPEG-style length-
    // prefixed framing — the JDK ships no AVI/MP4 parser); every 2nd
    // frame is ImageIO-decoded and reduced to per-channel pixel sums.
    // Skipped frames are never decoded — the sampling economics that
    // matter at 100 TB. Lossless PNG => the oracle restates the frame
    // formula (Multimodal.vidFrames/vpxR contract) relationally.
    "mm_video_frames" -> ((s, dir) =>
      Multimodal.decodeVideoFrames(s,
          Multimodal.videoMediaTable(s, docs(s, dir), "doc_id"), stride = 2)
        .select(col("media_id"),
          col("frame_idx").cast(LongType).as("frame_idx"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))),

    // REAL temporal feature over decoded frames: abs per-pixel diff
    // between consecutive decoded frames per channel (motion /
    // scene-change primitive), all frames decoded through the codec
    "mm_video_motion" -> ((s, dir) =>
      Multimodal.decodeVideoMotion(s,
        Multimodal.videoMediaTable(s, docs(s, dir), "doc_id"))),

    // STANDARD container: per-doc animated GIFs (JDK GIF writer,
    // write-sequence API) decoded through ImageIO's format-detecting
    // multi-frame reader — getNumImages/read(i), zero custom framing on
    // the read path. 256-gray frames make GIF's indexed color lossless,
    // so the oracle restates the gray formula exactly.
    "mm_video_gif" -> ((s, dir) =>
      Multimodal.decodeGifFrames(s,
          Multimodal.gifMediaTable(s, docs(s, dir), "doc_id"))
        .select(col("media_id"),
          col("frame_idx").cast(LongType).as("frame_idx"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("sum_v"))),

    // decode-IN-FLIGHT: clips arrive as a file stream (4 staged files,
    // maxFilesPerTrigger=1 -> 4 real micro-batches), every frame is
    // ImageIO-decoded inside its micro-batch via the SAME mapPartitions
    // operator the batch path uses, and the append-mode memory sink
    // accumulates per-frame features — the streaming-ingest shape of a
    // media pipeline (decode as data lands, not as a nightly batch).
    // Must equal the batch decode over all clips (the oracle restates
    // the frame formula, stride 1). The memory sink is the VERIFY
    // harness (bounded: per-frame stats rows, not blobs); a production
    // run pairs this transform with the checkpointed file/upsert sinks
    // stream_file_sink / stream_upsert demonstrate.
    "stream_media_decode" -> ((s, dir) => {
      val schema = StructType(Seq(
        StructField("media_id", LongType), StructField("blob", BinaryType)))
      val src = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(mediaStreamDir(s, dir))
      val name = "smd_" + java.lang.Integer.toHexString(dir.hashCode)
      StreamOps.runToMemory(s,
        Multimodal.decodeVideoFrames(s, src, stride = 1)
          .select(col("media_id"),
            col("frame_idx").cast(LongType).as("frame_idx"),
            col("width").cast(LongType).as("width"),
            col("height").cast(LongType).as("height"),
            col("sum_r"), col("sum_g"), col("sum_b")),
        name, org.apache.spark.sql.streaming.OutputMode.Append())
    }),

    // keyframe extraction: decode -> per-consecutive-pair diff rows ->
    // relational threshold filter (total diff > 128 * pixels, ~the mean
    // per-pixel step of the fixture's motion) — the scene-change cut a
    // video curation pipeline makes before featurizing only keyframes
    "mm_video_keyframes" -> ((s, dir) =>
      Multimodal.decodeVideoFrameDiffs(s,
          Multimodal.videoMediaTable(s, docs(s, dir), "doc_id"))
        .filter(col("diff_r") + col("diff_g") + col("diff_b") >
          lit(128L) * col("width") * col("height"))
        .select(col("media_id"),
          col("frame_idx").cast(LongType).as("frame_idx"),
          (col("diff_r") + col("diff_g") + col("diff_b")).as("diff_total"))),

    // per-label embedding centroid: the k-means/update-step and
    // class-prototype primitive. posexplode keeps rows O(1)-sized (no
    // vector ever shuffles whole); partial sum aggregates map-side.
    // Elements are quantized to 1e-6-scaled integers BEFORE the sum so
    // the aggregation is exact and order-free — a double-typed avg
    // re-associates across partitions, and at sf0.1 an element mean
    // landed exactly on a .00005 rounding boundary, flipping the 4dp
    // output between engines (found by the sf0.1 full-oracle run)
    "emb_label_centroid" -> ((s, dir) =>
      embeddings(s, dir)
        .select(col("label").cast(LongType).as("label"),
          posexplode(col("embedding")))
        .select(col("label"), (col("pos") + lit(1)).cast(LongType).as("pos"),
          round(col("col").cast(DoubleType) * lit(1000000.0), 0)
            .cast(LongType).as("q"))
        .groupBy(col("label"), col("pos"))
        // + 0.0 normalizes IEEE negative zero (-0.0 + 0.0 = +0.0), which
        // would otherwise hash-mismatch as the string "-0" vs "0"
        .agg((round(sum(col("q")).cast(DoubleType) /
          (count(lit(1)).cast(DoubleType) * lit(1000000.0)), 4) + lit(0.0))
          .as("c"))),

    // deterministic shard assignment: portable md5-56 hash of the doc id
    // mod 8 — the reproducible any-engine alternative to rand() sharding;
    // per-shard profile proves the assignment balances
    "ext_shard_assign" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          pmod(Dedup.portableHash56(col("doc_id")), lit(8)).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))),

    // deterministic global training-order shuffle, the SCALE shape: a
    // global ORDER BY hash would funnel every row through one reducer
    // (row_number over an empty partition spec — the one-reducer trap
    // the packing audit pins against). Instead shard = hash % 32
    // co-partitions the permutation and pos = row_number within shard
    // ordered by (hash, doc_id): each shard sorts in parallel, and a
    // reader consuming shards round-robin replays the same
    // pseudo-random order on any engine, any run — reproducible
    // epoch shuffles without rand()
    "ext_shuffle_order" -> ((s, dir) => {
      val h = Dedup.portableHash56(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), pmod(h, lit(32)).as("shard"), h.as("h"))
        .select(col("doc_id"), col("shard"),
          row_number().over(Window.partitionBy(col("shard"))
            .orderBy(col("h"), col("doc_id"))).cast(LongType).as("pos"))
    }),

    // deterministic train/eval split: reproducible 10% sample by id
    // modulus — the split a training pipeline can re-derive at any time
    // on any engine (unlike rand()-based sampling)
    "ext_deterministic_split" -> ((s, dir) =>
      docs(s, dir).filter(pmod(col("doc_id"), lit(100)) < 10)
        .select(col("doc_id"), col("lang"))),

    // materialized domain remix: per-source acceptance rate that rescales
    // the NATURAL token distribution to the temperature-scaled target
    // (rate ∝ weight/share, max-normalized, rounded to 6dp so the
    // double arithmetic can't straddle engines), applied as a
    // deterministic per-doc hash-fraction test — the reproducible
    // alternative to rand() downsampling. One corpus groupBy to learn
    // rates, one broadcast join to apply them
    "ext_domain_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val g = Window.partitionBy()
      val rates = d.select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast(LongType).as("n"))
        .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
        .withColumn("share", col("n_tokens").cast(DoubleType) /
          sum(col("n_tokens")).over(g).cast(DoubleType))
        .withColumn("w", sqrt(col("share")))
        .withColumn("ratio", (col("w") / sum(col("w")).over(g)) / col("share"))
        .withColumn("rate", round(col("ratio") / max(col("ratio")).over(g), 6))
        .select(col("source"), col("rate"))
      d.join(broadcast(rates), "source")
        .filter(pmod(Dedup.portableHash56(col("doc_id")), lit(1000000L))
          .cast(DoubleType) / lit(1000000.0) < col("rate"))
        .select(col("doc_id"), col("source"))
    }),

    // per-source p95 length gate: the adaptive outlier filter (each
    // source gets its own threshold — a fixed global cap over-trims
    // terse sources and under-trims verbose ones). DISCRETE quantile,
    // integer arithmetic only (idx = ceil(95n/100); p95 = smallest
    // value whose cumulative count reaches idx), so both engines pick
    // the identical threshold with no float boundary at all. The
    // corpus-scale work is ONE groupBy to (source, n_tokens) counts;
    // the cumulative window runs over that tiny aggregated table —
    // never a per-source sort of the docs themselves (the same
    // one-reducer trap the packing rewrite removed).
    "ext_length_p95_filter" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"))
      val cnts = d.groupBy(col("source"), col("n_tokens"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cnts
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
        // (95n + 99) / 100 stays exact in double up to 2^45 docs/source,
        // and the cast truncates to the integer ceil(95n/100)
        .withColumn("idx", ((col("n") * 95 + 99) / 100).cast(LongType))
      val thresh = cum
        .filter(col("cum") >= col("idx") && col("cum") - col("c") < col("idx"))
        .select(col("source"), col("n_tokens").as("p95"))
      d.join(broadcast(thresh), "source")
        .filter(col("n_tokens") <= col("p95"))
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),

    // stratified cap: at most 50 docs per language (deterministic by
    // doc_id) — the language-rebalancing primitive of corpus curation;
    // one shuffle via window rank, no collect
    "ext_stratified_cap" -> ((s, dir) =>
      graft.operators.Relational.topKPerGroup(
          docs(s, dir).select(col("doc_id"), col("lang")),
          Seq("lang"), Seq(("doc_id", false)), k = 50)
        .select(col("doc_id"), col("lang"))),

    // temperature-scaled domain-mixing weights (the multilingual-corpus
    // sampling formula, alpha = 0.5): per-source token mass -> share ->
    // weight = share^0.5 / sum(share^0.5). One groupBy over the corpus;
    // the two global windows run over |sources| rows (a handful), so
    // the single-partition window is a non-issue at any scale
    "ext_domain_mix" -> ((s, dir) => {
      val per = docs(s, dir)
        .select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast(LongType).as("n"))
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      val g = Window.partitionBy()
      per.withColumn("share",
          col("n_tokens").cast(DoubleType) /
            sum(col("n_tokens")).over(g).cast(DoubleType))
        .withColumn("wraw", sqrt(col("share")))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("share"), 4).as("share"),
          round(col("wraw") / sum(col("wraw")).over(g), 4).as("weight"))
    }),

    // data-quality profile: per-source null/blank/short-doc counts
    "ext_quality_profile" -> ((s, dir) =>
      docs(s, dir).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        count(when(col("text").isNull || col("text") === "", 1)).as("n_blank"),
        count(when(length(col("text")) < 100, 1)).as("n_short"),
        round(avg(col("n_chars")), 4).as("avg_chars"))),

    // ------------------------------------------------------ sessionization

    "sessionize" -> ((s, dir) =>
      Sessionize.sessions(events(s, dir), "user_id", "ts", 30)),

    // ---------------------------------------------------------- streaming

    "stream_window_agg" -> ((s, dir) => {
      val agg = StreamOps.windowedAgg(eventsStream(s, dir))
      val name = "win_" + java.lang.Integer.toHexString(dir.hashCode)
      val out = StreamOps.runToMemory(s, agg, name)
      out.select(col("window_start"), col("event_type"), col("cnt"),
        round(col("sum_value"), 4).as("sum_value"))
    }),

    // watermarked streaming dedup: first hit per (user_id, event_type)
    // wins, state evicted past the watermark. Run with AvailableNow over
    // the finite input (one file -> one micro-batch, watermark still at
    // epoch -> nothing evicted), so the emitted KEY SET is exactly the
    // batch DISTINCT — which is what the oracle checks.
    "stream_dedup" -> ((s, dir) => {
      val dd = StreamOps.dedupeStream(eventsStream(s, dir),
        Seq("user_id", "event_type"), "ts")
      val name = "sdd_" + java.lang.Integer.toHexString(dir.hashCode)
      StreamOps.runToMemory(s,
        dd.select(col("user_id"), col("event_type")), name,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),

    // stream-stream interval join: each purchase joined to the same
    // user's clicks within the following 30 minutes, watermarks bounding
    // both sides' state. Emits every match (append mode), so the output
    // is arrival-order independent and equals the batch interval join.
    "stream_join" -> ((s, dir) => {
      val ev = eventsStream(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("r_ts"), col("event_id").as("r_id"))
      val joined = StreamOps.intervalJoinStreams(
        purchases, clicks, "user_id", "l_ts", "r_ts", windowMinutes = 30)
      val name = "ssj_" + java.lang.Integer.toHexString(dir.hashCode)
      StreamOps.runToMemory(s,
        joined.select(col("l_id"), col("r_id")), name,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }),

    // stateful streaming sessionizer (flatMapGroupsWithState): with
    // AvailableNow over the finite input all events arrive in one
    // micro-batch, so exactly the CLOSED sessions are emitted — every
    // session except each user's last. The oracle states that same set
    // relationally (gaps-and-islands minus the per-user max session).
    "stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsStream(s, dir)
        .select(col("user_id"), col("ts")).as[StreamOps.SessionEvent]
      val sess = StreamOps.sessionizeStream(ev, timeoutMinutes = 30)
      val name = "ssn_" + java.lang.Integer.toHexString(dir.hashCode)
      StreamOps.runToMemory(s, sess.toDF(), name,
        org.apache.spark.sql.streaming.OutputMode.Append())
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
    }),

    // stream-static enrichment: the streaming fact side joined to a
    // static dimension snapshot (re-read per micro-batch by Spark; here
    // broadcast — the canonical streaming-ETL enrich). Append mode, no
    // state: output equals the batch join, which is what the oracle
    // states.
    "stream_static_enrich" -> ((s, dir) => {
      val ev = eventsStream(s, dir)
        .filter(col("event_type") === "purchase" && col("user_id") < 100)
        .select(col("event_id"), col("user_id"))
      val dim = graft.sources.ParquetNanos.read(s, s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val joined = ev.join(broadcast(dim), Seq("user_id"))
      val name = "sse_" + java.lang.Integer.toHexString(dir.hashCode)
      StreamOps.runToMemory(s,
        joined.select(col("event_id"), col("user_id"), col("c_mktsegment")),
        name, org.apache.spark.sql.streaming.OutputMode.Append())
    }),

    // checkpointed streaming file sink: append-mode parquet with
    // exactly-once semantics (the offset log + file-commit manifest make
    // re-runs and AvailableNow restarts idempotent — re-invoking after
    // completion writes nothing new). The read-back equals the batch
    // filter, which is what the oracle states.
    // exactly-once streaming upsert sink: each micro-batch is compacted
    // to latest-per-key (Cdc.latestPerKeyAgg) and merged into a parquet
    // snapshot inside foreachBatch. The merge is idempotent (latest-wins
    // by (ts, event_id) is commutative/associative), so a batch replayed
    // after a crash between snapshot write and checkpoint commit changes
    // nothing — exactly-once EFFECT on at-least-once delivery. The final
    // snapshot must equal the batch latest-per-key over all events,
    // which is what the oracle states. 4 staged input files ->
    // maxFilesPerTrigger=1 drives 4 real merge rounds.
    "stream_upsert" -> ((s, dir) => {
      val (name0, src) = eventsStream4(s, dir)
      val outDir = s"/root/repo/target/tmp/stream_upsert_$name0"
      val snap = s"$outDir/snapshot"
      val ordered = Seq(col("ts"), col("event_id"))
      val pay = Seq("ts", "event_id", "event_type", "value")
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val sp = batch.sparkSession
          val delta = graft.operators.Cdc.latestPerKeyAgg(
            batch, Seq("user_id"), ordered, pay)
          val merged =
            if (new java.io.File(snap).exists())
              graft.operators.Cdc.latestPerKeyAgg(
                sp.read.parquet(snap).unionByName(delta),
                Seq("user_id"), ordered, pay)
            else delta
          // localCheckpoint materializes BEFORE the overwrite deletes
          // the files the plan would otherwise still be reading (at
          // cluster scale: versioned snapshot dirs / a table format)
          merged.localCheckpoint(true)
            .write.mode("overwrite").parquet(snap)
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(snap)
        .select(col("user_id"), col("event_type").as("last_type"),
          round(col("value"), 4).as("last_value"))
    }),

    // streaming near-dup gate: new docs arrive in micro-batches and are
    // checked against the STATIC corpus signature index via the
    // incremental-dedup join inside foreachBatch (batch-DataFrame
    // semantics, so no streaming-agg restrictions). Each new doc's
    // pairs depend only on that doc + the static corpus, so the batch
    // split cannot change the answer: the appended union equals the
    // one-shot incremental join, which is what the oracle states
    // (same SQL as dedup_incremental). Checkpoint + AvailableNow make
    // re-runs no-ops — exactly-once on the result sink.
    "stream_dedup_near" -> ((s, dir) => {
      val name0 = new java.io.File(dir).getName
      val streamDir = new java.io.File(s"/root/repo/target/tmp/docs_stream2_$name0")
      if (!streamDir.exists()) {
        graft.sources.ParquetNanos.read(s, s"$dir/documents.parquet")
          .filter(pmod(col("doc_id"), lit(10)) < 2)
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(streamDir.toString)
      }
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val src = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val corpusSigs = docSigs(s, dir).filter(pmod(col("id"), lit(10)) >= 2)
      val outDir = s"/root/repo/target/tmp/stream_dedup_near_$name0"
      val resDir = s"$outDir/pairs"
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Dedup.incrementalJaccardPairs(
              Dedup.signatures(batch, "doc_id", "text", n = 3),
              corpusSigs, threshold = 0.5)
            .write.mode("append").parquet(resDir)
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(resDir)
    }),

    "stream_file_sink" -> ((s, dir) => {
      val name0 = new java.io.File(dir).getName
      val outDir = s"/root/repo/target/tmp/stream_sink_$name0"
      val q = eventsStream(s, dir)
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"))
        .writeStream.format("parquet")
        .option("path", s"$outDir/data")
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$outDir/data").select(col("event_id"), col("user_id"))
    })
  )

  /** Stage events as FOUR range-split parquet files and open them as a
    * maxFilesPerTrigger=1 stream — four real micro-batches for sinks
    * whose merge logic only shows up across batches (stream_upsert).
    * The staged files are micros timestamps (ParquetNanos already
    * converted), so the stream schema is plain TimestampType. */
  /** Stage the deterministic clip table as 4 range-partitioned parquet
    * files for the media file-stream source (path carries
    * ArtifactVersion: the clip bytes are BUILT from the video fixture
    * formula, so an unbumped formula edit must not silently reuse stale
    * blobs the way a verbatim events copy safely can). */
  private def mediaStreamDir(s: SparkSession, dir: String): String = {
    val name0 = new java.io.File(dir).getName
    val d = s"/root/repo/target/tmp/media_stream_v${ArtifactVersion}_$name0"
    if (!new java.io.File(s"$d/_SUCCESS").exists()) {
      Multimodal.videoMediaTable(s, docs(s, dir), "doc_id")
        .select(col("media_id"), col("blob"))
        .repartitionByRange(4, col("media_id"))
        .write.mode("overwrite").parquet(d)
    }
    d
  }

  private def eventsStream4(s: SparkSession, dir: String): (String, DataFrame) = {
    val name0 = new java.io.File(dir).getName
    val streamDir = new java.io.File(s"/root/repo/target/tmp/events_stream4_$name0")
    if (!streamDir.exists()) {
      graft.sources.ParquetNanos.read(s, s"$dir/events.parquet")
        .repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(streamDir.toString)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    (name0, s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString))
  }

  /** Stage the sf dir's events.parquet into a directory (file-stream
    * sources require one; once per sf dir) and open it as a stream.
    * The raw file is copied VERBATIM, so the stream schema must match
    * its physical ts layout — TIMESTAMP(NANOS) fixtures (the harness
    * testdata) stream ts as LongType nanos, anything else (e.g. a
    * replicated scale fixture written by Spark) as TimestampType. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val tsNanos = graft.sources.ParquetNanos
      .nanosFields(s, s"$dir/events.parquet").contains("ts")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", if (tsNanos) LongType else TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val name0 = new java.io.File(dir).getName
    val streamDir = new java.io.File(s"/root/repo/target/tmp/events_stream_$name0")
    if (!new java.io.File(streamDir, "events.parquet").exists()) {
      streamDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.Paths.get(s"$streamDir/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    StreamOps.parquetStream(s, streamDir.toString, schema,
      nanosCols = if (tsNanos) Set("ts") else Set.empty)
  }

  // --------------------------------------------------------------- oracles

  /** Shared SQL fragments (DuckDB). */
  private val toksE =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
  private val toksLowerE =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
  private val padE = "(' ' || lower(text) || ' ')"
  private def occ(w: String): String =
    s"CAST((length($padE) - length(replace($padE, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
  private def langScore(ws: Seq[String]): String = ws.map(occ).mkString(" + ")
  private val normE = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  def oracleSql: Map[String, String] = Map(

    "text_token_count" ->
      s"""SELECT doc_id, CAST(len($toksE) AS BIGINT) AS n_tokens,
          CAST(coalesce(list_sum(list_transform($toksE,
            w -> greatest(1, CAST(ceil(length(w) / 6.0) AS BIGINT)))), 0) AS BIGINT)
            AS n_tokens_bpe
          FROM documents""",

    "text_quality" -> {
      val stopHits = langScore(Seq("the", "and", "of", "to", "in", "is", "that"))
      s"""SELECT doc_id, round(
            0.4 * least((CASE WHEN CAST(len($toksE) AS DOUBLE) > 0
                THEN CAST($stopHits AS DOUBLE) / CAST(len($toksE) AS DOUBLE)
                ELSE 0.0 END) * 4.0, 1.0)
          + 0.3 * least(CAST(len($toksE) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * (1.0 - least((CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END) * 5.0, 1.0)), 4) AS quality
          FROM documents"""
    },

    "text_langid" -> {
      val de = langScore(Seq("der", "und", "die", "nicht", "das"))
      val en = langScore(Seq("the", "and", "of", "is", "that"))
      val es = langScore(Seq("el", "los", "que", "y", "las"))
      val fr = langScore(Seq("le", "la", "et", "les", "des"))
      s"""WITH sc AS (
            SELECT doc_id,
              length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
              $de AS s_de, $en AS s_en, $es AS s_es, $fr AS s_fr
            FROM documents)
          SELECT doc_id, CASE
            WHEN cjk > 10 THEN 'zh'
            WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS lang_pred
          FROM sc"""
    },

    "text_langid_confusion" -> {
      val de = langScore(Seq("der", "und", "die", "nicht", "das"))
      val en = langScore(Seq("the", "and", "of", "is", "that"))
      val es = langScore(Seq("el", "los", "que", "y", "las"))
      val fr = langScore(Seq("le", "la", "et", "les", "des"))
      s"""WITH sc AS (
            SELECT doc_id, lang,
              length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
              $de AS s_de, $en AS s_en, $es AS s_es, $fr AS s_fr
            FROM documents),
          pred AS (
            SELECT doc_id, lang, CASE
              WHEN cjk > 10 THEN 'zh'
              WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
              WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
              WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
              WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
              ELSE 'fr' END AS lang_pred
            FROM sc)
          SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
          FROM pred GROUP BY 1, 2"""
    },

    "text_fingerprint" ->
      s"SELECT doc_id, md5($normE) AS fp FROM documents",

    "text_gopher_rules" -> {
      // token-SET stopword contract (round 13): a stopword is present
      // iff it appears as a whole \s+-delimited token, case-insensitive
      val stopList = Seq("the", "and", "of", "to", "in", "is", "that")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, $toksE AS toks FROM documents),
          s AS (SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_words,
            CASE WHEN len(toks) > 0
              THEN CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS mean_word_len,
            CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS alpha_ratio,
            CAST(len(list_intersect(
              list_distinct(list_transform(toks, w -> lower(w))),
              $stopList)) AS BIGINT) AS n_stopwords
          FROM t)
          SELECT doc_id, n_words,
            round(mean_word_len, 4) AS mean_word_len,
            round(alpha_ratio, 4) AS alpha_ratio,
            n_stopwords,
            (n_words BETWEEN 50 AND 100000
              AND mean_word_len BETWEEN 3.0 AND 10.0
              AND alpha_ratio >= 0.8 AND n_stopwords >= 2) AS pass
          FROM s"""
    },

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksLowerE AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
          cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
          agg AS (SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct,
                    max(c) AS top_c FROM cnt GROUP BY 1),
          bi AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
            CASE WHEN len(toks) >= 2 THEN CAST(len(list_distinct(
              list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT)
            ELSE 0 END AS n_bi_distinct
          FROM t)
          SELECT a.doc_id, CAST(a.n_tok AS BIGINT) AS n_tok,
            round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE), 4)
              AS dup_tok_ratio,
            round(CAST(top_c AS DOUBLE) / CAST(n_tok AS DOUBLE), 4)
              AS top_tok_share,
            round(CASE WHEN n >= 2
              THEN 1.0 - CAST(n_bi_distinct AS DOUBLE) / CAST(n - 1 AS DOUBLE)
              ELSE 0.0 END, 4) AS dup_bigram_ratio
          FROM agg a JOIN bi USING (doc_id)""",

    "ext_posexplode" ->
      s"""WITH t AS (SELECT doc_id, toks[1:least(5, len(toks))] AS tk
            FROM (SELECT doc_id, $toksE AS toks FROM documents
                  WHERE doc_id < 20))
          SELECT doc_id, unnest(range(len(tk))) AS pos, unnest(tk) AS tok
          FROM t""",

    "stream_static_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         WHERE e.event_type = 'purchase' AND e.user_id < 100""",

    "stream_file_sink" ->
      "SELECT event_id, user_id FROM events WHERE event_type = 'error'",

    "ext_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, lang,
            CAST(len($toksE) AS BIGINT) AS n_tokens,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 32
              AS shard
          FROM documents),
          cum AS (SELECT doc_id, lang, n_tokens, shard,
            sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cs FROM t)
          SELECT doc_id, lang, n_tokens, shard,
            CAST(shard * 4294967296 + floor((cs - n_tokens) / 2048.0) AS BIGINT)
              AS pack_id
          FROM cum""",

    "text_token_bpe_regex" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, " +
       "' ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+')) AS BIGINT) " +
       "AS n_segments FROM documents"),

    // winnowing restated: md5-56 k-gram hashes (k=8), min per w=4 sliding
    // window, distinct — the identical sketch the Spark expression builds
    "text_winnowing" ->
      """WITH h AS (
           SELECT doc_id,
             list_transform(generate_series(1, greatest(length(text)-7, 1)),
               i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 14))::BIGINT) AS kh
           FROM documents),
         s AS (
           SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(kh)-3, 1)),
               j -> list_min(kh[j:j+3]))) AS sk
           FROM h)
         SELECT doc_id, CAST(len(sk) AS BIGINT) AS n_sketch,
           list_min(sk) AS sketch_min
         FROM s""",

    // int8 affine quantization restated end-to-end: per-dim (min,max)
    // ranges over the corpus, encode = round((v-mn)*255/(mx-mn)), plus
    // self-cosine fidelity columns (cos(x,x)=1 numerically on both
    // engines after round(.,4))
    // full int8 search restated from the PERSISTED index (int8_ranges +
    // int8_codes artifacts — same state the engine's plan literals are
    // collected from): decode->approx cosine (identical operation order
    // to int8TopKFromCodes' fused native loop: dot and both norm
    // accumulators are independent index-order folds, division last),
    // refine*k=20 shortlist by (adc8, n_id), exact re-rank top-5 via a
    // join back to the float table for survivors only. The encode math
    // itself stays end-to-end-verified by ext_quantize_int8.
    "ann_int8_topk" ->
      s"""WITH r AS (
           SELECT list(mn ORDER BY pos) AS mns,
             list(CASE WHEN mx > mn THEN (mx - mn) / 255.0
                  ELSE 0.0 END ORDER BY pos) AS invs
           FROM '$ArtifactToken/int8_ranges/*.parquet'),
         dec AS (
           SELECT c.n_id,
             list_transform(c.codes,
               (x, i) -> x::DOUBLE * r.invs[i] + r.mns[i]) AS d
           FROM '$ArtifactToken/int8_codes/*.parquet' c CROSS JOIN r),
         q AS (
           SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe,
             list_transform(embedding, x -> x::DOUBLE) AS qd,
             sqrt(list_sum(list_transform(embedding,
               x -> x::DOUBLE * x::DOUBLE))) AS qn
           FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT q.q_id, n.n_id, q.qe,
             list_sum(list_transform(n.d, (x, i) -> x * q.qd[i]))
               / (sqrt(list_sum(list_transform(n.d, x -> x * x))) * q.qn) AS adc8
           FROM dec n CROSS JOIN q WHERE n.n_id <> q.q_id),
         short AS (SELECT q_id, n_id, qe FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY adc8 DESC, n_id ASC) AS rn FROM scored)
           WHERE rn <= 20),
         rer AS (SELECT s.q_id, s.n_id,
             list_cosine_similarity(s.qe, e.embedding::DOUBLE[]) AS cosine
           FROM short s JOIN embeddings e ON e.vec_id = s.n_id)
         SELECT q_id, n_id, round(cosine, 4) AS cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, n_id ASC) AS rn FROM rer)
         WHERE rn <= 5""",

    "ext_quantize_int8" ->
      """WITH dims AS (
           SELECT i, min(v) AS mn, max(v) AS mx FROM (
             SELECT unnest(embedding) AS v,
               unnest(generate_series(1, len(embedding))) AS i
             FROM embeddings)
           GROUP BY i),
         r AS (
           SELECT list(mn::DOUBLE ORDER BY i) AS mns,
             list(CASE WHEN mx > mn THEN 255.0 / (mx::DOUBLE - mn::DOUBLE)
                  ELSE 0.0 END ORDER BY i) AS scs,
             list(CASE WHEN mx > mn THEN (mx::DOUBLE - mn::DOUBLE) / 255.0
                  ELSE 0.0 END ORDER BY i) AS invs
           FROM dims),
         enc AS (
           SELECT e.vec_id, e.embedding,
             list_transform(e.embedding,
               (v, i) -> CAST(round((v::DOUBLE - r.mns[i]) * r.scs[i]) AS INT)) AS codes
           FROM embeddings e CROSS JOIN r),
         dec AS (
           SELECT vec_id, embedding, codes,
             list_transform(codes, (c, i) -> c::DOUBLE * r.invs[i] + r.mns[i]) AS d
           FROM enc CROSS JOIN r)
         SELECT vec_id, codes[1] AS c0, codes[2] AS c1,
           round(list_cosine_similarity(embedding::DOUBLE[], embedding::DOUBLE[]), 4)
             AS self_cos,
           round(list_cosine_similarity(d, d), 4) AS self_cos_q
         FROM dec""",

    "text_pii_scrub" ->
      """SELECT doc_id AS id,
           CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT)
             AS n_urls,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           md5(regexp_replace(
             regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'))
             AS fp_scrubbed
         FROM documents""",

    "text_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 8
             THEN list_transform(generate_series(1, len(t)-7),
               i -> array_to_string(list_slice(t, i, i+7), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         corpus AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id >= 100),
         bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id < 100)
         SELECT c.doc_id, count(*) AS n_contaminated
         FROM corpus c JOIN bench b ON c.g = b.g
         GROUP BY 1""",

    // the Bloom pre-pass cannot drop a true hit (no false negatives) and
    // every false positive dies in the exact verify join, so the scale
    // path's oracle is the SAME exhaustive exact-overlap statement
    "text_decontaminate_bloom" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 8
             THEN list_transform(generate_series(1, len(t)-7),
               i -> array_to_string(list_slice(t, i, i+7), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         corpus AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id >= 100),
         bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id < 100)
         SELECT c.doc_id, count(*) AS n_contaminated
         FROM corpus c JOIN bench b ON c.g = b.g
         GROUP BY 1""",

    "text_term_freq" ->
      s"""SELECT g AS token, count(*) AS freq FROM (
            SELECT unnest($toksLowerE) AS g FROM documents)
          GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 100""",

    // bigram LM restated: context counts over non-final tokens, pair
    // counts, logp quantized to 1e-6 ints before the per-doc sum.
    // COLLISION ASSUMPTION: the Spark side's wide logprob join carries
    // xxhash64(pair) while this oracle joins the pair STRINGS — parity
    // holds under the repo-wide 2^-64 xxhash64-injectivity assumption
    // (a colliding vocab pair would both mis-score and duplicate rows);
    // the same assumption every hash-verified dedup oracle states.
    "text_bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, $toksLowerE AS t FROM documents),
          pairs AS (
            SELECT doc_id, unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])) AS pair
            FROM t WHERE len(t) >= 2),
          ctx AS (
            SELECT w1, count(*) AS c1 FROM (
              SELECT unnest(t[1:len(t) - 1]) AS w1 FROM t WHERE len(t) >= 2)
            GROUP BY 1),
          bi AS (SELECT pair, count(*) AS c12 FROM pairs GROUP BY 1),
          lp AS (
            SELECT pair, CAST(round(ln(CAST(c12 AS DOUBLE)
              / CAST(c1 AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS q
            FROM bi JOIN ctx ON split_part(bi.pair, ' ', 1) = ctx.w1)
          SELECT p.doc_id,
            round(-CAST(sum(l.q) AS DOUBLE)
              / (CAST(count(*) AS DOUBLE) * 1000000.0), 4) AS nll2,
            CAST(count(*) AS BIGINT) AS n_bigrams
          FROM pairs p JOIN lp l USING (pair)
          GROUP BY 1""",

    // two BPE merge rounds restated: top pair by (count desc, pair asc)
    // as a scalar subquery per round; the merge is the same plain
    // replace over the double-spaced canonical form
    "text_bpe_merge2" -> {
      def pairsOf(src: String, name: String) =
        s"""$name AS (
             SELECT pair, count(*) AS cnt FROM (
               SELECT unnest(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i + 1])) AS pair
               FROM $src WHERE len(t) >= 2)
             GROUP BY 1)"""
      def topOf(p: String, name: String) =
        s"""$name AS (SELECT pair FROM $p ORDER BY cnt DESC, pair ASC LIMIT 1)"""
      def mergeOf(src: String, top: String, name: String) =
        s"""$name AS (
             SELECT list_filter(regexp_split_to_array(
               replace(
                 replace(' ' || array_to_string(t, ' ') || ' ', ' ', '  '),
                 ' ' || replace((SELECT pair FROM $top), ' ', '  ') || ' ',
                 ' ' || replace((SELECT pair FROM $top), ' ', '_') || ' '),
               '\\s+'), x -> x <> '') AS t
             FROM $src)"""
      s"""WITH t0 AS (SELECT $toksLowerE AS t FROM documents),
          ${pairsOf("t0", "p1")},
          ${topOf("p1", "m1")},
          ${mergeOf("t0", "m1", "t1")},
          ${pairsOf("t1", "p2")},
          ${topOf("p2", "m2")},
          ${mergeOf("t1", "m2", "t2")}
          SELECT token, count(*) AS freq FROM (
            SELECT unnest(t) AS token FROM t2)
          GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 20"""
    },

    // per-source discrete p95 restated with the identical integer
    // index arithmetic
    "ext_length_p95_filter" ->
      s"""WITH d AS (SELECT doc_id, source,
            CAST(len($toksE) AS BIGINT) AS n_tokens FROM documents),
          cnts AS (SELECT source, n_tokens, count(*) AS c
                   FROM d GROUP BY 1, 2),
          cum AS (SELECT source, n_tokens, c,
              sum(c) OVER (PARTITION BY source ORDER BY n_tokens
                ROWS UNBOUNDED PRECEDING) AS cum,
              sum(c) OVER (PARTITION BY source) AS n
            FROM cnts),
          thresh AS (SELECT source, n_tokens AS p95 FROM cum
            WHERE cum >= (95 * n + 99) // 100
              AND cum - c < (95 * n + 99) // 100)
          SELECT d.doc_id, d.source, d.n_tokens
          FROM d JOIN thresh USING (source)
          WHERE d.n_tokens <= thresh.p95""",

    "text_tfidf" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest($toksLowerE) AS token FROM documents),
          tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
          dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
          scored AS (
            SELECT tf.doc_id, tf.token,
              CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(dfx.df AS DOUBLE)) AS tfidf
            FROM tf JOIN dfx USING (token) CROSS JOIN n),
          sel AS (
            SELECT doc_id AS id, token, tfidf,
              ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, token ASC) AS rn
            FROM scored)
          SELECT id, token, round(tfidf, 4) AS tfidf FROM sel
          WHERE rn <= 3 AND id < 50""",

    // log-probs quantized to 1e-6 integers before the per-doc sum (see
    // the Spark entry: exact order-free aggregation on both engines).
    // COLLISION ASSUMPTION: the Spark side joins on xxhash64(token)
    // where this oracle joins the token strings — parity rests on the
    // repo-wide 2^-64 xxhash64-injectivity assumption, as stated on
    // text_bigram_logprob and every hash-verified dedup oracle.
    "text_unigram_logprob" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest($toksLowerE) AS token FROM documents),
          freq AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
          tot AS (SELECT sum(c) AS t FROM freq),
          lp AS (
            SELECT token, CAST(round(ln(CAST(c AS DOUBLE)
              / CAST((SELECT t FROM tot) AS DOUBLE)) * 1000000.0, 0)
              AS BIGINT) AS q
            FROM freq)
          SELECT t.doc_id,
            round(-CAST(sum(l.q) AS DOUBLE)
              / (CAST(count(*) AS DOUBLE) * 1000000.0), 4) AS nll,
            CAST(count(*) AS BIGINT) AS n_tok
          FROM toks t JOIN lp l USING (token)
          GROUP BY 1""",

    // KL terms quantized to 1e-9 integers before the per-source sum
    // (see the Spark entry: exact order-free aggregation)
    "text_source_divergence" ->
      s"""WITH toks AS (
            SELECT source, unnest($toksLowerE) AS token FROM documents),
          freq AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
          tot AS (SELECT sum(c) AS t FROM freq),
          corpus AS (
            SELECT token, CAST(c AS DOUBLE)
              / CAST((SELECT t FROM tot) AS DOUBLE) AS p
            FROM freq),
          per AS (
            SELECT source, token, count(*) AS cs FROM toks GROUP BY 1, 2),
          pt AS (SELECT source, sum(cs) AS ts FROM per GROUP BY 1),
          ps AS (
            SELECT per.source, per.token,
              CAST(cs AS DOUBLE) / CAST(ts AS DOUBLE) AS ps
            FROM per JOIN pt USING (source)),
          q AS (
            SELECT ps.source,
              CAST(round(ps.ps * ln(ps.ps / c.p) * 1000000000.0, 0)
                AS BIGINT) AS q
            FROM ps JOIN corpus c USING (token))
          SELECT source,
            round(CAST(sum(q) AS DOUBLE) / 1000000000.0, 4) AS kl,
            CAST(count(*) AS BIGINT) AS n_terms
          FROM q GROUP BY 1""",

    "dedup_exact" ->
      s"""SELECT md5($normE) AS fp, min(doc_id) AS keep_id,
          count(*) AS copies FROM documents GROUP BY 1""",

    // MinHash oracle: the exact-jaccard pair set at the same threshold.
    // Sound because banding (16 bands x 2 rows) finds every j>=0.5 pair on
    // these corpora — verified deterministic-equal to the exact pairs at
    // sf0.001/0.01/0.1 (candidates are verified with exact jaccard, so
    // false positives are impossible; only banding misses could diverge,
    // and there are none on this data).
    "dedup_minhash" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
           round(CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE), 4)
             AS jaccard
         FROM pairs
         WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5""",

    // portable 56-bit simhash restated in SQL: md5-56 per shingle, 56
    // per-bit majority votes, sign-bit fold, then ALL pairs at
    // hamming<=3 (banding recall is guaranteed by pigeonhole, so the
    // engine's banded candidate generation returns exactly this set)
    "dedup_simhash" -> {
      val votes = (0 until 56).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n             ")
      val fold = (0 until 56).map(b =>
        s"(CASE WHEN v$b > 0 THEN (1::BIGINT << $b) ELSE 0 END)")
        .mkString(" | ")
      s"""WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
             x -> x <> '') AS t FROM documents
           WHERE doc_id % (SELECT CASE WHEN count(*) <= 5000 THEN 1
             ELSE (count(*) + 4999) // 5000 END FROM documents) = 0),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         hv AS (
           SELECT doc_id, ('0x' || substr(md5(g), 1, 14))::BIGINT AS h
           FROM (SELECT doc_id, unnest(sh) AS g FROM sh)),
         votes AS (
           SELECT doc_id,
             $votes
           FROM hv GROUP BY doc_id),
         sigs AS (SELECT doc_id, $fold AS sig FROM votes)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 3"""
    },

    "dedup_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
           round(CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE), 4)
             AS jaccard
         FROM pairs
         WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.3""",

    "pipeline_curate_pack" ->
      s"""WITH RECURSIVE ltoks AS (
           SELECT doc_id, $toksLowerE AS t FROM documents),
         shl AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM ltoks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM shl),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM p
           WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5),
         edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                   UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         clusters AS (
           SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
         gop AS (
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             round(CASE WHEN len(toks) > 0
               THEN CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS mean_word_len,
             round(CASE WHEN len(toks) > 0
               THEN CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS alpha_ratio
           FROM (SELECT doc_id, $toksE AS toks, text FROM documents)),
         keep AS (
           SELECT d.doc_id, d.lang, CAST(len($toksE) AS BIGINT) AS n_tokens,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT % 32
               AS shard
           FROM documents d JOIN gop USING (doc_id)
           WHERE d.lang = 'en'
             AND gop.n_words >= 50
             AND gop.mean_word_len BETWEEN 3.0 AND 10.0
             AND gop.alpha_ratio >= 0.8
             AND d.doc_id NOT IN
               (SELECT id FROM clusters WHERE id <> cluster_id)),
         cum AS (
           SELECT doc_id, n_tokens, shard,
             sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cs
           FROM keep)
         SELECT doc_id, n_tokens, shard,
           CAST(shard * 4294967296 + floor((cs - n_tokens) / 2048.0) AS BIGINT)
             AS pack_id
         FROM cum""",

    "graph_degrees" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM p
           WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5)
         SELECT id, count(*) AS degree
         FROM (SELECT a_id AS id FROM pairs
               UNION ALL SELECT b_id FROM pairs)
         GROUP BY 1""",

    "graph_triangles" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM p
           WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5)
         SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         FROM pairs e1
         JOIN pairs e2 ON e1.b_id = e2.a_id
         JOIN pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id""",

    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM p
           WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5),
         edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                   UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""",

    "graph_pagerank" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM p
           WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5),
         edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                   UNION ALL SELECT b_id, a_id FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         nn AS (SELECT count(*) AS n FROM deg),
         pr0 AS (SELECT src AS id, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
         c1 AS (SELECT e.dst AS id, sum(p.pr / d.deg) AS s
                FROM edges e JOIN pr0 p ON e.src = p.id
                  JOIN deg d ON e.src = d.src GROUP BY 1),
         pr1 AS (SELECT d.src AS id, 0.15 / (SELECT n FROM nn)
                   + 0.85 * coalesce(c1.s, 0.0) AS pr
                 FROM deg d LEFT JOIN c1 ON d.src = c1.id),
         c2 AS (SELECT e.dst AS id, sum(p.pr / d.deg) AS s
                FROM edges e JOIN pr1 p ON e.src = p.id
                  JOIN deg d ON e.src = d.src GROUP BY 1),
         pr2 AS (SELECT d.src AS id, 0.15 / (SELECT n FROM nn)
                   + 0.85 * coalesce(c2.s, 0.0) AS pr
                 FROM deg d LEFT JOIN c2 ON d.src = c2.id),
         c3 AS (SELECT e.dst AS id, sum(p.pr / d.deg) AS s
                FROM edges e JOIN pr2 p ON e.src = p.id
                  JOIN deg d ON e.src = d.src GROUP BY 1),
         pr3 AS (SELECT d.src AS id, 0.15 / (SELECT n FROM nn)
                   + 0.85 * coalesce(c3.s, 0.0) AS pr
                 FROM deg d LEFT JOIN c3 ON d.src = c3.id)
         SELECT id, round(pr, 4) AS pr FROM pr3""",

    "dedup_containment" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
           round(CAST(shared AS DOUBLE) / CAST(least(a_n, b_n) AS DOUBLE), 4)
             AS containment
         FROM pairs
         WHERE CAST(shared AS DOUBLE) / CAST(least(a_n, b_n) AS DOUBLE) >= 0.8""",

    "dedup_incremental" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         ninv AS (SELECT doc_id AS new_id, len(sh) AS new_n, unnest(sh) AS g
                  FROM sh WHERE doc_id % 10 < 2),
         cinv AS (SELECT doc_id AS dup_of, len(sh) AS old_n, unnest(sh) AS g
                  FROM sh WHERE doc_id % 10 >= 2),
         pairs AS (
           SELECT new_id, dup_of, count(*) AS shared,
             any_value(new_n) AS new_n, any_value(old_n) AS old_n
           FROM ninv JOIN cinv USING (g)
           GROUP BY 1, 2)
         SELECT new_id, dup_of,
           round(CAST(shared AS DOUBLE) / CAST(new_n + old_n - shared AS DOUBLE), 4)
             AS jaccard
         FROM pairs
         WHERE CAST(shared AS DOUBLE) / CAST(new_n + old_n - shared AS DOUBLE) >= 0.5""",

    "emb_label_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
           round(CAST(sum(q) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000.0), 4) + 0.0 AS c
         FROM (SELECT label,
                 CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0, 0)
                   AS BIGINT) AS q,
                 generate_subscripts(embedding, 1) AS pos
               FROM embeddings)
         GROUP BY 1, 2""",

    "ext_shard_assign" ->
      """SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 8
             AS shard,
           count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents GROUP BY 1""",

    "ext_domain_sample" ->
      s"""WITH per AS (
            SELECT source, CAST(sum(len($toksE)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1),
          t AS (
            SELECT source, CAST(n_tokens AS DOUBLE)
              / CAST(sum(n_tokens) OVER () AS DOUBLE) AS share
            FROM per),
          r AS (
            SELECT source,
              (sqrt(share) / sum(sqrt(share)) OVER ()) / share AS ratio
            FROM t),
          rr AS (
            SELECT source, round(ratio / max(ratio) OVER (), 6) AS rate
            FROM r)
          SELECT d.doc_id, d.source
          FROM documents d JOIN rr USING (source)
          WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT
              % 1000000 AS DOUBLE) / 1000000.0 < rate""",

    "dedup_chunks" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         ch AS (
           SELECT doc_id,
             md5(array_to_string(list_slice(t, i*32 + 1, i*32 + 32), ' ')) AS fp
           FROM toks, unnest(generate_series(0,
             CAST(greatest((len(t)-1)//32, 0) AS BIGINT))) AS u(i))
         SELECT fp, min(doc_id) AS keep_doc, count(*) AS copies
         FROM ch GROUP BY 1 HAVING count(*) > 1""",

    "dedup_substrings" ->
      s"""WITH t AS (SELECT doc_id, $toksLowerE AS t FROM documents),
          w AS (
            SELECT doc_id,
              md5(array_to_string(list_slice(t, i, i + 15), ' ')) AS fp
            FROM t, unnest(generate_series(1, len(t) - 15)) AS u(i)
            WHERE len(t) >= 16)
          SELECT fp, min(doc_id) AS keep_doc,
            CAST(count(*) AS BIGINT) AS occurrences,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM w GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""",

    "text_bpe_pairs" ->
      s"""WITH t AS (SELECT $toksLowerE AS t FROM documents),
          p AS (
            SELECT list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1]) AS ps
            FROM t WHERE len(t) >= 2),
          u AS (SELECT unnest(ps) AS pair FROM p)
          SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY 1
          ORDER BY cnt DESC, pair LIMIT 50""",

    "ext_domain_mix" ->
      s"""WITH per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(len($toksE)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1),
          t AS (
            SELECT *, CAST(n_tokens AS DOUBLE)
              / CAST(sum(n_tokens) OVER () AS DOUBLE) AS share
            FROM per)
          SELECT source, n_docs, n_tokens, round(share, 4) AS share,
            round(sqrt(share) / sum(sqrt(share)) OVER (), 4) AS weight
          FROM t""",

    "dedup_materialize" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM p
           WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5),
         edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                   UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         clusters AS (
           SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)""",

    // rep-based contract (round 13): df + candidates over exact-text
    // representatives; within-group pairs at jaccard 1.0; cross-group
    // member pairs inherit the representatives' jaccard
    "dedup_ngram_blocked" ->
      """WITH dg AS (SELECT doc_id, md5(text) AS g FROM documents),
         grp AS (SELECT g, min(doc_id) AS rep FROM dg GROUP BY 1),
         toks AS (
           SELECT d.doc_id, list_filter(regexp_split_to_array(lower(d.text), '\s+'),
             x -> x <> '') AS t
           FROM documents d JOIN grp ON grp.rep = d.doc_id),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         dfc AS (SELECT s, count(*) AS c FROM inv GROUP BY s),
         inv2 AS (SELECT inv.doc_id, inv.s FROM inv JOIN dfc USING (s)
                  WHERE c BETWEEN 2 AND 10),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM inv2 a JOIN inv2 b ON a.s = b.s AND a.doc_id < b.doc_id),
         wsh AS (SELECT c.a_id, c.b_id, sa.sh AS a_sh, sb.sh AS b_sh
                 FROM cand c JOIN sh sa ON sa.doc_id = c.a_id
                             JOIN sh sb ON sb.doc_id = c.b_id),
         reppairs AS (
           SELECT a_id, b_id,
             round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE)
               / (CAST(len(a_sh) + len(b_sh) AS DOUBLE) - len(list_intersect(a_sh, b_sh))), 4)
               AS jaccard
           FROM wsh
           WHERE CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE)
               / (CAST(len(a_sh) + len(b_sh) AS DOUBLE) - len(list_intersect(a_sh, b_sh))) >= 0.3),
         internal AS (
           SELECT ma.doc_id AS a_id, mb.doc_id AS b_id,
             CAST(1.0 AS DOUBLE) AS jaccard
           FROM dg ma JOIN dg mb ON ma.g = mb.g AND ma.doc_id < mb.doc_id),
         crossp AS (
           SELECT least(ma.doc_id, mb.doc_id) AS a_id,
                  greatest(ma.doc_id, mb.doc_id) AS b_id, p.jaccard
           FROM reppairs p
           JOIN dg ra ON ra.doc_id = p.a_id
           JOIN dg rb ON rb.doc_id = p.b_id
           JOIN dg ma ON ma.g = ra.g
           JOIN dg mb ON mb.g = rb.g)
         SELECT a_id, b_id, jaccard FROM internal
         UNION ALL SELECT a_id, b_id, jaccard FROM crossp""",

    // stop-profile boilerplate pass: candidates are buckets of documents
    // with IDENTICAL above-cap shingle profiles (df over reps, c > 5,
    // bucket size 2..1000), verification and replica expansion identical
    // to dedup_ngram_blocked. Profile equality over string shingles here
    // equals profile equality over hashed shingles on the Spark side
    // (the hash is injective w.h.p., and both sides canonicalize by
    // sorting within their own domain).
    "dedup_stop_profile" ->
      """WITH dg AS (SELECT doc_id, md5(text) AS g FROM documents),
         grp AS (SELECT g, min(doc_id) AS rep FROM dg GROUP BY 1),
         toks AS (
           SELECT d.doc_id, list_filter(regexp_split_to_array(lower(d.text), '\s+'),
             x -> x <> '') AS t
           FROM documents d JOIN grp ON grp.rep = d.doc_id),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         dfc AS (SELECT s, count(*) AS c FROM inv GROUP BY s),
         stops AS (
           SELECT inv.doc_id, list_sort(list(inv.s)) AS stop
           FROM inv JOIN dfc USING (s) WHERE dfc.c > 5
           GROUP BY inv.doc_id),
         sized AS (SELECT stop FROM stops GROUP BY stop
                   HAVING count(*) BETWEEN 2 AND 1000),
         cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM stops a JOIN stops b
                    ON a.stop = b.stop AND a.doc_id < b.doc_id
                  JOIN sized ON sized.stop = a.stop),
         wsh AS (SELECT c.a_id, c.b_id, sa.sh AS a_sh, sb.sh AS b_sh
                 FROM cand c JOIN sh sa ON sa.doc_id = c.a_id
                             JOIN sh sb ON sb.doc_id = c.b_id),
         reppairs AS (
           SELECT a_id, b_id,
             round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE)
               / (CAST(len(a_sh) + len(b_sh) AS DOUBLE) - len(list_intersect(a_sh, b_sh))), 4)
               AS jaccard
           FROM wsh
           WHERE CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE)
               / (CAST(len(a_sh) + len(b_sh) AS DOUBLE) - len(list_intersect(a_sh, b_sh))) >= 0.3),
         internal AS (
           SELECT ma.doc_id AS a_id, mb.doc_id AS b_id,
             CAST(1.0 AS DOUBLE) AS jaccard
           FROM dg ma JOIN dg mb ON ma.g = mb.g AND ma.doc_id < mb.doc_id),
         crossp AS (
           SELECT least(ma.doc_id, mb.doc_id) AS a_id,
                  greatest(ma.doc_id, mb.doc_id) AS b_id, p.jaccard
           FROM reppairs p
           JOIN dg ra ON ra.doc_id = p.a_id
           JOIN dg rb ON rb.doc_id = p.b_id
           JOIN dg ma ON ma.g = ra.g
           JOIN dg mb ON mb.g = rb.g)
         SELECT a_id, b_id, jaccard FROM internal
         UNION ALL SELECT a_id, b_id, jaccard FROM crossp""",

    // family-level stop-profile product: group member docs by their
    // representative's above-cap shingle profile (df over reps, c > 5),
    // families of >= 2 members; family_id = min member doc id is the
    // hash-independent cluster key both sides derive identically.
    "dedup_stop_profile_families" ->
      """WITH dg AS (SELECT doc_id, md5(text) AS g FROM documents),
         grp AS (SELECT g, min(doc_id) AS rep FROM dg GROUP BY 1),
         toks AS (
           SELECT d.doc_id, list_filter(regexp_split_to_array(lower(d.text), '\s+'),
             x -> x <> '') AS t
           FROM documents d JOIN grp ON grp.rep = d.doc_id),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         dfc AS (SELECT s, count(*) AS c FROM inv GROUP BY s),
         stops AS (
           SELECT inv.doc_id, list_sort(list(inv.s)) AS stop
           FROM inv JOIN dfc USING (s) WHERE dfc.c > 5
           GROUP BY inv.doc_id),
         memb AS (
           SELECT m.doc_id AS doc_id, st.stop AS stop
           FROM dg m JOIN grp ON grp.g = m.g
           JOIN stops st ON st.doc_id = grp.rep),
         fam AS (
           SELECT stop, min(doc_id) AS family_id, count(*) AS family_size
           FROM memb GROUP BY stop HAVING count(*) >= 2)
         SELECT f.family_id, m.doc_id, f.family_size
         FROM memb m JOIN fam f ON f.stop = m.stop""",

    "dedup_prefix" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents
           WHERE doc_id % (SELECT CASE WHEN count(*) <= 5000 THEN 1
             ELSE (count(*) + 4999) // 5000 END FROM documents) = 0),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
             any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
           round(CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE), 4)
             AS jaccard
         FROM p
         WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.7""",

    "stream_upsert" ->
      """SELECT user_id, event_type AS last_type, round(value, 4) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1""",

    // sign-LSH ANN restated end to end: hyperplane component (p, i) is
    // the portable md5-56 of "p_i" mapped to [-1, 1) (the identical
    // expression the Spark side evaluates), bucket = OR of 6 sign bits,
    // probes = own bucket + every 1-bit flip, candidates = corpus
    // vectors in a probe bucket, exact cosine re-rank top-5. Dot
    // products are strict index-order double folds on both engines, so
    // the sign decisions agree bit-for-bit.
    "ann_lsh_topk" ->
      """WITH bits AS (
           SELECT vec_id, p,
             CASE WHEN list_sum(list_transform(embedding, (v, i) ->
                 CAST(v AS DOUBLE) *
                   (('0x' || substr(md5(CAST(p AS VARCHAR) || '_' ||
                     CAST(i - 1 AS VARCHAR)), 1, 14))::BIGINT
                    / 36028797018963968.0 - 1.0))) >= 0
               THEN (1::BIGINT << p) ELSE 0::BIGINT END AS bit
           FROM embeddings, range(6) t(p)),
         bk AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket
                FROM bits GROUP BY 1),
         probes AS (
           SELECT qb.vec_id AS q_id, xor(qb.bucket, f.v) AS pb
           FROM bk qb, (VALUES (0::BIGINT), (1), (2), (4), (8), (16), (32)) f(v)
           WHERE qb.vec_id < 10),
         cand AS (
           SELECT DISTINCT p.q_id, cb.vec_id AS n_id
           FROM probes p JOIN bk cb
             ON cb.bucket = p.pb AND cb.vec_id <> p.q_id),
         scored AS (
           SELECT c.q_id, c.n_id,
             list_cosine_similarity(q.embedding::DOUBLE[],
               n.embedding::DOUBLE[]) AS cosine
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.q_id
           JOIN embeddings n ON n.vec_id = c.n_id)
         SELECT q_id, n_id, round(cosine, 4) AS cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, n_id ASC) AS rn FROM scored)
         WHERE rn <= 5""",

    // IVF ANN restated end to end, Lloyd training unrolled (the
    // graph_pagerank precedent for iterative oracles): init = the 16
    // lowest-id vectors (bucket index = id order), then 3 rounds of
    // {assign every vector to its cosine-argmax centroid (ties -> lowest
    // bucket), recompute centroids as per-(bucket, dim) means cast to
    // REAL — the same float32 quantization the Spark side applies, which
    // absorbs double-summation reassociation between engines; empty
    // buckets keep their centroid}. Queries probe their 4 nearest final
    // centroids (struct-sort ties -> HIGHEST bucket, matching the Spark
    // reverse(array_sort)), candidates come from those buckets only,
    // exact cosine re-rank top-5.
    "ann_ivf_topk" -> {
      def assign(cents: String, name: String, tie: String = "ASC") =
        s"""$name AS (SELECT vec_id, b FROM (
             SELECT e.vec_id, c.b,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cent) DESC,
                   c.b $tie) AS rn
             FROM e CROSS JOIN $cents c) WHERE rn = 1)"""
      def update(asg: String, prev: String, un: String, cn: String) =
        s"""$un AS (SELECT a.b, x.pos,
               CAST(CAST(avg(x.val) AS REAL) AS DOUBLE) AS m
             FROM $asg a JOIN x USING (vec_id) GROUP BY 1, 2),
           $cn AS (SELECT c.b, CASE WHEN count(u.m) > 0
               THEN list(u.m ORDER BY u.pos)
               ELSE any_value(c.cent) END AS cent
             FROM $prev c LEFT JOIN $un u ON c.b = u.b GROUP BY c.b)"""
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         x AS (SELECT vec_id, unnest(v) AS val,
                 generate_subscripts(v, 1) AS pos FROM e),
         c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS b, v AS cent
                FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
         ${assign("c0", "a1")},
         ${update("a1", "c0", "u1", "c1")},
         ${assign("c1", "a2")},
         ${update("a2", "c1", "u2", "c2")},
         ${assign("c2", "a3")},
         ${update("a3", "c2", "u3", "c3")},
         ${assign("c3", "af")},
         pr AS (SELECT vec_id AS q_id, b AS bucket FROM (
             SELECT e.vec_id, c.b,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cent) DESC,
                   c.b DESC) AS rn
             FROM e CROSS JOIN c3 c WHERE e.vec_id < 10) WHERE rn <= 4),
         cand AS (SELECT p.q_id, a.vec_id AS n_id
                  FROM pr p JOIN af a ON a.b = p.bucket
                  WHERE a.vec_id <> p.q_id),
         scored AS (
           SELECT c.q_id, c.n_id,
             list_cosine_similarity(q.v, n.v) AS cosine
           FROM cand c
           JOIN e q ON q.vec_id = c.q_id
           JOIN e n ON n.vec_id = c.n_id)
         SELECT q_id, n_id, round(cosine, 4) AS cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, n_id ASC) AS rn FROM scored)
         WHERE rn <= 5"""
    },

    // Flat PQ against the PERSISTED state (round 19): iters=2 codebooks
    // (`pq_codebooks_i2`) + the code table (`pq_codes`) — the oracle
    // restates only the query-time path (ADC over every code row,
    // refine*k=20 shortlist, exact float-cosine re-rank).
    "ann_pq_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cb2 AS (SELECT s, j, cent
                 FROM '$ArtifactToken/pq_codebooks_i2/*.parquet'),
         ef AS (SELECT n_id AS vec_id, t.s, codes[t.s + 1] AS code
                FROM '$ArtifactToken/pq_codes/*.parquet', range(8) t(s)),
         nrm AS (SELECT s, j, list_sum(list_transform(cent, x -> x * x)) AS w
                 FROM cb2),
         q AS (SELECT vec_id AS q_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS qn
               FROM e WHERE vec_id < 10),
         dots AS (SELECT q.q_id, c.s, c.j,
                 list_sum(list_transform(c.cent, (x, i) ->
                   x * q.v[c.s * 8 + i])) AS d
               FROM q CROSS JOIN cb2 c),
         adc AS (
           SELECT q.q_id, f.vec_id AS n_id,
             sum(d.d) / (any_value(q.qn) * sqrt(sum(n.w))) AS adc
           FROM q
           JOIN ef f ON f.vec_id <> q.q_id
           JOIN dots d ON d.q_id = q.q_id AND d.s = f.s AND d.j = f.code
           JOIN nrm n ON n.s = f.s AND n.j = f.code
           GROUP BY 1, 2),
         short AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY adc DESC, n_id ASC) AS rn FROM adc)
           WHERE rn <= 20),
         scored AS (
           SELECT s.q_id, s.n_id,
             list_cosine_similarity(q.v, n.v) AS cosine
           FROM short s
           JOIN e q ON q.vec_id = s.q_id
           JOIN e n ON n.vec_id = s.n_id)
         SELECT q_id, n_id, round(cosine, 4) AS cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, n_id ASC) AS rn FROM scored)
         WHERE rn <= 5""",

    // IVF+PQ against the PERSISTED trained state (round 19 — the int8/
    // residual discipline): the oracle reads the same parquet the engine
    // collected its plan literals from (`ivf_centroids` — shared with
    // ann_ivf_topk's training — plus `pq_codebooks` and the coded corpus
    // `ivfpq_codes`), then restates only the query-time path: probe list
    // (cosine desc, ties lowest b), ADC over the code column, refine*k=20
    // shortlist, exact float-cosine re-rank. Training is no longer
    // unrolled here — it happened once, into the artifacts both sides
    // read.
    "ann_ivfpq_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         c3 AS (SELECT bucket AS b, centroid::DOUBLE[] AS cent
                FROM '$ArtifactToken/ivf_centroids/*.parquet'),
         cb3 AS (SELECT s, j, cent
                 FROM '$ArtifactToken/pq_codebooks/*.parquet'),
         cd AS (SELECT n_id, bucket, codes
                FROM '$ArtifactToken/ivfpq_codes/*.parquet'),
         af AS (SELECT n_id AS vec_id, bucket AS b FROM cd),
         ef AS (SELECT n_id AS vec_id, t.s, codes[t.s + 1] AS code
                FROM cd, range(8) t(s)),
         nrm AS (SELECT s, j, list_sum(list_transform(cent, x -> x * x)) AS w
                 FROM cb3),
         q AS (SELECT vec_id AS q_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS qn
               FROM e WHERE vec_id < 10),
         pr AS (SELECT q_id, b AS bucket FROM (
             SELECT q.q_id, c.b,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(q.v, c.cent) DESC,
                   c.b ASC) AS rn
             FROM q CROSS JOIN c3 c) WHERE rn <= 6),
         dots AS (SELECT q.q_id, c.s, c.j,
                 list_sum(list_transform(c.cent, (x, i) ->
                   x * q.v[c.s * 8 + i])) AS d
               FROM q CROSS JOIN cb3 c),
         adc AS (
           SELECT q.q_id, f.vec_id AS n_id,
             sum(d.d) / (any_value(q.qn) * sqrt(sum(n.w))) AS adc
           FROM q
           JOIN af a ON a.vec_id <> q.q_id
             AND a.b IN (SELECT bucket FROM pr p WHERE p.q_id = q.q_id)
           JOIN ef f ON f.vec_id = a.vec_id
           JOIN dots d ON d.q_id = q.q_id AND d.s = f.s AND d.j = f.code
           JOIN nrm n ON n.s = f.s AND n.j = f.code
           GROUP BY 1, 2),
         short AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY adc DESC, n_id ASC) AS rn FROM adc)
           WHERE rn <= 20),
         scored AS (
           SELECT s.q_id, s.n_id,
             list_cosine_similarity(q.v, n.v) AS cosine
           FROM short s
           JOIN e q ON q.vec_id = s.q_id
           JOIN e n ON n.vec_id = s.n_id)
         SELECT q_id, n_id, round(cosine, 4) AS cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, n_id ASC) AS rn FROM scored)
         WHERE rn <= 5""",

    // Residual IVF+PQ against the PERSISTED index: the oracle reads the
    // same parquet the engine collected its plan literals from
    // (`ivf_centroids` — shared with ann_ivf_topk's training —
    // `residual_codebooks`, and since round 19 the coded corpus
    // `residual_codes`; [[ArtifactToken]] resolves to the corpus's
    // artifact root in Verify), then restates only the query-time path:
    // the residual-ADC decomposition <q,c_b> + <q,r̂> over
    // sqrt(||c_b||^2 + 2<c_b,r̂> + ||r̂||^2) over the code column,
    // refine*k=80 shortlist, exact float-cosine re-rank. Assign + encode
    // are no longer restated per query — they happened once, into the
    // artifact both sides read.
    "ann_ivfpq_residual" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cent AS (SELECT bucket AS b, centroid::DOUBLE[] AS cent
                  FROM '$ArtifactToken/ivf_centroids/*.parquet'),
         cb AS (SELECT s, j, cent
                FROM '$ArtifactToken/residual_codebooks/*.parquet'),
         cd AS (SELECT n_id, bucket, codes
                FROM '$ArtifactToken/residual_codes/*.parquet'),
         asg AS (SELECT n_id AS vec_id, bucket AS b FROM cd),
         enc AS (SELECT n_id AS vec_id, t.s, codes[t.s + 1] AS code
                 FROM cd, range(8) t(s)),
         nrm AS (SELECT s, j, list_sum(list_transform(cent, x -> x * x)) AS w
                 FROM cb),
         cbn AS (SELECT b, list_sum(list_transform(cent, x -> x * x)) AS w
                 FROM cent),
         blut AS (SELECT c.b, k.s, k.j,
             list_sum(list_transform(k.cent, (x, i) ->
               x * c.cent[k.s * 8 + i])) AS d
           FROM cent c CROSS JOIN cb k),
         q AS (SELECT vec_id AS q_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS qn
               FROM e WHERE vec_id < 10),
         pr AS (SELECT q_id, b AS bucket FROM (
             SELECT q.q_id, c.b,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(q.v, c.cent) DESC,
                   c.b ASC) AS rn
             FROM q CROSS JOIN cent c) WHERE rn <= 8),
         qc AS (SELECT q.q_id, c.b,
             list_sum(list_transform(q.v, (x, i) -> x * c.cent[i])) AS d
           FROM q CROSS JOIN cent c),
         dots AS (SELECT q.q_id, c.s, c.j,
             list_sum(list_transform(c.cent, (x, i) ->
               x * q.v[c.s * 8 + i])) AS d
           FROM q CROSS JOIN cb c),
         adc AS (
           SELECT q.q_id, a.vec_id AS n_id,
             (any_value(qc.d) + sum(d.d)) /
               (any_value(q.qn) * sqrt(any_value(cbn.w)
                 + 2.0 * sum(bl.d) + sum(n.w))) AS adc
           FROM q
           JOIN asg a ON a.vec_id <> q.q_id
             AND a.b IN (SELECT bucket FROM pr p WHERE p.q_id = q.q_id)
           JOIN enc f ON f.vec_id = a.vec_id
           JOIN dots d ON d.q_id = q.q_id AND d.s = f.s AND d.j = f.code
           JOIN nrm n ON n.s = f.s AND n.j = f.code
           JOIN blut bl ON bl.b = a.b AND bl.s = f.s AND bl.j = f.code
           JOIN qc ON qc.q_id = q.q_id AND qc.b = a.b
           JOIN cbn ON cbn.b = a.b
           GROUP BY 1, 2),
         short AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY adc DESC, n_id ASC) AS rn FROM adc)
           WHERE rn <= 80),
         scored AS (
           SELECT s.q_id, s.n_id,
             list_cosine_similarity(q.v, n.v) AS cosine
           FROM short s
           JOIN e q ON q.vec_id = s.q_id
           JOIN e n ON n.vec_id = s.n_id)
         SELECT q_id, n_id, round(cosine, 4) AS cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, n_id ASC) AS rn FROM scored)
         WHERE rn <= 5""",

    // increment assignment against the PERSISTED base-slice centroids
    // (round 20 — the `ivf_centroids` discipline): the oracle reads the
    // same `ivf_centroids_base` parquet the engine collected its plan
    // literals from and restates only the query-time path — nearest-
    // centroid assignment of the increment slice (ties -> lowest bucket,
    // like every ivfAssign). Training is no longer unrolled here — it
    // happened once, into the artifact both sides read.
    "ann_ivf_increment" ->
      s"""WITH inc AS (SELECT vec_id, embedding::DOUBLE[] AS v
                FROM embeddings WHERE vec_id % 10 < 2),
         cent AS (SELECT bucket AS b, centroid::DOUBLE[] AS cent
                FROM '$ArtifactToken/ivf_centroids_base/*.parquet'),
         af AS (SELECT vec_id, b FROM (
             SELECT e.vec_id, c.b,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cent) DESC,
                   c.b ASC) AS rn
             FROM inc e CROSS JOIN cent c) WHERE rn = 1)
         SELECT vec_id, CAST(b AS BIGINT) AS bucket FROM af""",

    // identical funnel to dedup_incremental: the streaming run must
    // reproduce the one-shot batch incremental join exactly
    "stream_dedup_near" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
             x -> x <> '') AS t FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t)-2),
               i -> array_to_string(list_slice(t, i, i+2), ' '))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM toks),
         ninv AS (SELECT doc_id AS new_id, len(sh) AS new_n, unnest(sh) AS g
                  FROM sh WHERE doc_id % 10 < 2),
         cinv AS (SELECT doc_id AS dup_of, len(sh) AS old_n, unnest(sh) AS g
                  FROM sh WHERE doc_id % 10 >= 2),
         pairs AS (
           SELECT new_id, dup_of, count(*) AS shared,
             any_value(new_n) AS new_n, any_value(old_n) AS old_n
           FROM ninv JOIN cinv USING (g)
           GROUP BY 1, 2)
         SELECT new_id, dup_of,
           round(CAST(shared AS DOUBLE) / CAST(new_n + old_n - shared AS DOUBLE), 4)
             AS jaccard
         FROM pairs
         WHERE CAST(shared AS DOUBLE) / CAST(new_n + old_n - shared AS DOUBLE) >= 0.5""",

    "dedup_embedding_cosine" ->
      """WITH es AS (
           SELECT * FROM embeddings
           WHERE vec_id % (SELECT CASE WHEN count(*) <= 2000 THEN 1
             ELSE (count(*) + 1999) // 2000 END FROM embeddings) = 0)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
             b.embedding::DOUBLE[]), 4) AS cosine
         FROM es a JOIN es b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[],
           b.embedding::DOUBLE[]) >= 0.45""",

    // banded sign-LSH near-dup restated: plane (band*ppb + p) component
    // = portable md5-56 of "plane_dim" in [-1, 1); band bucket = ppb
    // sign bits where ppb is the corpus-size-derived band width
    // (smallest p in [4,16] with N <= 128*2^p — the same integer
    // piecewise as Similarity.planesForCorpus); candidates share some
    // (band, bucket); exact cosine >= 0.45
    "dedup_embedding_lsh" ->
      """WITH params AS (
           SELECT (CASE WHEN n <= 2048 THEN 4 WHEN n <= 4096 THEN 5
             WHEN n <= 8192 THEN 6 WHEN n <= 16384 THEN 7
             WHEN n <= 32768 THEN 8 WHEN n <= 65536 THEN 9
             WHEN n <= 131072 THEN 10 WHEN n <= 262144 THEN 11
             WHEN n <= 524288 THEN 12 WHEN n <= 1048576 THEN 13
             WHEN n <= 2097152 THEN 14 WHEN n <= 4194304 THEN 15
             ELSE 16 END) AS ppb
           FROM (SELECT count(*) AS n FROM embeddings)),
         bits AS (
           SELECT vec_id, CAST(pl // ppb AS BIGINT) AS band,
             CASE WHEN list_sum(list_transform(embedding, (v, i) ->
                 CAST(v AS DOUBLE) *
                   (('0x' || substr(md5(CAST(pl AS VARCHAR) || '_' ||
                     CAST(i - 1 AS VARCHAR)), 1, 14))::BIGINT
                    / 36028797018963968.0 - 1.0))) >= 0
               THEN (1::BIGINT << CAST(pl % ppb AS INT)) ELSE 0::BIGINT END AS bit
           FROM embeddings, params,
             (SELECT unnest(range(0, 16 * ppb)) AS pl FROM params) t),
         bk AS (SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bucket
                FROM bits GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
           FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id)
         SELECT c.a_id, c.b_id,
           round(list_cosine_similarity(x.embedding::DOUBLE[],
             y.embedding::DOUBLE[]), 4) AS cosine
         FROM cand c
         JOIN embeddings x ON x.vec_id = c.a_id
         JOIN embeddings y ON y.vec_id = c.b_id
         WHERE list_cosine_similarity(x.embedding::DOUBLE[],
           y.embedding::DOUBLE[]) >= 0.45""",

    // the embedding-LSH banded contract + recursive closure, exactly
    // like dedup_clusters' oracle over the text pair table
    "dedup_embedding_clusters" ->
      """WITH RECURSIVE params AS (
           SELECT (CASE WHEN n <= 2048 THEN 4 WHEN n <= 4096 THEN 5
             WHEN n <= 8192 THEN 6 WHEN n <= 16384 THEN 7
             WHEN n <= 32768 THEN 8 WHEN n <= 65536 THEN 9
             WHEN n <= 131072 THEN 10 WHEN n <= 262144 THEN 11
             WHEN n <= 524288 THEN 12 WHEN n <= 1048576 THEN 13
             WHEN n <= 2097152 THEN 14 WHEN n <= 4194304 THEN 15
             ELSE 16 END) AS ppb
           FROM (SELECT count(*) AS n FROM embeddings)),
         bits AS (
           SELECT vec_id, CAST(pl // ppb AS BIGINT) AS band,
             CASE WHEN list_sum(list_transform(embedding, (v, i) ->
                 CAST(v AS DOUBLE) *
                   (('0x' || substr(md5(CAST(pl AS VARCHAR) || '_' ||
                     CAST(i - 1 AS VARCHAR)), 1, 14))::BIGINT
                    / 36028797018963968.0 - 1.0))) >= 0
               THEN (1::BIGINT << CAST(pl % ppb AS INT)) ELSE 0::BIGINT END AS bit
           FROM embeddings, params,
             (SELECT unnest(range(0, 16 * ppb)) AS pl FROM params) t),
         bk AS (SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bucket
                FROM bits GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
           FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id),
         pairs AS (
           SELECT c.a_id, c.b_id
           FROM cand c
           JOIN embeddings x ON x.vec_id = c.a_id
           JOIN embeddings y ON y.vec_id = c.b_id
           WHERE list_cosine_similarity(x.embedding::DOUBLE[],
             y.embedding::DOUBLE[]) >= 0.45),
         edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                   UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""",

    "ann_brute_topk" ->
      """SELECT q_id, rank, n_id, round(cosine, 4) AS cosine FROM (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             list_cosine_similarity(q.embedding::DOUBLE[],
               c.embedding::DOUBLE[]) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                 c.embedding::DOUBLE[]) DESC, c.vec_id ASC) AS rank
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10)
         WHERE rank <= 5""",

    "ann_knn_classify" ->
      """WITH nn AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                   c.embedding::DOUBLE[]) DESC, c.vec_id ASC) AS rank
             FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
             WHERE q.vec_id < 50)
           WHERE rank <= 5),
         votes AS (
           SELECT nn.q_id, e.label, CAST(count(*) AS BIGINT) AS votes
           FROM nn JOIN embeddings e ON nn.n_id = e.vec_id
           GROUP BY 1, 2),
         best AS (
           SELECT q_id, label, votes FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY votes DESC, label ASC) AS rn FROM votes)
           WHERE rn = 1)
         SELECT b.q_id, b.label AS pred_label, b.votes,
           t.label AS true_label, (b.label = t.label) AS correct
         FROM best b JOIN embeddings t ON b.q_id = t.vec_id""",

    "mm_meta" ->
      """SELECT doc_id AS media_id, 'application/octet-stream' AS mime,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents""",

    // lossless-PNG oracle: the decoded raster equals the deterministic
    // generation formula (Multimodal.scala imgW/imgH/pxR/pxG/pxB), so the
    // expected channel sums are a relational double loop over (x, y) —
    // no codec on the DuckDB side, exact equality on the Spark side
    "mm_features" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
             8 + (doc_id * 7) % 9 AS h FROM documents),
         px AS (SELECT doc_id, w, h, tx.x AS x, ty.y AS y
           FROM d,
             UNNEST(generate_series(0, w - 1)) AS tx(x),
             UNNEST(generate_series(0, h - 1)) AS ty(y))
         SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum((doc_id*31 + x*7 + y*13) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id*17 + x*3 + y*5) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id*13 + x*11 + y*3) % 256) AS BIGINT) AS sum_b
         FROM px GROUP BY doc_id, w, h""",

    // nearest-neighbor 2x downsample: out(x,y) = in(2x, 2y), so the
    // expected sums are the same formula sampled at even coordinates
    "mm_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
             8 + (doc_id * 7) % 9 AS h FROM documents),
         r AS (SELECT doc_id, w // 2 AS ow, h // 2 AS oh FROM d),
         px AS (SELECT doc_id, ow, oh, tx.x AS x, ty.y AS y
           FROM r,
             UNNEST(generate_series(0, ow - 1)) AS tx(x),
             UNNEST(generate_series(0, oh - 1)) AS ty(y))
         SELECT doc_id AS media_id,
           CAST(ow AS BIGINT) AS out_w, CAST(oh AS BIGINT) AS out_h,
           CAST(sum((doc_id*31 + (2*x)*7 + (2*y)*13) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id*17 + (2*x)*3 + (2*y)*5) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id*13 + (2*x)*11 + (2*y)*3) % 256) AS BIGINT) AS sum_b
         FROM px GROUP BY doc_id, ow, oh""",

    "mm_chunks" ->
      """WITH m AS (SELECT doc_id,
           CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks
         FROM documents)
         SELECT doc_id AS media_id, n_chunks,
           CAST(len(list_filter(generate_series(0, CAST(greatest(n_chunks - 1, 0) AS BIGINT)),
             i -> i % 4 = 0)) AS BIGINT) AS n_kept
         FROM m""",

    // lossless-WAV oracle: decoded PCM16 equals the integer waveform
    // formula; zero crossings via a lag window per clip
    "mm_audio_features" ->
      """WITH d AS (SELECT doc_id, 800 + (doc_id % 5) * 200 AS n FROM documents),
         s AS (SELECT doc_id, n, t.t AS t,
             ((doc_id*31 + t.t*t.t*7 + t.t*13) % 65536) - 32768 AS v
           FROM d, UNNEST(generate_series(0, n - 1)) AS t(t)),
         z AS (SELECT doc_id, n, v,
             CASE WHEN t > 0 AND ((v < 0) <>
               (lag(v) OVER (PARTITION BY doc_id ORDER BY t) < 0))
             THEN 1 ELSE 0 END AS zc
           FROM s)
         SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v*v) AS BIGINT) AS sum_sq,
           CAST(sum(zc) AS BIGINT) AS zero_cross
         FROM z GROUP BY doc_id, n""",

    // every 2nd sample: out(k) = in(2k)
    "mm_audio_downsample" ->
      """WITH d AS (SELECT doc_id,
             (800 + (doc_id % 5) * 200) // 2 AS m FROM documents),
         s AS (SELECT doc_id, m,
             ((doc_id*31 + (2*k.k)*(2*k.k)*7 + (2*k.k)*13) % 65536) - 32768 AS v
           FROM d, UNNEST(generate_series(0, m - 1)) AS k(k))
         SELECT doc_id AS media_id, CAST(m AS BIGINT) AS n_out,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v*v) AS BIGINT) AS sum_sq
         FROM s GROUP BY doc_id, m""",

    // every 2nd frame of the deterministic clip (f % 2 = 0), per-frame
    // channel sums from the frame formula — decoded PNG pixels equal it
    // because PNG is lossless
    "mm_video_frames" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf, 6 + doc_id % 3 AS w,
             6 + (doc_id * 5) % 3 AS h FROM documents),
         fr AS (SELECT doc_id, w, h, tf.f AS f
           FROM d, UNNEST(generate_series(0, nf - 1)) AS tf(f)
           WHERE tf.f % 2 = 0),
         px AS (SELECT doc_id, w, h, f, tx.x AS x, ty.y AS y
           FROM fr,
             UNNEST(generate_series(0, w - 1)) AS tx(x),
             UNNEST(generate_series(0, h - 1)) AS ty(y))
         SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(sum((doc_id*31 + f*19 + x*7 + y*13) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id*17 + f*23 + x*3 + y*5) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id*13 + f*29 + x*11 + y*3) % 256) AS BIGINT) AS sum_b
         FROM px GROUP BY doc_id, f, w, h""",

    // standard-GIF frames: gray(f,x,y) = the vpxR formula; GIF indexed
    // color over the 256-gray palette is lossless, so decoded sums equal
    // the formula exactly (all frames, no stride)
    "mm_video_gif" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf, 6 + doc_id % 3 AS w,
             6 + (doc_id * 5) % 3 AS h FROM documents),
         px AS (SELECT doc_id, w, h, tf.f AS f, tx.x AS x, ty.y AS y
           FROM d,
             UNNEST(generate_series(0, nf - 1)) AS tf(f),
             UNNEST(generate_series(0, w - 1)) AS tx(x),
             UNNEST(generate_series(0, h - 1)) AS ty(y))
         SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(sum((doc_id*31 + f*19 + x*7 + y*13) % 256) AS BIGINT) AS sum_v
         FROM px GROUP BY doc_id, f, w, h""",

    // consecutive-frame abs pixel diffs: |px(f) - px(f-1)| summed per
    // channel over f in 1..nf-1 and all pixels
    "mm_video_motion" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf, 6 + doc_id % 3 AS w,
             6 + (doc_id * 5) % 3 AS h FROM documents),
         px AS (SELECT doc_id, nf, tf.f AS f, tx.x AS x, ty.y AS y
           FROM d,
             UNNEST(generate_series(1, nf - 1)) AS tf(f),
             UNNEST(generate_series(0, w - 1)) AS tx(x),
             UNNEST(generate_series(0, h - 1)) AS ty(y))
         SELECT doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(sum(abs((doc_id*31 + f*19 + x*7 + y*13) % 256
             - (doc_id*31 + (f-1)*19 + x*7 + y*13) % 256)) AS BIGINT) AS motion_r,
           CAST(sum(abs((doc_id*17 + f*23 + x*3 + y*5) % 256
             - (doc_id*17 + (f-1)*23 + x*3 + y*5) % 256)) AS BIGINT) AS motion_g,
           CAST(sum(abs((doc_id*13 + f*29 + x*11 + y*3) % 256
             - (doc_id*13 + (f-1)*29 + x*11 + y*3) % 256)) AS BIGINT) AS motion_b
         FROM px GROUP BY doc_id, nf""",

    // streamed decode == batch decode: all frames, stride 1
    "stream_media_decode" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf, 6 + doc_id % 3 AS w,
             6 + (doc_id * 5) % 3 AS h FROM documents),
         px AS (SELECT doc_id, w, h, tf.f AS f, tx.x AS x, ty.y AS y
           FROM d,
             UNNEST(generate_series(0, nf - 1)) AS tf(f),
             UNNEST(generate_series(0, w - 1)) AS tx(x),
             UNNEST(generate_series(0, h - 1)) AS ty(y))
         SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(sum((doc_id*31 + f*19 + x*7 + y*13) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id*17 + f*23 + x*3 + y*5) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id*13 + f*29 + x*11 + y*3) % 256) AS BIGINT) AS sum_b
         FROM px GROUP BY doc_id, f, w, h""",

    // per-pair abs channel diffs from the formula, thresholded at
    // 128 * pixels (same expression order as the entry)
    "mm_video_keyframes" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf, 6 + doc_id % 3 AS w,
             6 + (doc_id * 5) % 3 AS h FROM documents),
         px AS (SELECT doc_id, w, h, tf.f AS f, tx.x AS x, ty.y AS y
           FROM d,
             UNNEST(generate_series(1, nf - 1)) AS tf(f),
             UNNEST(generate_series(0, w - 1)) AS tx(x),
             UNNEST(generate_series(0, h - 1)) AS ty(y)),
         agg AS (SELECT doc_id, f, w, h,
             sum(abs((doc_id*31 + f*19 + x*7 + y*13) % 256
                   - (doc_id*31 + (f-1)*19 + x*7 + y*13) % 256)
               + abs((doc_id*17 + f*23 + x*3 + y*5) % 256
                   - (doc_id*17 + (f-1)*23 + x*3 + y*5) % 256)
               + abs((doc_id*13 + f*29 + x*11 + y*3) % 256
                   - (doc_id*13 + (f-1)*29 + x*11 + y*3) % 256)) AS dt
           FROM px GROUP BY doc_id, f, w, h)
         SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(dt AS BIGINT) AS diff_total
         FROM agg WHERE dt > 128 * w * h""",

    // same portable md5-56 hash the Spark side computes; pos restarts
    // per shard so no global sort exists on either engine
    "ext_shuffle_order" ->
      """WITH t AS (SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS h
           FROM documents)
         SELECT doc_id, h % 32 AS shard,
           CAST(row_number() OVER (PARTITION BY h % 32 ORDER BY h, doc_id)
             AS BIGINT) AS pos
         FROM t""",

    "ext_deterministic_split" ->
      "SELECT doc_id, lang FROM documents WHERE doc_id % 100 < 10",

    "ext_stratified_cap" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY doc_id ASC) AS rn FROM documents) WHERE rn <= 50""",

    "ext_quality_profile" ->
      ("SELECT source, count(*) AS n_docs, " +
       "count(CASE WHEN text IS NULL OR text = '' THEN 1 END) AS n_blank, " +
       "count(CASE WHEN length(text) < 100 THEN 1 END) AS n_short, " +
       "round(avg(n_chars), 4) AS avg_chars FROM documents GROUP BY 1"),

    "sessionize" ->
      """WITH g AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1
                  ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts,
             -- CAST: DuckDB sum(INTEGER) is HUGEINT, which pandas turns
             -- into float64 ("3.0" vs Spark's "3" under a str compare)
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
         FROM s GROUP BY 1, 2""",

    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2""",

    "stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "stream_join" ->
      """SELECT l.event_id AS l_id, r.event_id AS r_id
         FROM events l JOIN events r
           ON l.user_id = r.user_id
          AND l.event_type = 'purchase' AND r.event_type = 'click'
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE""",

    "stream_sessionize" ->
      """WITH g AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1
                  ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM g),
         sess AS (
           SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
           FROM s GROUP BY 1, 2)
         SELECT user_id, session_start, session_end, n_events
         FROM sess
         WHERE session_id < (SELECT max(session_id) FROM sess s2
                             WHERE s2.user_id = sess.user_id)"""
    // every ANN entry is oracled (portable hyperplanes / unrolled Lloyd);
    // ext_approx_distinct is oracled via its tolerance verdict (SparkEntry)
  )
}
