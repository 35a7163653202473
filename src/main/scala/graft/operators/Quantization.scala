package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding quantization: int8 scalar quantization with per-dimension
  * affine ranges.
  *
  * At 100 TB an embedding column is routinely the widest thing in the
  * table — float32 x 1k dims = 4 KB/row. Int8 quantization cuts storage
  * and shuffle volume 4x while preserving neighbor ordering well enough
  * for candidate generation (exact re-rank can read the float column for
  * the handful of survivors).
  *
  * Train = one aggregate pass for per-dim (min, max); encode/decode are
  * pure array expressions. Ranges are driver-held literals (dims x 2
  * doubles), baked into the plan like the IVF centroids — no broadcast
  * state, identical on every executor.
  */
object Quantization {

  /** Per-dimension (min, max) over the corpus — one explode + groupBy
    * pass, dims rows collected. */
  def trainRanges(df: DataFrame, vecCol: String): Array[(Double, Double)] = {
    val stats = df.select(posexplode(col(vecCol)))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
      .collect()
    val out = new Array[(Double, Double)](stats.length)
    stats.foreach { r =>
      out(r.getInt(0)) = (r.getFloat(1).toDouble, r.getFloat(2).toDouble)
    }
    out
  }

  /** Encode float vector -> int8 codes (stored as array<int> in [0,255]
    * for parquet simplicity; a production layout would pack to binary). */
  def encode(vec: Column, ranges: Array[(Double, Double)]): Column = {
    val mins = lit(ranges.map(_._1))
    val scales = lit(ranges.map { case (mn, mx) =>
      if (mx > mn) 255.0 / (mx - mn) else 0.0 })
    zip_with(vec, sequence(lit(0), lit(ranges.length - 1)), (v, i) =>
      round((v.cast(DoubleType) - element_at(mins, i + 1))
        * element_at(scales, i + 1)).cast(IntegerType))
  }

  /** Decode int8 codes back to (approximate) doubles. */
  def decode(codes: Column, ranges: Array[(Double, Double)]): Column = {
    val mins = lit(ranges.map(_._1))
    val invScales = lit(ranges.map { case (mn, mx) =>
      if (mx > mn) (mx - mn) / 255.0 else 0.0 })
    zip_with(codes, sequence(lit(0), lit(ranges.length - 1)), (c, i) =>
      c.cast(DoubleType) * element_at(invScales, i + 1) + element_at(mins, i + 1))
  }

  /** Cosine similarity computed on decoded int8 vectors (double math in
    * index order, like [[Similarity.cosineComposable]]). */
  def cosineQuantized(a: Column, b: Column,
                      ranges: Array[(Double, Double)]): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val da = decode(a, ranges)
    val db = decode(b, ranges)
    dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db)))
  }

  // ------------------------------------------------ product quantization

  /** PQ codebooks: `m` subspaces x `k` centroids x (dim/m) doubles.
    *
    * Train = deterministic init (subvectors of the k lowest-id vectors) +
    * `iters` Lloyd rounds. Each round is ONE distributed pass — encode
    * every vector (codegen'd argmin per subspace), explode to
    * (subspace, code, dim, value), average — and only the m*k*(dim/m)
    * codebook matrix reaches the driver. The corpus never moves: this is
    * the IVF training shape (Similarity.ivfTrain) applied per-subspace.
    *
    * Why PQ at 100 TB: float32 x 1k dims = 4 KB/row; m=8/k=256 PQ codes
    * are 8 BYTES/row (500x), and ADC search scans codes with per-query
    * lookup tables — the difference between an ANN index that fits in
    * cluster memory and one that does not. */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, k: Int = 16, iters: Int = 3): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    var codebooks: Array[Array[Array[Double]]] = {
      val rows = corpus.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      Array.tabulate(m)(s => rows.map(v => v.slice(s * dsub, (s + 1) * dsub)))
    }
    for (_ <- 0 until iters) {
      val means = corpus
        .select(col(vecCol).as("v"), posexplode(encodePq(col(vecCol), codebooks)))
        .withColumnRenamed("pos", "s").withColumnRenamed("col", "code")
        .select(col("s"), col("code"),
          posexplode(slice(col("v"), col("s") * dsub + 1, lit(dsub))))
        .groupBy(col("s"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mean"))
        .collect()
      val byKey = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      codebooks = Array.tabulate(m)(s => Array.tabulate(k)(c =>
        byKey.get((s, c)) match {
          case Some(rows) => rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
          case None => codebooks(s)(c) // empty cell keeps its centroid
        }))
    }
    codebooks
  }

  /** Encode: array of `m` codes, code s = argmin over the subspace-s
    * codebook of squared L2 to subvector s (ties -> lowest code). All
    * codebook entries are plan literals — no broadcast state. */
  def encodePq(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    array((0 until m).map { s =>
      val sub = slice(vec, s * dsub + 1, dsub)
      val scored = array(codebooks(s).zipWithIndex.map { case (c, j) =>
        struct(
          aggregate(zip_with(sub, typedlit(c.toSeq),
              (a, b) => (a.cast(DoubleType) - b) * (a.cast(DoubleType) - b)),
            lit(0.0), (acc, v) => acc + v).as("d"),
          lit(j).as("j"))
      }: _*)
      array_min(scored).getField("j")
    }: _*)
  }

  /** PQ-ADC approximate top-k with exact re-rank: per query, a driver-side
    * lookup table T[s][c] = <q_sub, codebook[s][c]> turns scoring a corpus
    * row into 2m array lookups (approx cosine = sum_s T[s][code_s] /
    * (|q| * sqrt(sum_s |cb[s][code_s]|^2))); the `refine`*k ADC survivors
    * are re-ranked with exact cosine on the float column. Queries are a
    * small collected set (same contract as bruteForceTopK's broadcast). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, codebooks: Array[Array[Array[Double]]],
             refine: Int = 4): DataFrame = {
    val m = codebooks.length
    val kk = codebooks(0).length
    val coded = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      encodePq(col(vecCol), codebooks).as("codes"))
    val normFlat = codebooks.flatMap(_.map(c => c.map(x => x * x).sum))
    val qRows = queries.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val perQuery = qRows.map { case (qId, qv) =>
      val qNorm = math.sqrt(qv.map(x => x * x).sum)
      val dotFlat = codebooks.zipWithIndex.flatMap { case (cb, s) =>
        val qs = qv.slice(s * cb(0).length, (s + 1) * cb(0).length)
        cb.map(c => c.zip(qs).map { case (a, b) => a * b }.sum)
      }
      val lookup = (flat: Array[Double]) =>
        aggregate(zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (code, s) => element_at(typedlit(flat.toSeq), s * kk + code + 1)),
          lit(0.0), (acc, v) => acc + v)
      val scored = coded
        .filter(col("n_id") =!= qId)
        .withColumn("adc",
          lookup(dotFlat) / (lit(qNorm) * sqrt(lookup(normFlat))))
      Relational.topKPerGroup(
          scored.withColumn("q_id", lit(qId)), Seq("q_id"),
          Seq(("adc", true), ("n_id", false)), refine * k)
        .withColumn("cosine", // native cosine requires float arrays
          Similarity.cosine(typedlit(qv.map(_.toFloat).toSeq), col("n_v")))
    }
    val all = perQuery.reduce(_ unionByName _)
    Relational.topKPerGroup(all, Seq("q_id"),
        Seq(("cosine", true), ("n_id", false)), k)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** IVF+PQ — the production ANN layout: an IVF coarse quantizer prunes
    * the corpus to the query's `nprobe` nearest buckets, PQ-ADC scores
    * only those candidates from 8-byte codes, exact cosine re-ranks the
    * shortlist. At 100 TB the scan reads (nprobe/nlist) of the rows and
    * only the code column — neither full vectors nor full corpus move. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, kCodes: Int = 16, refine: Int = 4): DataFrame = {
    val centroids = Similarity.ivfTrain(corpus, idCol, vecCol, nlist)
    val codebooks = trainPq(corpus, idCol, vecCol, m, kCodes)
    val kk = codebooks(0).length
    val coded = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
      .withColumn("bucket", Similarity.ivfAssign(col("n_v"), centroids))
      .withColumn("codes", encodePq(col("n_v"), codebooks))
    val normFlat = codebooks.flatMap(_.map(c => c.map(x => x * x).sum))
    val qRows = queries.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cosTo(qv: Array[Double], c: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < qv.length) {
        val b = c(i).toDouble; dot += qv(i) * b; na += qv(i) * qv(i); nb += b * b; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val perQuery = qRows.map { case (qId, qv) =>
      val probes = centroids.zipWithIndex
        .map { case (c, i) => (cosTo(qv, c), i) }
        .sortBy { case (s, i) => (-s, i) }.take(nprobe).map(_._2)
      val qNorm = math.sqrt(qv.map(x => x * x).sum)
      val dotFlat = codebooks.zipWithIndex.flatMap { case (cb, s) =>
        val qs = qv.slice(s * cb(0).length, (s + 1) * cb(0).length)
        cb.map(c => c.zip(qs).map { case (a, b) => a * b }.sum)
      }
      val lookup = (flat: Array[Double]) =>
        aggregate(zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (code, s) => element_at(typedlit(flat.toSeq), s * kk + code + 1)),
          lit(0.0), (acc, v) => acc + v)
      val scored = coded
        .filter(col("bucket").isin(probes: _*) && col("n_id") =!= qId)
        .withColumn("adc",
          lookup(dotFlat) / (lit(qNorm) * sqrt(lookup(normFlat))))
      Relational.topKPerGroup(
          scored.withColumn("q_id", lit(qId)), Seq("q_id"),
          Seq(("adc", true), ("n_id", false)), refine * k)
        .withColumn("cosine",
          Similarity.cosine(typedlit(qv.map(_.toFloat).toSeq), col("n_v")))
    }
    Relational.topKPerGroup(perQuery.reduce(_ unionByName _), Seq("q_id"),
        Seq(("cosine", true), ("n_id", false)), k)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("cosine"))
  }
}
