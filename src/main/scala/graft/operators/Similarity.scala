package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one scan, distributed top-k per query
  *    via window rank. The 100 TB story: the corpus side streams, nothing
  *    is ever collected; cost is O(|corpus| * |queries|) dot products, all
  *    inside one codegen'd projection.
  *  - [[lshTopK]]: approximate — random-hyperplane LSH buckets
  *    (sign-bit sketch), candidates only within the query's bucket
  *    (+ optional multi-probe neighbors), exact re-rank inside. Sub-linear
  *    candidate volume at scale; the hyperplanes are derived from a seeded
  *    hash so every executor materializes them identically with no
  *    broadcast state.
  */
object Similarity {

  /** Cosine similarity of two float arrays, computed in strict index
    * order (zip_with + left fold) — the same evaluation order DuckDB's
    * list_cosine_similarity uses, so oracle comparisons are bit-stable.
    * Composable/interpreted reference form; the hot paths use
    * [[cosineFast]]. */
  def cosineComposable(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Native codegen'd cosine ([[graft.functions.CosineSimilarity]]):
    * fused primitive loop, no intermediate arrays, bit-identical to the
    * composable form (same index-order double accumulation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineNative(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); `corpus` is unbounded.
    * Self-pairs excluded. Output: (q_id, rank, n_id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine(col("q_v"), col("n_v")))
    Relational.topKPerGroup(scored, Seq("q_id"),
        Seq(("cosine", true), ("n_id", false)), k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("n_id").asc)))
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 -> uniform in [-1, 1). Seeded, executor-independent. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast(DoubleType) / lit(Long.MaxValue.toDouble))

  /** Sign-bit LSH bucket id from `numPlanes` random hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int = 8): Column =
    (0 until numPlanes).map { p =>
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast(DoubleType) * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus all buckets at Hamming distance 1 (multi-probe — one extra
    * probe per plane roughly doubles recall at the same bucket
    * granularity), exact cosine re-rank within. At 100 TB the bucket
    * join replaces the full cross product with a shuffle on (bucket)
    * keys; the corpus side is hashed once and never broadcast. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, probeDistance: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
      .withColumn("bucket", lshBucket(col("n_v"), numPlanes))
    val q0 = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
      .withColumn("bucket0", lshBucket(col("q_v"), numPlanes))
    // multi-probe: the query's own bucket + each single-bit flip
    val probes: Column =
      if (probeDistance <= 0) array(col("bucket0"))
      else array(col("bucket0") +:
        (0 until numPlanes).map(p => col("bucket0").bitwiseXOR(lit(1L << p))): _*)
    val q = q0.select(col("q_id"), col("q_v"),
      explode(probes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("cosine", cosine(col("q_v"), col("n_v")))
    Relational.topKPerGroup(scored, Seq("q_id"),
        Seq(("cosine", true), ("n_id", false)), k)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("cosine"))
  }
}
