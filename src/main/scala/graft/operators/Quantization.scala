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
}
