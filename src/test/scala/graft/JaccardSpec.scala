package graft

import org.apache.spark.sql.functions._
import graft.functions.JaccardSimilarity
import graft.operators.Dedup

/** JaccardSimilarity native expression: parity with the composable
  * size(array_intersect) formulation, edge cases, and codegen/interpreted
  * agreement. */
class JaccardSpec extends SparkSpec {
  import SparkSpecBase.implicits._

  private def jac(a: Seq[Long], b: Seq[Long]): Double = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(JaccardSimilarity.jaccardNative(col("a"), col("b")).as("j"))
      .head().getDouble(0)
  }

  test("jaccard native: basic overlap, disjoint, identical, empty") {
    assert(jac(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) === 2.0 / 4.0)
    assert(jac(Seq(1L, 2L), Seq(3L, 4L)) === 0.0)
    assert(jac(Seq(5L, 6L, 7L), Seq(7L, 5L, 6L)) === 1.0) // order-free
    assert(jac(Seq.empty, Seq.empty) === 0.0)
    assert(jac(Seq(1L), Seq.empty) === 0.0)
  }

  test("jaccard native equals composable size(array_intersect) form") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val both = df.select(
      JaccardSimilarity.jaccardNative(col("a"), col("b")).as("native"),
      Dedup.jaccard(col("a"), col("b")).as("composable"))
    val mismatch = both.filter(col("native") =!= col("composable")).count()
    assert(mismatch === 0)
  }

  test("jaccard native agrees between codegen and interpreted eval") {
    // filter + projection duplication exercises the codegen path; a
    // collect of the raw expression exercises interpreted eval
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      (Seq(10L), Seq(10L))).toDF("a", "b")
    val viaPlan = df
      .withColumn("j", JaccardSimilarity.jaccardNative(col("a"), col("b")))
      .filter(col("j") >= 0.3).select(col("j")).collect().map(_.getDouble(0)).sorted
    assert(viaPlan.toSeq === Seq(2.0 / 6.0, 1.0))
  }

  test("signatures + FromSigs variants equal the text-based operators") {
    val docs = graft.sources.ParquetNanos.read(spark, s"$sfDir/documents.parquet")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3)
    val fromText = Dedup.ngramJaccardPairsBlocked(docs, "doc_id", "text",
      n = 3, threshold = 0.3, dfCap = 30).collect().toSet
    val fromSigs = Dedup.ngramJaccardPairsBlockedFromSigs(sigs,
      threshold = 0.3, dfCap = 30).collect().toSet
    assert(fromText === fromSigs)
    assert(fromSigs.nonEmpty)
  }
}
