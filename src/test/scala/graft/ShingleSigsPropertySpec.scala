package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Equivalence property for the native single-pass ShingleSigs
  * expression: on arbitrary text — repeated tokens (distinct filter!),
  * mixed whitespace kinds, multi-byte UTF-8, docs shorter than the
  * shingle width, empty/whitespace-only docs — its hash array equals the
  * composable Dedup.signatures formulation (regex tokenize -> staged
  * shingle strings -> array_distinct -> xxhash64), element order
  * included. */
object ShingleSigsPropertySpec extends Properties("shingle-sigs") {

  private lazy val spark = SparkSpecBase.spark

  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "and", "dup", "dup", "x", "naïve", "東京", "a1",
      "Mixed", "CASE", "wo-rd", "..."),
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
  private val sep: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\r", "\f", "  ")).map(_.mkString)
  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(n + 1, sep)
    lead <- Gen.oneOf("", " ", "\n")
  } yield lead + ws.zip(ss).map { case (w, s) => w + s }.mkString

  property("native == composable signatures, order included") =
    Prop.forAll(Gen.listOfN(15, genText), Gen.choose(1, 5)) { (texts, n) =>
      import SparkSpecBase.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def grab(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        d.select(col("id"), col("hs")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composable =
        grab(graft.operators.Dedup.signaturesComposable(df, "doc_id", "text", n))
      val native =
        grab(graft.operators.Dedup.signatures(df, "doc_id", "text", n))
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"n=$n id=$k text='${texts(k.toInt).take(60).replace("\n", "\\n")}' " +
          s"composable=${composable(k).take(5)} native=${native(k).take(5)}")
        .mkString("; ")
    }
}
