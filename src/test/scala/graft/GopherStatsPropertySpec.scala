package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Equivalence property for the native single-pass GopherStats
  * expression: on arbitrary text — mixed whitespace kinds (space, tab,
  * newline, CR), punctuation, digits, multi-byte UTF-8, stopwords in
  * mixed case — its four counts equal the composable Column formulation
  * it replaced (regex \s+ tokenize, HOF alpha filter, HOF length sum,
  * lowercased token-set stopword intersect). */
object GopherStatsPropertySpec extends Properties("gopher-stats") {

  private lazy val spark = SparkSpecBase.spark

  private val stopList = Seq("the", "and", "of", "to", "in", "is", "that")

  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf(stopList),
    Gen.oneOf(stopList.map(_.toUpperCase)),
    Gen.oneOf("The", "iS", "tHat", "thé", "Ω", "naïve", "東京", "a1", "42",
      "...", "x", "wo-rd", "longishword"),
    Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString))
  private val sep: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\r", "\f", "  ")).map(_.mkString)
  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(n + 1, sep)
    lead <- Gen.oneOf("", " ", "\n")
  } yield lead + ws.zip(ss).map { case (w, s) => w + s }.mkString

  property("native single-pass == composable tokens/HOF formulation") =
    Prop.forAll(Gen.listOfN(20, genText)) { texts =>
      import SparkSpecBase.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val t = graft.operators.TextAnalysis.tokens(col("text"))
      val composable = df.select(col("id"),
        size(t).cast(LongType).as("n_words"),
        aggregate(t, lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
        size(filter(t, w => w.rlike("[A-Za-z]"))).cast(LongType).as("alpha_n"),
        size(array_intersect(array_distinct(transform(t, w => lower(w))),
          lit(stopList.toArray))).cast(LongType).as("n_stop"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val native = df.select(col("id"),
        graft.functions.GopherStats.gopherStats(col("text")).as("g"))
        .select(col("id"), col("g.n_words"), col("g.sum_len"),
          col("g.alpha_n"), col("g.n_stop"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"id=$k text=${texts(k.toInt).take(60).replace("\n", "\\n")} " +
          s"composable=${composable(k)} native=${native(k)}").mkString("; ")
    }

  property("native QualityStats == padded-replace counting formulation") =
    Prop.forAll(Gen.listOfN(20, genText)) { texts =>
      import SparkSpecBase.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      // the pre-round-13 composable counts, reconstructed verbatim:
      // replace-based non-overlapping " w " occurrences over the padded
      // lowercase text, regex punct count, HOF token count
      val p = concat(lit(" "), lower(col("text")), lit(" "))
      def occ(w: String): org.apache.spark.sql.Column =
        ((length(p) - length(replace(p, lit(s" $w "), lit("")))) /
          lit(s" $w ".length)).cast(LongType)
      val composable = df.select(col("id"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast(LongType).as("n_words"),
        length(col("text")).cast(LongType).as("n_chars"),
        regexp_count(col("text"), lit("[\\p{Punct}]"))
          .cast(LongType).as("n_punct"),
        Seq("the", "and", "of", "to", "in", "is", "that")
          .map(occ).reduce(_ + _).as("stop_hits"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val native = df.select(col("id"),
        graft.functions.QualityStats.qualityStats(col("text")).as("q"))
        .select(col("id"), col("q.n_words"), col("q.n_chars"),
          col("q.n_punct"), col("q.stop_hits"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"id=$k text=${texts(k.toInt).take(60).replace("\n", "\\n")} " +
          s"composable=${composable(k)} native=${native(k)}").mkString("; ")
    }

  private val langWord: Gen[String] = Gen.oneOf(
    Gen.oneOf(Seq("der", "und", "die", "nicht", "das", "the", "and", "of",
      "is", "that", "el", "los", "que", "y", "las", "le", "la", "et",
      "les", "des")),
    Gen.oneOf(Seq("DER", "The", "Y", "Les", "tHat")),
    Gen.oneOf(Seq("東京", "漢字テスト", "中文中文中文中文中文中文", "naïve", "x1", "...", "word")),
    Gen.listOfN(3, Gen.alphaChar).map(_.mkString))
  private val genLangText: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, langWord)
    ss <- Gen.listOfN(n + 1, sep)
  } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

  property("native LangStats langId == composable replace-count langId") =
    Prop.forAll(Gen.listOfN(20, genLangText)) { texts =>
      import SparkSpecBase.implicits._
      import graft.operators.TextAnalysis
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val composable = df.select(col("id"),
        TextAnalysis.langIdComposable(col("text")).as("l"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val native = df.select(col("id"),
        TextAnalysis.langId(col("text")).as("l"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"id=$k text='${texts(k.toInt).take(60).replace("\n", "\\n")}' " +
          s"composable=${composable(k)} native=${native(k)}").mkString("; ")
    }

  property("native WordCount/BpeCount == composable token-count forms") =
    Prop.forAll(Gen.listOfN(20, genText)) { texts =>
      import SparkSpecBase.implicits._
      import graft.operators.TextAnalysis
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val composable = df.select(col("id"),
        TextAnalysis.tokenCountComposable(col("text")).as("n"),
        TextAnalysis.tokenCountBpeComposable(col("text")).as("b"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val native = df.select(col("id"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.tokenCountBpe(col("text")).as("b"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"id=$k text=${texts(k.toInt).take(60).replace("\n", "\\n")} " +
          s"composable=${composable(k)} native=${native(k)}").mkString("; ")
    }
}
