package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Unit checks for the Gopher-rule and repetition-signal operators on
  * crafted documents with hand-computed expectations. */
class TextSignalsSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import SparkSpecBase.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gopherSignals: counts, mean word length, alpha ratio, stopwords") {
    // 4 words, lengths 3+3+2+4=12, mean 3.0; 3 alpha words of 4;
    // stopwords present: {the, is} -> 2
    val df = docsDf((1L, "the cat is 4444"))
    val r = TextAnalysis.gopherSignals(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 4L)
    assert(math.abs(r.getAs[Double]("mean_word_len") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("alpha_ratio") - 0.75) < 1e-9)
    assert(r.getAs[Long]("n_stopwords") == 2L)
    assert(!r.getAs[Boolean]("pass")) // n_words < 50
  }

  test("gopherSignals: pass flag requires all rules") {
    // 60 in-range words, mean len in [3,10], all alphabetic, >=2 stopwords
    val good = (Seq("the", "and") ++ Seq.fill(58)("word")).mkString(" ")
    val df = docsDf((1L, good))
    val r = TextAnalysis.gopherSignals(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 60L)
    assert(r.getAs[Boolean]("pass"))
  }

  test("repetitionSignals: dup ratios and top-token share") {
    // tokens: a a a b -> n=4, distinct=2, dup_tok=0.5, top_share=0.75
    // bigrams: "a a","a a","a b" -> 3 total, 2 distinct -> dup_bi=1/3
    val df = docsDf((1L, "a a a b"))
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_tok") == 4L)
    assert(math.abs(r.getAs[Double]("dup_tok_ratio") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("top_tok_share") - 0.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("dup_bigram_ratio") - 0.3333) < 1e-4)
  }

  test("repetitionSignals: no repetition -> all zeros") {
    val df = docsDf((1L, "alpha beta gamma delta"))
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Double]("dup_tok_ratio") == 0.0)
    assert(r.getAs[Double]("dup_bigram_ratio") == 0.0)
    assert(math.abs(r.getAs[Double]("top_tok_share") - 0.25) < 1e-9)
  }

  test("repetitionSignals: case folding unifies tokens") {
    val df = docsDf((1L, "Foo foo FOO"))
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_tok") == 3L)
    assert(math.abs(r.getAs[Double]("top_tok_share") - 1.0) < 1e-9)
  }
}
