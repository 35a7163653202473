package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup.substringDupWindows: the sliding-window exact-substring detector
  * must catch a duplicated span at ARBITRARY alignment — the property
  * that distinguishes it from aligned chunk fingerprinting. */
class SubstringDedupSpec extends SparkSpec {
  import SparkSpecBase.implicits._

  // 30-token span shared by docs 1 and 2, but at different offsets
  // (doc 1: after 5 filler tokens; doc 2: after 12) — no 16-token
  // window aligned to a multiple-of-16 boundary is common to both.
  private val span = (1 to 30).map(i => s"dup$i").mkString(" ")
  private def filler(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
  private val corpus = Seq(
    (1L, s"${filler("a", 5)} $span ${filler("b", 10)}"),
    (2L, s"${filler("c", 12)} $span ${filler("d", 7)}"),
    (3L, filler("e", 40))).toDF("doc_id", "text")

  test("duplicated span is caught at any alignment; unique doc is not flagged") {
    val dup = Dedup.substringDupWindows(corpus, "doc_id", "text", w = 16)
      .collect()
    // 30-token span -> 15 full 16-token windows, each present in both docs
    assert(dup.length === 15)
    assert(dup.forall(r => r.getAs[Long]("n_docs") === 2L))
    assert(dup.forall(r => r.getAs[Long]("keep_doc") === 1L))
    assert(dup.forall(r => r.getAs[Long]("occurrences") === 2L))
  }

  test("chunk-aligned fingerprints miss the same cross-offset span") {
    // the dedup_chunks shape: non-overlapping 16-token chunks from
    // offset 0 — different alignment in the two docs, zero shared chunks
    val toks = corpus.select(col("doc_id"),
      operators.TextAnalysis.tokens(lower(col("text"))).as("t"))
    val chunks = toks.select(col("doc_id"),
      explode(graft.functions.Staging.bound(col("t"))(t =>
        transform(sequence(lit(0),
            ((size(t) - lit(1)) / lit(16)).cast(org.apache.spark.sql.types.IntegerType)),
          i => concat_ws(" ", slice(t, i * lit(16) + lit(1), lit(16))))))
        .as("chunk"))
    val shared = chunks.groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1).count()
    assert(shared === 0L)
  }

  test("random corpora: operator equals a naive in-memory reference") {
    val rnd = new scala.util.Random(11)
    val vocab = Array("aa", "bb", "cc") // tiny vocab forces window collisions
    for (trial <- 1 to 15) {
      val corpus = (0 until 6).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(3))).mkString(" "))
      }
      val naive = corpus
        .flatMap { case (id, text) =>
          text.split("\\s+").toSeq.sliding(4).filter(_.size == 4)
            .map(w => (w.mkString(" "), id))
        }
        .groupBy(_._1).values
        .map(occ => (occ.map(_._2).min, occ.size.toLong, occ.map(_._2).distinct.size.toLong))
        .filter(_._3 > 1).toSeq.sorted
      val got = Dedup.substringDupWindows(
          corpus.toDF("doc_id", "text"), "doc_id", "text", w = 4)
        .collect()
        .map(r => (r.getAs[Long]("keep_doc"), r.getAs[Long]("occurrences"),
          r.getAs[Long]("n_docs"))).toSeq.sorted
      assert(got == naive, s"trial $trial")
    }
  }

  test("within-doc repetition alone is not cross-doc duplication") {
    val selfRep = Seq((10L, s"$span $span")).toDF("doc_id", "text")
    assert(Dedup.substringDupWindows(selfRep.union(corpus.filter(col("doc_id") === 3L)),
      "doc_id", "text", w = 16).count() === 0L)
  }

  test("exact-replica pre-pass equals the plain path on replicated corpora") {
    val rnd = new scala.util.Random(23)
    val vocab = Array("aa", "bb", "cc")
    for (trial <- 1 to 8) {
      val base = (0 until 5).map { i =>
        (i.toLong, Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(3))).mkString(" "))
      }
      // 3 exact copies of every doc under disjoint ids (the MakeSfN
      // stress shape), plus one replicated doc with a unique text —
      // its windows must surface with n_docs = its replica count even
      // though only one REPRESENTATIVE carries them through keying
      val replicated = (0 until 3).flatMap(r =>
        base.map { case (id, t) => (id + r * 100L, t) })
      val df = replicated.toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getAs[String]("fp"), r.getAs[Long]("keep_doc"),
          r.getAs[Long]("occurrences"), r.getAs[Long]("n_docs"))).toSeq.sorted
      val plain = rows(Dedup.substringDupWindows(df, "doc_id", "text",
        w = 4, replicaGate = Some(false)))
      val pre = rows(Dedup.substringDupWindows(df, "doc_id", "text",
        w = 4, replicaGate = Some(true)))
      assert(pre == plain, s"trial $trial")
      // the adaptive default must pick the pre-pass here (15 docs, 5 texts)
      val auto = rows(Dedup.substringDupWindows(df, "doc_id", "text", w = 4))
      assert(auto == plain, s"trial $trial (adaptive)")
    }
  }
}
