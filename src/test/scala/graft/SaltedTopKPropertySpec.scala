package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Properties of the two-phase salted top-K (Relational.topKPerGroupSalted)
  * after the round-12 fix (salt = hash of a row-unique disambiguator, NOT
  * the order columns):
  *  - ties on the ENTIRE order key still spread across salt buckets — the
  *    constant-order-column corpus is exactly the degenerate input where
  *    the old order-column salt put every row in one bucket, silently
  *    recreating the one-reducer hotspot the operator exists to remove;
  *  - exactness: per group the salted form returns min(k, |group|) rows
  *    and the multiset of ORDER-KEY VALUES equals the plain windowed
  *    top-k's (row identity among full-key ties is arbitrary for both
  *    forms — the contract is over order-key values).
  */
object SaltedTopKPropertySpec extends Properties("salted-topk") {

  private lazy val spark = SparkSpecBase.spark

  property("order-key ties spread across salt buckets") = Prop.secure {
    import SparkSpecBase.implicits._
    // every row ties on the (single, constant) order column
    val df = (1 to 400).map(i => (i.toLong, "g", 1.0)).toDF("id", "grp", "score")
    val buckets = df.select(Relational.saltBucket("id", 32).as("b"))
      .distinct().count()
    (buckets > 16) :| s"400 tying rows collapsed into $buckets/32 salt buckets"
  }

  private val genCorpus: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 150)
    grps <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    // LOW-cardinality scores: heavy ties on the full sort key
    scores <- Gen.listOfN(n, Gen.choose(0L, 4L))
  } yield grps.zip(scores).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }

  property("salted == plain on per-group order-value multisets") =
    Prop.forAll(genCorpus) { rows =>
      import SparkSpecBase.implicits._
      val df = rows.toDF("id", "grp", "score").repartition(8)
      val order = Seq(("score", true)) // no tiebreak: ties are the point
      def multisets(out: org.apache.spark.sql.DataFrame) =
        out.select("grp", "score").collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .groupBy(_._1).map { case (g, vs) => (g, vs.map(_._2).sorted.toSeq) }
      val plain = multisets(Relational.topKPerGroup(df, Seq("grp"), order, k = 5))
      val salted = multisets(Relational.topKPerGroupSalted(
        df, Seq("grp"), order, k = 5, disambig = "id", saltFactor = 8))
      (salted == plain) :| s"salted=$salted plain=$plain"
    }
}
