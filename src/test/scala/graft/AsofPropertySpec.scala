package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions._

/** Property-based differential test for the as-of join: the
  * union-and-carry-forward implementation must equal the obvious
  * O(L*R) formulation — left join on (key, r.ts <= l.ts), take
  * max(struct(r.ts, payload)) per left row — on random inputs including
  * NULL payloads, duplicate timestamps on both sides, and keys missing
  * from either side. The max-struct reference independently encodes the
  * intended tie semantics (latest right row; max payload among equal-ts
  * rows; a matched NULL payload stays NULL). */
object AsofPropertySpec extends Properties("asof-vs-naive") {

  private lazy val spark = SparkSpecBase.spark

  private case class L(k: Long, ts: Long, tag: Long)
  private case class R(k: Long, ts: Long, v: Option[Double])

  private val genLeft: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(1L, 5L); ts <- Gen.choose(0L, 50L); tag <- Gen.choose(0L, 1000000L)
    } yield (k, ts, tag))

  private val genRight: Gen[List[(Long, Long, Option[Double])]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(1L, 6L); ts <- Gen.choose(0L, 50L)
      v <- Gen.option(Gen.choose(0, 99).map(_.toDouble))
    } yield (k, ts, v))

  property("equals naive max-struct formulation") =
    Prop.forAllNoShrink(genLeft, genRight) { (ls, rs) =>
      import SparkSpecBase.implicits._
      val sp = spark
      def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms * 60000L)
      // distinct tags make left rows identifiable
      val left = ls.zipWithIndex
        .map { case ((k, ts, _), i) => (k, t(ts), i.toLong) }
        .toDF("k", "ts", "tag")
      val right = rs.map { case (k, ts, v) => (k, t(ts), v) }
        .toDF("k", "ts", "v")

      val got = graft.operators.AsofJoin
        .asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
        .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap

      val l = left.select(col("k"), col("ts").as("l_ts"), col("tag"))
      val r = right.select(col("k").as("rk"), col("ts").as("r_ts"), col("v"))
      val naive = l
        .join(r, col("k") === col("rk") && col("r_ts") <= col("l_ts"), "left")
        .groupBy(col("tag"))
        .agg(max(struct(col("r_ts"), col("v"))).as("m"))
        .select(col("tag"), col("m").getField("v").as("v"))
        .collect().map(r0 => r0.getLong(0) -> Option(r0.get(1))).toMap

      Prop(got == naive) :| s"asof=$got naive=$naive"
    }
}
