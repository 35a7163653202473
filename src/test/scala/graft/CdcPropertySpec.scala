package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Properties of changelog compaction on random change logs:
  *  - the window formulation (latestPerKey) and the hot-key-safe
  *    struct-MAX aggregate (latestPerKeyAgg) return the identical row
  *    set — the map-side-combine optimization must never change results;
  *  - exactly one row per key survives, and it carries the lexicographic
  *    max of the (seq, tie) order columns computed independently. */
object CdcPropertySpec extends Properties("cdc-compaction") {

  private lazy val spark = SparkSpecBase.spark

  // change log with deliberately hot keys (few keys, many changes) and a
  // unique tiebreak so the latest row is well-defined
  private val genLog: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(1, 150)
    keys <- Gen.listOfN(n, Gen.choose(0L, 6L))
    seqs <- Gen.listOfN(n, Gen.choose(0L, 20L))
  } yield keys.zip(seqs).zipWithIndex.map { case ((k, sq), i) =>
    (k, sq, i.toLong, s"v$i")
  }

  property("window and struct-MAX compaction agree; latest row per key") =
    Prop.forAll(genLog) { log =>
      import SparkSpecBase.implicits._
      val df = log.toDF("key", "seq", "tie", "payload")
      val a = Cdc.latestPerKey(df, Seq("key"), Seq(col("seq"), col("tie")))
        .select("key", "seq", "tie", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      val b = Cdc.latestPerKeyAgg(df, Seq("key"),
          Seq(col("seq"), col("tie")), Seq("seq", "tie", "payload"))
        .select("key", "seq", "tie", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      val expected = log.groupBy(_._1).map { case (_, rows) =>
        rows.maxBy(r => (r._2, r._3))
      }.toSet
      (a == b) :| s"window vs agg: ${a.diff(b)} / ${b.diff(a)}" &&
        (a == expected) :| s"vs reference: ${a.diff(expected)}"
    }
}
