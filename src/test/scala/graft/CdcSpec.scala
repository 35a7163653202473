package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC operators: changelog compaction (both formulations agree), merge
  * semantics across all three paths (update / insert / delete), and SCD2
  * interval contiguity. */
class CdcSpec extends SparkSpec {
  import SparkSpecBase.implicits._

  // change log: (key, seq, op, val)
  private lazy val log = Seq(
    (1L, 1L, "I", 10.0), (1L, 2L, "U", 11.0), (1L, 3L, "U", 12.0),
    (2L, 1L, "I", 20.0), (2L, 2L, "D", 0.0),
    (3L, 5L, "I", 30.0),
    (4L, 1L, "I", 40.0), (4L, 2L, "U", 41.0), (4L, 9L, "D", 0.0),
    (5L, 2L, "I", 50.0)
  ).toDF("key", "seq", "op", "v")

  test("latestPerKey and latestPerKeyAgg agree (window vs struct-max)") {
    val a = Cdc.latestPerKey(log, Seq("key"), Seq(col("seq")))
      .select("key", "seq", "op", "v")
    val b = Cdc.latestPerKeyAgg(log, Seq("key"), Seq(col("seq")),
      Seq("seq", "op", "v")).select("key", "seq", "op", "v")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    assert(a.count() === 5)
    val k1 = a.filter(col("key") === 1).head()
    assert(k1.getLong(1) === 3L && k1.getDouble(3) === 12.0)
  }

  test("mergeUpsert: update, insert, and delete paths") {
    // base has keys 1,2,6; delta latest ops: 1->U(12), 2->D, 3->I(30),
    // 4->D, 5->I(50). Expected: 1 updated, 2 deleted, 3 & 5 inserted,
    // 4's delete is a no-op (absent from base), 6 untouched.
    val base = Seq((1L, 1.0), (2L, 2.0), (6L, 6.0)).toDF("key", "v")
    val delta = Cdc.latestPerKey(log, Seq("key"), Seq(col("seq")))
      .select(col("key"), col("op"), col("v").as("nv"))
    val merged = Cdc.mergeUpsert(base, delta, "key", "op", "D",
      Seq("v" -> ("v", "nv")))
    val got = merged.select("key", "v", "src").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === Set((1L, 12.0, "delta"), (3L, 30.0, "delta"),
      (5L, 50.0, "delta"), (6L, 6.0, "base")))
  }

  test("scd2: versions dense from 1, intervals contiguous, one current") {
    val dim = Cdc.scd2(log.filter(col("op") =!= "D"), "key", col("seq"),
      col("seq"), Seq(col("v")))
    // exactly one open (current) version per key
    val cur = dim.filter(col("is_current")).groupBy(col("key"))
      .count().collect()
    assert(cur.forall(_.getLong(1) === 1L))
    // each closed version's valid_to equals the next version's valid_from
    val nxt = dim.select(col("key"), (col("version") - 1).as("version"),
      col("valid_from").as("next_from"))
    val broken = dim.join(nxt, Seq("key", "version"))
      .filter(col("valid_to") =!= col("next_from")).count()
    assert(broken === 0)
    // versions are dense from 1
    val vc = dim.groupBy(col("key"))
      .agg(min(col("version")).as("mn"), max(col("version")).as("mx"),
        count(lit(1)).as("n")).collect()
    assert(vc.forall(r => r.getInt(1) === 1 && r.getInt(2).toLong === r.getLong(3)))
  }
}
