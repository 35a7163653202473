package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Properties of the greedy sequence-packing formula
  * (pack_id = floor((cumsum - n) / budget), per shard):
  *  - a document is never split across packs (one row, one pack);
  *  - pack ids per shard start at 0 and are contiguous non-decreasing;
  *  - every pack's token total is bounded by budget + max_doc - 1 (the
  *    greedy contiguous-fill bound — a doc that straddles the boundary
  *    finishes its pack past the budget, never more).
  */
object PackPropertySpec extends Properties("sequence-packing") {

  private lazy val spark = SparkSpecBase.spark

  private val genDocs: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 120)
    langs <- Gen.listOfN(n, Gen.oneOf("en", "de", "fr"))
    toks <- Gen.listOfN(n, Gen.choose(1L, 700L))
  } yield langs.zip(toks).zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  property("greedy pack bounds, contiguity, no splitting") =
    Prop.forAll(genDocs) { docs =>
      import SparkSpecBase.implicits._
      val budget = 1000.0
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = docs.toDF("doc_id", "lang", "n_tokens")
        .withColumn("cs", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          floor((col("cs") - col("n_tokens")) / lit(budget)).cast("long").as("pack_id"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

      val onePackPerDoc = packed.groupBy(_._1).forall(_._2.length == 1)
      val perShard = packed.groupBy(_._2)
      val contiguous = perShard.values.forall { rows =>
        val sorted = rows.sortBy(_._1)
        sorted.head._4 == 0L && sorted.zip(sorted.tail).forall {
          case (prev, cur) =>
            cur._4 == prev._4 || cur._4 == prev._4 + 1 ||
              // a doc larger than the budget may advance the pack id by
              // more than one; allowed only when the PREVIOUS doc was big
              (cur._4 > prev._4 && prev._3 >= budget)
        }
      }
      val maxDoc = packed.map(_._3).max
      val packBounded = packed.groupBy(r => (r._2, r._4)).values.forall { rows =>
        rows.map(_._3).sum <= budget + maxDoc - 1
      }
      onePackPerDoc && contiguous && packBounded
    }
}
