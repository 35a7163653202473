package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B: current minhashPairsFromSigs (carries the hs array through the
  * min-agg explode AND the band posexplode) vs a lean variant that bands
  * on (id, sig) only and joins the persisted signature table back for
  * verification (the blocked-jaccard verify shape). 3 reps each. */
object ProbeMinhash2 {
  import ProbePerf.t

  def lean(hs: DataFrame, numHashes: Int, rowsPerBand: Int,
           threshold: Double): DataFrame = {
    import graft.functions.Staging.bound
    val MersenneP = 2147483647L
    val rnd = new scala.util.Random(0x5eed5eedL)
    val mix = IndexedSeq.fill(64)((
      1L + math.floorMod(rnd.nextLong(), MersenneP - 1),
      math.floorMod(rnd.nextLong(), MersenneP)))
    val numBands = numHashes / rowsPerBand
    val exploded = hs.select(col("id"), explode(col("hs")).as("h0"))
      .withColumn("hp", pmod(col("h0"), lit(MersenneP)))
    val minCols = (0 until numHashes).map { i =>
      min(pmod(col("hp") * lit(mix(i)._1) + lit(mix(i)._2),
        lit(MersenneP))).as(s"m$i")
    }
    val sig = exploded.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sig.select(col("id"),
        posexplode(bound(col("sig"))(g =>
          transform(sequence(lit(0), lit(numBands - 1)),
            b => xxhash64(concat_ws("_",
              slice(g, b * rowsPerBand + 1, lit(rowsPerBand))), b)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("id").as("a_id"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("b_id"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    val aSh = hs.select(col("id").as("a_id"), col("hs").as("a_sh"))
    val bSh = hs.select(col("id").as("b_id"), col("hs").as("b_sh"))
    candidates.join(aSh, "a_id").join(bSh, "b_id")
      .withColumn("jaccard", graft.functions.JaccardSimilarity.jaccardNative(
        col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").appName("probe-mh2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sigs_materialize")(sigs.count())
    // parity first
    val cur = Dedup.minhashPairsFromSigs(sigs, 32, 4, 0.5).count()
    val ln = lean(sigs, 32, 4, 0.5).count()
    println(s"PARITY current=$cur lean=$ln")
    for (rep <- 1 to 3) {
      t(s"current#$rep")(Dedup.minhashPairsFromSigs(sigs, 32, 4, 0.5).count())
      t(s"lean#$rep")(lean(sigs, 32, 4, 0.5).count())
    }
    spark.stop()
  }
}
