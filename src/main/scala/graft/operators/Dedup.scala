package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the whole point): every method is
  * candidate-generation-by-key + verify-within-bucket. Nothing ever
  * compares all N^2 pairs:
  *  - exact: one hash-groupBy shuffle on a 16-byte digest, not the text;
  *  - MinHash/LSH: band buckets bound the join fan-out;
  *  - SimHash: 16-bit band keys, Hamming verify inside buckets;
  *  - n-gram Jaccard: inverted-index join on rare shingles;
  *  - embedding: LSH or block-join on quantized prefix.
  * All candidate joins are shuffle joins on compact keys; verification is
  * a codegen'd expression over the pair.
  */
object Dedup {

  // --------------------------------------------------------------- exact

  /** Exact dedup via content digest: one shuffle on md5 (16 bytes),
    * never on the document body. Returns one row per distinct content:
    * (fp, keep_id = min doc id, copies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextAnalysis.fingerprintMd5(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  // ------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles of lowercased text. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val cnt = size(toks)
    array_distinct(
      when(cnt >= n,
        transform(sequence(lit(1), cnt - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** Distinct character n-gram shingles of lowercased text. */
  def charShingles(text: Column, n: Int = 5): Column = {
    val t = lower(text)
    array_distinct(
      transform(sequence(lit(1), greatest(length(t) - lit(n - 1), lit(1))),
        i => t.substr(i, lit(n))))
  }

  // ---------------------------------------------------------- MinHash LSH

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the shingle set. Pure array expressions (aggregate over
    * transform) — computed shard-local in one projection. */
  def minhashSignature(shingles: Column, numHashes: Int = 32): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      aggregate(shingles, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, seed))))

  /** Near-duplicate pairs via banded LSH over MinHash signatures.
    *
    * bands = numHashes / rowsPerBand; docs sharing any band bucket become
    * candidates (one shuffle keyed by (band, bandHash) — the classic
    * shingle->minhash->band->bucket-join). Candidates are then verified
    * with the *exact* Jaccard over shingle sets, so false positives from
    * banding never survive. Output: (a_id, b_id, jaccard) with a < b and
    * jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 32, rowsPerBand: Int = 4,
                   threshold: Double = 0.5, shingleWords: Int = 3): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val withSig = df.select(
        col(idCol).as("id"),
        wordShingles(col(textCol), shingleWords).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = withSig.select(
        col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(concat_ws("_",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("b_id"), col("sh").as("b_sh"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = (size(a) + size(b)).cast(DoubleType) - size(array_intersect(a, b))
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word shingles: per-bit majority vote of shingle
    * hashes, folded with integer bit ops only. */
  def simhash(shingles: Column): Column = {
    // votes: array of 64 counters; each shingle's hash contributes +1/-1
    val votes = aggregate(
      shingles,
      array_repeat(lit(0), 64),
      (acc, s) => {
        val h = xxhash64(s)
        transform(acc, (v, i) =>
          v + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      })
    aggregate(
      transform(votes, (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: 4 x 16-bit band keys (a pair within Hamming
    * distance <= 3 must agree on at least one band — pigeonhole), verify
    * exact Hamming inside buckets. Output (a_id, b_id, hamming). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash(wordShingles(col(textCol))).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sig"), b * 16)
          .bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("a_id"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", hamming64(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard dedup via inverted-index join: explode distinct
    * shingles, join docs sharing a shingle, count shared vs total.
    * Word shingles keep the index selective (char shingles of natural
    * language text are near-universal keys and would blow up the join).
    * Fully SQL-expressible -> DuckDB-oracled. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        wordShingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
    val a = inv.select(col("g"), col("id").as("a_id"), col("n_sh").as("a_n"))
    val b = inv.select(col("g"), col("id").as("b_id"), col("n_sh").as("b_n"))
    a.join(b, Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"),
        first(col("a_n")).as("a_n"), first(col("b_n")).as("b_n"))
      .withColumn("jaccard",
        col("shared").cast(DoubleType) /
          (col("a_n") + col("b_n") - col("shared")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine >= threshold. The pair
    * generation here is a block nested-loop over bucketed norms — for the
    * scale path use [[Similarity.lshBuckets]] instead; this exact variant
    * is the oracle-checkable baseline. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val a = v.select(col("id").as("a_id"), col("v").as("a_v"))
    val b = v.select(col("id").as("b_id"), col("v").as("b_v"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", Similarity.cosine(col("a_v"), col("b_v")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 4).as("cosine"))
  }
}
