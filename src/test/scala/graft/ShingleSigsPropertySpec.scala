package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Equivalence property for the native single-pass ShingleSigs
  * expression: on arbitrary text — repeated tokens (distinct filter!),
  * mixed whitespace kinds, multi-byte UTF-8, docs shorter than the
  * shingle width, empty/whitespace-only docs — its hash array equals the
  * composable Dedup.signatures formulation (regex tokenize -> staged
  * shingle strings -> array_distinct -> xxhash64), element order
  * included. */
object ShingleSigsPropertySpec extends Properties("shingle-sigs") {

  private lazy val spark = SparkSpecBase.spark

  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "and", "dup", "dup", "x", "naïve", "東京", "a1",
      "Mixed", "CASE", "wo-rd", "..."),
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
  private val sep: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\r", "\f", "  ")).map(_.mkString)
  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(n + 1, sep)
    lead <- Gen.oneOf("", " ", "\n")
  } yield lead + ws.zip(ss).map { case (w, s) => w + s }.mkString

  property("native == composable signatures, order included") =
    Prop.forAll(Gen.listOfN(15, genText), Gen.choose(1, 5)) { (texts, n) =>
      import SparkSpecBase.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def grab(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        d.select(col("id"), col("hs")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composable =
        grab(graft.operators.Dedup.signaturesComposable(df, "doc_id", "text", n))
      val native =
        grab(graft.operators.Dedup.signatures(df, "doc_id", "text", n))
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"n=$n id=$k text='${texts(k.toInt).take(60).replace("\n", "\\n")}' " +
          s"composable=${composable(k).take(5)} native=${native(k).take(5)}")
        .mkString("; ")
    }

  property("native SubstrWindowKeys == staged pmod/xxhash64 HOF form") =
    Prop.forAll(Gen.listOfN(12, genText), Gen.choose(2, 20)) { (texts, w) =>
      import SparkSpecBase.implicits._
      val MersenneP = (1L << 31) - 1
      val o1 = (w - 1) / 3; val o2 = 2 * (w - 1) / 3; val o3 = w - 1
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val t = graft.operators.TextAnalysis.tokens(lower(col("text")))
      val composable = df.select(col("id"),
        when(size(t) >= w,
          transform(sequence(lit(1), size(t) - lit(w - 1)), i => {
            def h(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(MersenneP))
            h(element_at(t, i)) * lit(1000003L) +
              h(element_at(t, i + o1)) * lit(524287L) +
              h(element_at(t, i + o2)) * lit(8191L) +
              h(element_at(t, i + o3)) * lit(131L)
          })).otherwise(array().cast("array<bigint>")).as("ks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = df.select(col("id"),
        graft.functions.SubstrWindowKeys
          .substrWindowKeys(lower(col("text")), w, MersenneP).as("ks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"w=$w id=$k text='${texts(k.toInt).take(60).replace("\n", "\\n")}' " +
          s"composable=${composable(k).take(4)} native=${native(k).take(4)}")
        .mkString("; ")
    }

  property("native MinhashSig == relational explode/groupBy-min form") =
    Prop.forAll(
      Gen.listOfN(12, Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))),
      Gen.choose(1, 32)) { (hsLists, numHashes) =>
      import SparkSpecBase.implicits._
      val MersenneP = 2147483647L
      val consts = graft.functions.MinhashSig.mixConsts
      val df = hsLists.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
        .toDF("id", "hs")
      val exploded = df.select(col("id"), explode(col("hs")).as("h0"))
        .withColumn("hp", pmod(col("h0"), lit(MersenneP)))
      val minCols = (0 until numHashes).map { i =>
        min(pmod(col("hp") * lit(consts(i)._1) + lit(consts(i)._2),
          lit(MersenneP))).as(s"m$i")
      }
      val relational = exploded.groupBy(col("id"))
        .agg(minCols.head, minCols.tail: _*)
        .select(col("id"),
          array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = df.select(col("id"),
        graft.functions.MinhashSig.minhashSig(col("hs"), numHashes).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val diffs = relational.keySet.filter(k => relational(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map(k =>
        s"numHashes=$numHashes id=$k relational=${relational(k).take(4)} " +
          s"native=${native(k).take(4)}").mkString("; ")
    }

  property("native WindowFps == slice/concat_ws/md5 form") =
    Prop.forAll(Gen.listOfN(10, genText), Gen.choose(1, 8)) { (texts, w) =>
      import SparkSpecBase.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      // positions: every valid window start plus two out-of-range probes
      // (slice clamps; past-the-end yields the empty-join digest)
      val t = graft.operators.TextAnalysis.tokens(lower(col("text")))
      val pos = concat(
        when(size(t) >= 1, transform(sequence(lit(1), size(t)), i => i - 1))
          .otherwise(array().cast("array<int>")),
        array(size(t), size(t) + lit(3))).cast("array<int>")
      val composable = df
        .select(col("id"), t.as("t"), posexplode(pos))
        .select(col("id"), col("pos"),
          md5(to_binary(concat_ws(" ", slice(col("t"), col("col") + 1, lit(w))),
            lit("utf-8"))).as("fp"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
      val native = df
        .select(col("id"),
          posexplode(graft.functions.WindowFps
            .windowFps(lower(col("text")), pos, w)))
        .select(col("id"), col("pos"), col("col").as("fp"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
      val diffs = composable.keySet.filter(k => composable(k) != native(k))
      diffs.isEmpty :| diffs.take(3).map { case (id, p) =>
        s"w=$w id=$id pos=$p text='${texts(id.toInt).take(50).replace("\n", "\\n")}' " +
          s"composable=${composable((id, p))} native=${native((id, p))}"
      }.mkString("; ")
    }
}
