package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus a typed metadata struct. The
  * decode step is STUBBED (no media libraries in this environment) with a
  * deterministic fake — a byte-bucket histogram standing in for "decode +
  * feature-extract" — but the Spark-side plumbing is real and is what
  * matters at scale: schema, batch iteration via mapPartitions (the Scala
  * analogue of arrow-batched Pandas UDFs: amortized per-partition setup,
  * one pass, no per-row interpreter crossings), and partition sizing so a
  * partition of blobs fits executor memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("blob", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap a text table as a media table: blob = utf-8 bytes (the stand-in
    * for real image/audio payloads), typed metadata alongside. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      to_binary(col(payloadCol), lit("utf-8")).as("blob"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(payloadCol)).cast(LongType).as("n_bytes")).as("meta"))

  /** STUB decode + feature extraction: a real pipeline would decode the
    * image/audio here (e.g. via javacv/libvips on the executor); the
    * deterministic fake is a 16-bin byte histogram so tests can assert
    * exact values. Runs via mapPartitions — per-partition batch shape,
    * exactly where a vectorized decode would sit. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(LongType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      // per-partition init would open the decoder once, here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1; i += 1 }
        Row(id, bytes.length.toLong, hist.toSeq)
      }
    }(enc)
  }

  /** STUB resize: byte-stride downsample standing in for an image
    * resize — a real pipeline swaps the loop body for the decoder call;
    * the mapPartitions batch shape (amortized per-partition setup) is
    * the part that matters. */
  def resizeStub(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out = new Array[Byte]((bytes.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
        Row(r.getLong(0), out, out.length.toLong)
      }
    }(enc)
  }

  /** Partition sizing for blob tables: compute total payload bytes (one
    * aggregate pass) and repartition so each partition holds roughly
    * `targetPartitionBytes` — the knob that keeps a media partition
    * inside executor memory at any corpus size. */
  def repartitionForMedia(media: DataFrame,
                          targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val total = media.agg(sum(octet_length(col("blob")).cast(LongType)))
      .collect()(0).getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetPartitionBytes).toInt)
    media.repartition(parts)
  }

  /** Deterministic frame/chunk sampling: split a blob into fixed-size
    * chunks and keep every `stride`-th — the shape of video frame
    * sampling, as pure array expressions. */
  def sampleChunks(media: DataFrame, chunkBytes: Int = 64,
                   stride: Int = 4): DataFrame = {
    val nChunks = ceil(octet_length(col("blob")) / lit(chunkBytes.toDouble))
      .cast(IntegerType)
    media.select(
      col("media_id"),
      filter(sequence(lit(0), greatest(nChunks - 1, lit(0))),
        i => i % stride === 0).as("kept_chunks"),
      nChunks.as("n_chunks"))
  }
}
