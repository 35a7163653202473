package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus a typed metadata struct, and the
  * image path is REAL: [[pngMediaTable]] encodes deterministic RGB images
  * to PNG bytes with the JDK-builtin `javax.imageio` writer on the
  * executors, [[decodeFeatures]] decodes those bytes back with
  * `ImageIO.read` and extracts per-channel pixel statistics, and
  * [[decodeResize]] decodes, nearest-neighbor-downsamples the decoded
  * raster, RE-encodes to PNG and decodes again — so every value it emits
  * has survived two encode/decode round trips. PNG is lossless, which is
  * what makes the oracle exact: decoded pixels equal the generation
  * formula, so DuckDB can restate the expected statistics from the
  * formula alone while the Spark side exercises the actual codec.
  *
  * The Spark-side shape is what matters at scale: batch iteration via
  * mapPartitions (the Scala analogue of arrow-batched Pandas UDFs:
  * amortized per-partition setup — `ImageIO.setUseCache(false)` once, no
  * per-row interpreter crossings), and partition sizing
  * ([[repartitionForMedia]]) so a partition of blobs fits executor
  * memory. Swapping PNG for JPEG/video means swapping the codec call in
  * the partition loop; the plumbing, schema and oracle discipline stay.
  */
object Multimodal {

  /** Deterministic image dimensions/pixels for id — the shared contract
    * between the executor-side PNG fixture and the DuckDB oracle
    * restatement (all integer arithmetic, SQL-expressible):
    *   w = 8 + id % 9, h = 8 + (id * 7) % 9    (8..16 per side)
    *   r(x,y) = (id*31 + x*7  + y*13) % 256
    *   g(x,y) = (id*17 + x*3  + y*5 ) % 256
    *   b(x,y) = (id*13 + x*11 + y*3 ) % 256
    * Requires 0 <= id < 2^57 (doc ids are): the largest multiplier is
    * 31, and id*31 must not overflow Long or the executor formula and
    * any non-overflowing oracle restatement diverge. */
  @inline def imgW(id: Long): Int = (8 + id % 9).toInt
  @inline def imgH(id: Long): Int = (8 + (id * 7) % 9).toInt
  @inline def pxR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  @inline def pxG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 3 + y * 5) % 256).toInt
  @inline def pxB(id: Long, x: Int, y: Int): Int = ((id * 13 + x * 11 + y * 3) % 256).toInt

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

  /** Executor-side PNG encode of the deterministic raster for `id` —
    * a real `javax.imageio` compress, not a fake payload. */
  private def encodePng(id: Long): Array[Byte] =
    pngOf(imgW(id), imgH(id), (x, y) =>
      (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))

  /** Media table of real PNG blobs, one image per row of `df` keyed by a
    * non-negative long `idCol`. Encoding runs distributed in
    * mapPartitions; only the ~0.5 KB PNG bytes ever sit in a row. */
  def pngMediaTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType),
        StructField("n_bytes", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per read
      rows.map { r =>
        val id = r.getLong(0)
        val png = encodePng(id)
        Row(id, png, Row("image/png", png.length.toLong, imgW(id), imgH(id)))
      }
    }(enc)
  }

  /** REAL decode + feature extraction: `ImageIO.read` over the PNG bytes,
    * then per-channel pixel sums over the decoded raster. Runs via
    * mapPartitions — per-partition decoder setup, one batch pass, the
    * exact seat a vectorized JPEG/video decode takes at 100 TB.
    *
    * `lenient = false` (default): an undecodable blob fails the job
    * loudly. `lenient = true`: corrupt rows are skipped (the 100 TB
    * corrupt-media policy — see [[decodeVideoFrames]]); rejects = input
    * media_ids anti-joined against the output. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     lenient: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        def decode(): Row = {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          if (img == null)
            throw new java.io.IOException(s"undecodable image blob $id")
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y)
              sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
              x += 1
            }
            y += 1
          }
          Row(id, w, h, w.toLong * h, sr, sg, sb)
        }
        if (!lenient) Iterator.single(decode())
        else try Iterator.single(decode())
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** REAL resize: decode the PNG, nearest-neighbor-downsample the decoded
    * raster by integer `factor` (out(x,y) = in(factor*x, factor*y) — the
    * one resampling kernel with an exact relational restatement), then
    * RE-encode to PNG and decode AGAIN before computing the output pixel
    * sums, so the emitted values prove a full encode->decode->resize->
    * encode->decode round trip through the codec. */
  def decodeResize(spark: SparkSession, media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val ow = math.max(1, img.getWidth / factor)
        val oh = math.max(1, img.getHeight / factor)
        val small = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            small.setRGB(x, y, img.getRGB(x * factor, y * factor))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream(512)
        javax.imageio.ImageIO.write(small, "png", bos)
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        var (sr, sg, sb) = (0L, 0L, 0L)
        y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val v = back.getRGB(x, y)
            sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
            x += 1
          }
          y += 1
        }
        Row(id, ow, oh, sr, sg, sb)
      }
    }(enc)
  }

  // ------------------------------------------------------------- audio

  /** Deterministic PCM16 waveform for id — integer-only (no
    * transcendentals, so the DuckDB oracle restates it bit-exactly):
    *   n_samples = 800 + (id % 5) * 200          (800..1600)
    *   s(t) = ((id*31 + t*t*7 + t*13) % 65536) - 32768
    * Requires 0 <= id < 2^57 (see the image contract's overflow note). */
  @inline def audioN(id: Long): Int = (800 + (id % 5) * 200).toInt
  @inline def audioSample(id: Long, t: Int): Int =
    (((id * 31 + t.toLong * t * 7 + t * 13L) % 65536L) - 32768L).toInt

  private val AudioRate = 8000f
  private def audioFormat = new javax.sound.sampled.AudioFormat(
    AudioRate, 16, 1, true /*signed*/, false /*little-endian*/)

  /** Real WAV encode of PCM16 samples via JDK `javax.sound.sampled`. */
  private[graft] def encodeWav(samples: Array[Int]): Array[Byte] = {
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => pcm.putShort(s.toShort))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), audioFormat,
      samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream(samples.length * 2 + 64)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode back to PCM16 samples. Throws on unparsable bytes
    * (javax.sound raises UnsupportedAudioFileException). */
  private[graft] def decodeWav(wav: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bytes = ais.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(bytes.length / 2)(i => bb.getShort(i * 2).toInt)
  }

  /** Media table of real WAV blobs (PCM16 mono, 8 kHz), one clip per row
    * of `df` keyed by non-negative long `idCol`. */
  def wavMediaTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType),
        StructField("n_bytes", LongType),
        StructField("n_samples", IntegerType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val wav = encodeWav(Array.tabulate(audioN(id))(audioSample(id, _)))
        Row(id, wav, Row("audio/wav", wav.length.toLong, audioN(id)))
      }
    }(enc)
  }

  /** REAL audio decode + feature extraction: WAV bytes -> PCM samples ->
    * integer-exact clip statistics (abs-sum, energy, zero crossings —
    * the standard VAD/loudness primitives). PCM16-in-WAV is lossless, so
    * the oracle restates the waveform formula relationally.
    *
    * `lenient`: same corrupt-media policy as [[decodeFeatures]] —
    * unparsable clips skip instead of failing the job. */
  def decodeAudioFeatures(spark: SparkSession, media: DataFrame,
                          lenient: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("sum_sq", LongType),
      StructField("zero_cross", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        def decode(): Row = {
          val s = decodeWav(r.getAs[Array[Byte]](1))
          var (sa, sq, zc) = (0L, 0L, 0L)
          var i = 0
          while (i < s.length) {
            sa += math.abs(s(i)); sq += s(i).toLong * s(i)
            if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) zc += 1
            i += 1
          }
          Row(id, s.length.toLong, sa, sq, zc)
        }
        if (!lenient) Iterator.single(decode())
        else try Iterator.single(decode())
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** REAL audio downsample: decode, keep every `factor`-th sample
    * (out(k) = in(factor*k) — exactly restatable), RE-encode to WAV and
    * decode AGAIN before computing output statistics, so emitted values
    * survived two codec round trips (same discipline as [[decodeResize]]). */
  def decodeAudioDownsample(spark: SparkSession, media: DataFrame,
                            factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_out", LongType),
      StructField("sum_abs", LongType),
      StructField("sum_sq", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val s = decodeWav(r.getAs[Array[Byte]](1))
        val nOut = math.max(1, s.length / factor)
        val back = decodeWav(encodeWav(Array.tabulate(nOut)(k => s(k * factor))))
        var (sa, sq) = (0L, 0L)
        var i = 0
        while (i < back.length) {
          sa += math.abs(back(i)); sq += back(i).toLong * back(i); i += 1
        }
        Row(id, back.length.toLong, sa, sq)
      }
    }(enc)
  }

  // ------------------------------------------------------------- video

  /** Deterministic video clip for id — the shared contract between the
    * executor-side fixture and the DuckDB oracle restatement (integer
    * arithmetic only, SQL-expressible). Frame dims are constant per clip;
    * the pixel formula varies by frame index `f`:
    *   n_frames = 3 + id % 4                (3..6)
    *   w = 6 + id % 3, h = 6 + (id * 5) % 3 (6..8 per side)
    *   r(f,x,y) = (id*31 + f*19 + x*7  + y*13) % 256
    *   g(f,x,y) = (id*17 + f*23 + x*3  + y*5 ) % 256
    *   b(f,x,y) = (id*13 + f*29 + x*11 + y*3 ) % 256
    * Requires 0 <= id < 2^57 (see the image contract's overflow note). */
  @inline def vidFrames(id: Long): Int = (3 + id % 4).toInt
  @inline def vidW(id: Long): Int = (6 + id % 3).toInt
  @inline def vidH(id: Long): Int = (6 + (id * 5) % 3).toInt
  @inline def vpxR(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 19 + x * 7 + y * 13) % 256).toInt
  @inline def vpxG(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 17 + f * 23 + x * 3 + y * 5) % 256).toInt
  @inline def vpxB(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 13 + f * 29 + x * 11 + y * 3) % 256).toInt

  /** PNG-encode one raster given per-pixel packed RGB. */
  private[graft] def pngOf(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** MJPEG-style container framing: the JDK ships no video container
    * parser (AVI/MP4), so clips use a minimal length-prefixed framing —
    * 4-byte big-endian frame count, then per frame a 4-byte big-endian
    * length followed by real PNG bytes. The per-frame codec work (PNG
    * encode/decode via `javax.imageio`) is real; only the container is
    * this custom framing, exactly the seat an AVI/MJPEG parser takes. */
  private def encodeVideo(id: Long): Array[Byte] = {
    val (nf, w, h) = (vidFrames(id), vidW(id), vidH(id))
    val frames = Array.tabulate(nf) { f =>
      pngOf(w, h, (x, y) =>
        (vpxR(id, f, x, y) << 16) | (vpxG(id, f, x, y) << 8) | vpxB(id, f, x, y))
    }
    val bb = java.nio.ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
    bb.putInt(nf)
    frames.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  /** Parse the container into per-frame PNG byte slices.
    *
    * Length prefixes are UNTRUSTED input: a corrupt blob whose frame
    * count or frame length decodes to a huge positive int would drive
    * Array.fill / new Array[Byte] into an OutOfMemoryError — an Error
    * NonFatal does NOT catch, so the lenient corrupt-media policy
    * ("one bad container must not kill a 1000-executor job") would
    * still kill executors on that corruption class. Every prefix is
    * therefore validated against the bytes actually remaining (a frame
    * costs at least its 4-byte length prefix) and violations throw
    * IOException, which the lenient catch handles like any other
    * corruption (round-15 advice #1). */
  private[graft] def videoFrameBytes(blob: Array[Byte]): Array[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    if (bb.remaining() < 4)
      throw new java.io.IOException("truncated container: no frame count")
    val n = bb.getInt()
    if (n < 0 || n > bb.remaining() / 4)
      throw new java.io.IOException(
        s"corrupt frame count $n for ${bb.remaining()} payload bytes")
    Array.fill(n) {
      if (bb.remaining() < 4)
        throw new java.io.IOException("truncated container: no frame length")
      val len = bb.getInt()
      if (len < 0 || len > bb.remaining())
        throw new java.io.IOException(
          s"corrupt frame length $len with ${bb.remaining()} bytes left")
      val p = new Array[Byte](len); bb.get(p); p
    }
  }

  /** Decode every frame of a clip, IOException (not an opaque NPE) on
    * undecodable bytes — shared by the whole-clip decode family so the
    * corrupt-media policy is uniform (round-15 advice #2). */
  private def decodeAllFrames(id: Long,
                              blob: Array[Byte]): Array[java.awt.image.BufferedImage] =
    videoFrameBytes(blob).zipWithIndex.map { case (p, f) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null)
        throw new java.io.IOException(s"undecodable frame $f of clip $id")
      img
    }

  // -------------------------------------------------------- animated GIF

  /** 256-entry grayscale palette: exactly the value set of [[vpxR]], so
    * GIF's indexed color encodes these rasters LOSSLESSLY — the same
    * exact-oracle premise PNG gives the RGB paths. */
  private lazy val gray256: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode the deterministic clip as a STANDARD animated GIF (multi-
    * frame, via the JDK's GIF ImageWriter write-sequence API) — the
    * real-container seat the custom MJPEG-style framing cannot fill.
    * Frames are full-size 256-gray rasters with gray(f,x,y) = [[vpxR]];
    * the explicit [[gray256]] IndexColorModel becomes the GIF color
    * table verbatim, so no writer-side quantization can occur. */
  private[graft] def encodeGif(id: Long): Array[Byte] = {
    val (nf, w, h) = (vidFrames(id), vidW(id), vidH(id))
    encodeGifGray(nf, w, h, (f, x, y) => vpxR(id, f, x, y))
  }

  /** Animated-GIF encode of `nf` full-size gray frames (value function
    * in [0,255]) — content-generic so the codec round-trip property can
    * pin losslessness for ARBITRARY gray content, not just the fixture
    * formula. */
  private[graft] def encodeGifGray(nf: Int, w: Int, h: Int,
                                   gray: (Int, Int, Int) => Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // The JDK GIF writer defaults to INTERLACED frames; disable it —
      // the row-reorder buys nothing for full-frame reads and the
      // row-0-only probe below showed interlaced tiny frames decode
      // wrong on the read side (row 1 lost on a 1x2 raster).
      val wp = writer.getDefaultWriteParam
      wp.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      var f = 0
      while (f < nf) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, gray256)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gray(f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), wp)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode ALL frames of a standard multi-frame image container (GIF)
    * through the JDK's format-detecting reader — `getNumImages` /
    * `read(i)`, no custom framing anywhere on the read path. Returns
    * the decoded gray rasters. IOException (never null/NPE) on
    * undecodable bytes, per the shared corrupt-media policy. */
  private[graft] def readGifFrames(id: Long,
                                   blob: Array[Byte]): Array[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new java.io.IOException(s"unrecognized container for clip $id")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0)
          throw new java.io.IOException(s"no frames in clip $id")
        Array.tabulate(n)(reader.read(_))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Media table of STANDARD animated GIFs (one clip per row of `df`,
    * keyed by non-negative long `idCol`), encoded distributed via the
    * JDK GIF writer. Same clip geometry as [[videoMediaTable]]. */
  def gifMediaTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType),
        StructField("n_bytes", LongType),
        StructField("n_frames", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val clip = encodeGif(id)
        Row(id, clip,
          Row("image/gif", clip.length.toLong, vidFrames(id), vidW(id), vidH(id)))
      }
    }(enc)
  }

  /** REAL standard-container video decode: ImageIO's multi-frame GIF
    * reader parses the container (no custom framing), every frame is
    * decoded and reduced to a gray pixel sum. Output one row per frame:
    * (media_id, frame_idx, width, height, sum_v). `lenient` skips a
    * corrupt clip atomically (the shared policy). */
  def decodeGifFrames(spark: SparkSession, media: DataFrame,
                      lenient: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_v", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        def all(): Iterator[Row] = {
          val frames = readGifFrames(id, r.getAs[Array[Byte]](1))
          Iterator.range(0, frames.length).map { f =>
            val img = frames(f)
            val (w, h) = (img.getWidth, img.getHeight)
            var sv = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                // gray raster: all three channels carry the same value
                sv += (img.getRGB(x, y) >> 16) & 0xFF
                x += 1
              }
              y += 1
            }
            Row(id, f, w, h, sv)
          }
        }
        if (!lenient) all()
        else try all().toVector.iterator
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** Media table of MJPEG-style clips of real PNG frames, one clip per
    * row of `df` keyed by non-negative long `idCol`. Encoding runs
    * distributed; a clip is a few KB of PNG bytes. */
  def videoMediaTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType),
        StructField("n_bytes", LongType),
        StructField("n_frames", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val clip = encodeVideo(id)
        Row(id, clip,
          Row("video/x-mjpeg-png", clip.length.toLong, vidFrames(id), vidW(id), vidH(id)))
      }
    }(enc)
  }

  /** REAL frame sampling + decode + feature extraction: parse the
    * container, ImageIO-decode every `stride`-th frame, reduce each to
    * per-channel pixel sums — the canonical video-pipeline primitive
    * (sample 1-in-k frames, featurize each). One output row per KEPT
    * frame; skipped frames are never decoded, which is the point of
    * sampling at 100 TB (decode cost scales with kept frames, I/O with
    * clip bytes).
    *
    * `lenient = false` (default): any unparsable container or
    * undecodable frame fails the job loudly. `lenient = true`: a corrupt
    * clip is skipped ATOMICALLY (no partial frames emitted) — the
    * corrupt-media policy a 100 TB ingest needs; rejects = input
    * media_ids anti-joined against the output. */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame,
                        stride: Int = 1, lenient: Boolean = false): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        def decodeAll(): Iterator[Row] = {
          val frames = videoFrameBytes(r.getAs[Array[Byte]](1))
          Iterator.range(0, frames.length).filter(_ % stride == 0).map { f =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frames(f)))
            // ImageIO returns null (no exception) for unrecognizable bytes
            if (img == null)
              throw new java.io.IOException(s"undecodable frame $f of clip $id")
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
                x += 1
              }
              y += 1
            }
            Row(id, f, w, h, sr, sg, sb)
          }
        }
        if (!lenient) decodeAll()
        // lenient: at corpus scale SOME blobs are corrupt, and one bad
        // container must not kill a 1000-executor job. Clip-level
        // atomicity: materialize the clip's rows BEFORE emitting (the
        // lazy iterator would otherwise emit early frames and then
        // throw on a later corrupt one), skip the whole clip on any
        // parse/decode failure. Rejects are recoverable relationally:
        // anti-join input media_ids against the output.
        else try decodeAll().toVector.iterator
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** REAL temporal feature: decode ALL frames of each clip and sum the
    * absolute per-pixel differences between consecutive DECODED frames
    * per channel — the motion/scene-change primitive. Integer-exact over
    * lossless PNG frames, so the oracle restates it from the formula.
    * `lenient` follows the shared corrupt-media policy of
    * [[decodeVideoFrames]]: skip a corrupt clip atomically instead of
    * failing the job. */
  def decodeVideoMotion(spark: SparkSession, media: DataFrame,
                        lenient: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", LongType),
      StructField("motion_r", LongType),
      StructField("motion_g", LongType),
      StructField("motion_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        def one(): Row = {
          val frames = decodeAllFrames(id, r.getAs[Array[Byte]](1))
          var (mr, mg, mb) = (0L, 0L, 0L)
          var f = 1
          while (f < frames.length) {
            val (prev, cur) = (frames(f - 1), frames(f))
            val (w, h) = (cur.getWidth, cur.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val a = cur.getRGB(x, y); val b = prev.getRGB(x, y)
                mr += math.abs(((a >> 16) & 0xFF) - ((b >> 16) & 0xFF))
                mg += math.abs(((a >> 8) & 0xFF) - ((b >> 8) & 0xFF))
                mb += math.abs((a & 0xFF) - (b & 0xFF))
                x += 1
              }
              y += 1
            }
            f += 1
          }
          Row(id, frames.length.toLong, mr, mg, mb)
        }
        if (!lenient) Iterator.single(one())
        else try Iterator.single(one())
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** REAL per-pair temporal diffs: decode ALL frames and emit one row per
    * consecutive frame pair — (media_id, frame_idx of the LATER frame,
    * frame dims, per-channel abs pixel-diff sums). The keyframe /
    * scene-change primitive: a downstream relational filter on the diff
    * magnitude picks the frames where content moved, without any
    * driver-side logic. Integer-exact over lossless PNG frames.
    * `lenient` skips a corrupt clip atomically (the shared policy). */
  def decodeVideoFrameDiffs(spark: SparkSession, media: DataFrame,
                            lenient: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("diff_r", LongType),
      StructField("diff_g", LongType),
      StructField("diff_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        def all(): Iterator[Row] = {
          val frames = decodeAllFrames(id, r.getAs[Array[Byte]](1))
          Iterator.range(1, frames.length).map { f =>
            val (prev, cur) = (frames(f - 1), frames(f))
            val (w, h) = (cur.getWidth, cur.getHeight)
            var (dr, dg, db) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val a = cur.getRGB(x, y); val b = prev.getRGB(x, y)
                dr += math.abs(((a >> 16) & 0xFF) - ((b >> 16) & 0xFF))
                dg += math.abs(((a >> 8) & 0xFF) - ((b >> 8) & 0xFF))
                db += math.abs((a & 0xFF) - (b & 0xFF))
                x += 1
              }
              y += 1
            }
            Row(id, f, w, h, dr, dg, db)
          }
        }
        if (!lenient) all()
        // clip-level atomicity, as in decodeVideoFrames: materialize
        // before emitting so a late corrupt frame can't half-emit
        else try all().toVector.iterator
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
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
