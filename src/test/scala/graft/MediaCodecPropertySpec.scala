package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.operators.Multimodal

/** Losslessness properties of the JDK codec paths on ARBITRARY content —
  * the oracle-exactness premise. The fixture entries only ever encode
  * formula-generated pixels/samples; these properties pin that the PNG
  * raster, the WAV PCM16 stream, and the MJPEG-style container framing
  * round-trip bit-exactly for ANY content, so the "lossless codec =>
  * exact relational oracle" argument does not secretly depend on the
  * fixture's value distribution (e.g. a color-type heuristic in the PNG
  * writer or a PCM clamp in the WAV path would surface here, not in
  * production). Driver-side: these are the exact functions the
  * mapPartitions executors run. */
object MediaCodecPropertySpec extends Properties("media-codec") {

  private val genDim = Gen.choose(1, 24)
  private val genSeed = Gen.choose(Long.MinValue, Long.MaxValue)

  private def rgbAt(seed: Long, x: Int, y: Int): Int = {
    // cheap splitmix-style scramble: full 24-bit RGB coverage, incl.
    // 0x000000 / 0xFFFFFF extremes for small seeds
    var z = seed + x * 0x9E3779B97F4A7C15L + y * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    ((z >>> 24) & 0xFFFFFF).toInt
  }

  property("PNG round-trips arbitrary rasters bit-exactly") =
    forAll(genDim, genDim, genSeed) { (w, h, seed) =>
      val png = Multimodal.pngOf(w, h, (x, y) => rgbAt(seed, x, y))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      var ok = img != null && img.getWidth == w && img.getHeight == h
      var y = 0
      while (ok && y < h) {
        var x = 0
        while (ok && x < w) {
          ok = (img.getRGB(x, y) & 0xFFFFFF) == rgbAt(seed, x, y)
          x += 1
        }
        y += 1
      }
      ok :| s"pixel mismatch for ${w}x$h seed=$seed"
    }

  property("WAV round-trips arbitrary PCM16 bit-exactly") =
    forAll(Gen.nonEmptyListOf(
        Gen.oneOf(Gen.choose(-32768, 32767), Gen.oneOf(-32768, -1, 0, 1, 32767)))) {
      samples =>
        val s = samples.toArray
        val back = Multimodal.decodeWav(Multimodal.encodeWav(s))
        (back.length == s.length && back.sameElements(s)) :|
          s"PCM mismatch on ${s.length} samples"
    }

  property("container framing round-trips arbitrary frame payloads exactly") =
    forAll(Gen.listOf(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)))) {
      payloads =>
        val frames = payloads.map(_.toArray).toArray
        val bb = java.nio.ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
        bb.putInt(frames.length)
        frames.foreach { p => bb.putInt(p.length); bb.put(p) }
        val parsed = Multimodal.videoFrameBytes(bb.array())
        (parsed.length == frames.length &&
          parsed.zip(frames).forall { case (a, b) => a.sameElements(b) }) :|
          s"framing mismatch on ${frames.length} frames"
    }

  // Length prefixes are untrusted: a corrupt count/len decoding to a
  // huge positive int must throw IOException (handled by the lenient
  // corrupt-media policy) BEFORE any proportional allocation — an
  // OutOfMemoryError is an Error that NonFatal does not catch, so this
  // corruption class would otherwise kill executors (round-15 advice).
  private def throwsIoe(blob: Array[Byte]): Boolean =
    try { Multimodal.videoFrameBytes(blob); false }
    catch { case _: java.io.IOException => true }

  property("corrupt frame COUNT throws IOException, never allocates") =
    forAll(Gen.oneOf(Gen.choose(1, Int.MaxValue), Gen.const(Int.MaxValue)),
           Gen.choose(0, 32)) { (badCount, pad) =>
      // payload can hold at most pad/4 frames; any count above that lies
      val bb = java.nio.ByteBuffer.allocate(4 + pad)
      bb.putInt(badCount)
      (badCount > pad / 4) ==> throwsIoe(bb.array())
    }

  property("corrupt frame LENGTH throws IOException, never allocates") =
    forAll(Gen.choose(1, Int.MaxValue), Gen.choose(0, 32)) { (badLen, pad) =>
      val bb = java.nio.ByteBuffer.allocate(8 + pad)
      bb.putInt(1)       // one frame
      bb.putInt(badLen)  // claiming more bytes than remain
      (badLen > pad) ==> throwsIoe(bb.array())
    }

  property("animated GIF round-trips arbitrary 256-gray frames exactly") =
    forAll(Gen.choose(1, 5), Gen.choose(1, 16), Gen.choose(1, 16), genSeed) {
      (nf, w, h, seed) =>
        def gray(f: Int, x: Int, y: Int): Int =
          rgbAt(seed + f * 0x9E37L, x, y) & 0xFF
        val blob = Multimodal.encodeGifGray(nf, w, h, gray)
        // decode through the JDK's format-detecting multi-frame reader —
        // the exact read path the mm_video_gif entry uses
        val frames = Multimodal.readGifFrames(0L, blob)
        val ok = frames.length == nf && frames.zipWithIndex.forall {
          case (img, f) =>
            img.getWidth == w && img.getHeight == h &&
              (0 until h).forall(y => (0 until w).forall { x =>
                ((img.getRGB(x, y) >> 16) & 0xFF) == gray(f, x, y)
              })
        }
        ok :| s"GIF round-trip mismatch nf=$nf w=$w h=$h"
    }

  property("negative count/length and truncated headers throw IOException") =
    forAll(Gen.oneOf(-1, Int.MinValue, -42)) { neg =>
      val c = java.nio.ByteBuffer.allocate(4).putInt(neg).array()
      val l = java.nio.ByteBuffer.allocate(8).putInt(1).putInt(neg).array()
      throwsIoe(c) && throwsIoe(l) &&
        throwsIoe(Array.empty[Byte]) && throwsIoe(Array[Byte](0, 0, 0))
    }
}
