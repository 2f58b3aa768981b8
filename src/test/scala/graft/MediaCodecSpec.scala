package graft

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real-binary codec demo: the [[Multimodal.AssetCodec]] seam
  * exercised on GENUINE media bytes — a hand-laid 24-bit BMP decoded
  * by `javax.imageio` and a PCM16 WAV decoded by
  * `javax.sound.sampled`, both JDK-built-in — through the DISTRIBUTED
  * decode path (`decodeAssetFrame`'s executor-side mapPartitions).
  *
  * The round-8/9 codec-swap spec proved the seam's plumbing with an
  * ASCII-arithmetic test codec; this one closes the remaining gap:
  * true binary payloads, real decoders, pixel/sample-level
  * assertions derived INDEPENDENTLY from the known image/audio
  * content (so a codec that merely hashes bytes without decoding
  * cannot pass). The stub remains the registered default — ffmpeg-
  * class media libs stay environmental; the JDK formats demonstrate
  * the seam is decode-ready, not text-only.
  */
class MediaCodecSpec extends AnyFunSuite {
  import TestSession.spark

  /** Test-scope codec: BMP via ImageIO, WAV via AudioSystem, stub
    * passthrough otherwise. Honors the AssetCodec contract — the
    * oracle-gated byte-arithmetic columns (n_bytes, n_frames,
    * mean_byte) come from the stub's payload math; codec-specific
    * signal rides first_frame_checksum.
    */
  private object JdkMediaCodec extends Multimodal.AssetCodec {
    override def decode(docId: Long, payload: Array[Byte]): Multimodal.AssetFeatures = {
      val base = Multimodal.decodeStub(docId, payload)
      val sig =
        if (payload.length > 2 && payload(0) == 'B' && payload(1) == 'M') {
          val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
          require(img != null, s"doc $docId: ImageIO could not decode a BM payload")
          var acc = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              acc = acc * 31 + (img.getRGB(x, y) & 0xffffff); x += 1
            }
            y += 1
          }
          acc
        } else if (payload.length > 4 && payload(0) == 'R' &&
            payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F') {
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new ByteArrayInputStream(payload))
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"doc $docId: fixture WAVs are PCM16 mono")
          val data = in.readAllBytes()
          var acc = 0L
          var i = 0
          while (i + 1 < data.length) {
            val s = (((data(i + 1) & 0xff) << 8) | (data(i) & 0xff)).toShort
            acc = acc * 31 + s
            i += 2
          }
          acc
        } else base.first_frame_checksum
      base.copy(first_frame_checksum = sig)
    }
  }

  /** A 2x2 24-bit uncompressed BMP, laid out byte by byte: TL red,
    * TR green, BL blue, BR white (rows stored bottom-up, BGR, 4-byte
    * row padding — the classic Windows DIB format).
    */
  private def buildBmp(): Array[Byte] = {
    val buf = ByteBuffer.allocate(70).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(70)          // file size
    buf.putInt(0)           // reserved
    buf.putInt(54)          // pixel data offset
    buf.putInt(40)          // BITMAPINFOHEADER size
    buf.putInt(2).putInt(2) // width, height
    buf.putShort(1)         // planes
    buf.putShort(24)        // bpp
    buf.putInt(0)           // BI_RGB
    buf.putInt(16)          // image size (2 rows x 8 bytes)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0) // palette
    // bottom row: BL blue (B,G,R = FF,00,00), BR white; pad
    buf.put(Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0))
    // top row: TL red (00,00,FF), TR green (00,FF,00); pad
    buf.put(Array[Byte](0, 0, -1, 0, -1, 0, 0, 0))
    buf.array()
  }

  private val WavSamples = Array[Short](1000, -2000, 32767, -32768, 123)

  /** A PCM16 mono 8 kHz WAV (44-byte RIFF header + LE samples). */
  private def buildWav(): Array[Byte] = {
    val dataSize = WavSamples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)     // PCM
    buf.putShort(1)     // mono
    buf.putInt(8000)    // sample rate
    buf.putInt(16000)   // byte rate
    buf.putShort(2)     // block align
    buf.putShort(16)    // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    WavSamples.foreach(buf.putShort)
    buf.array()
  }

  test("JDK codecs decode genuine BMP/WAV bytes through the distributed path") {
    import spark.implicits._
    val bmp = buildBmp()
    val wav = buildWav()
    val txt = "plain text payload".getBytes("UTF-8")
    val df = Seq((1L, bmp), (2L, wav), (3L, txt))
      .toDF("doc_id", "payload")
      .repartition(3) // three tasks: the decode MUST run executor-side
    Multimodal.AssetCodec.install(JdkMediaCodec)
    try {
      val out = Multimodal.decodeAssetFrame(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      // contract columns stay the stub's payload arithmetic exactly
      Seq(1L -> bmp, 2L -> wav, 3L -> txt).foreach { case (id, p) =>
        val stub = Multimodal.decodeStub(id, p)
        val r = out(id)
        assert(r.getAs[Long]("n_bytes") == stub.n_bytes)
        assert(r.getAs[Long]("n_frames") == stub.n_frames)
        assert(r.getAs[Double]("mean_byte") == stub.mean_byte)
      }
      // pixel-level truth, derived from the KNOWN image content (not
      // from the codec): row-major fold of the four aRGB pixels
      val expectBmp = Seq(0xFF0000L, 0x00FF00L, 0x0000FFL, 0xFFFFFFL)
        .foldLeft(0L)((a, px) => a * 31 + px)
      assert(out(1L).getAs[Long]("first_frame_checksum") == expectBmp,
        "ImageIO must recover the exact pixel colors from the BMP bytes")
      // sample-level truth from the known PCM content
      val expectWav = WavSamples.foldLeft(0L)((a, s) => a * 31 + s)
      assert(out(2L).getAs[Long]("first_frame_checksum") == expectWav,
        "AudioSystem must recover the exact PCM samples from the WAV bytes")
      // non-media payloads fall back to the stub's checksum
      assert(out(3L).getAs[Long]("first_frame_checksum") ==
        Multimodal.decodeStub(3L, txt).first_frame_checksum)
    } finally Multimodal.AssetCodec.reset()
    assert(Multimodal.AssetCodec.current eq Multimodal.AssetCodec.Stub)
  }
}
