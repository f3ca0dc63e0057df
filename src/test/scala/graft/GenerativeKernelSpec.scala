package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, Ocr}

/** Generative (scalacheck) coverage for the pure-JVM media kernels: the
  * fixed fixtures prove specific values; these prove the kernels hold
  * over the input space. Draws are seeded, so failures reproduce. */
class GenerativeKernelSpec extends AnyFunSuite {

  /** n deterministic draws from g (seeded — no flaky CI). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("OCR round-trips arbitrary charset strings through real PNG bytes") {
    val charGen = Gen.oneOf(('A' to 'Z') ++ ('0' to '9'))
    val wordGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)
    val lineGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val pageGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, lineGen))
    samples(pageGen, 25).foreach { lines =>
      val img = ImageIO.read(new ByteArrayInputStream(Ocr.renderPng(lines)))
      assert(Ocr.recognize(img) == lines, s"failed for $lines")
    }
  }

  test("BMP encode-decode reproduces the pixel formulas at arbitrary geometry") {
    val geom = for { w <- Gen.choose(1, 40); h <- Gen.choose(1, 40) } yield (w, h)
    samples(geom, 25).foreach { case (w, h) =>
      val img = ImageIO.read(new ByteArrayInputStream(MediaCodec.bmpBytes(w, h)))
      assert(img.getWidth == w && img.getHeight == h)
      // spot-check the corner pixels + one interior pixel per draw
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1), (w / 2, h / 2))) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xFF) == MediaCodec.pixelR(x, y), s"R at ($x,$y) of ${w}x$h")
        assert(((p >> 8) & 0xFF) == MediaCodec.pixelG(x, y))
        assert((p & 0xFF) == MediaCodec.pixelB(x, y))
      }
    }
  }

  test("hand-rolled WAV bytes parse through javax.sound with exact frame math") {
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 2)
      frames <- Gen.choose(1, 400)
    } yield (rate, ch, frames)
    samples(gen, 15).foreach { case (rate, ch, frames) =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(MediaCodec.wavBytes(rate, ch, frames)))
      val fmt = in.getFormat
      assert(fmt.getChannels == ch && fmt.getSampleRate.toInt == rate &&
        fmt.getSampleSizeInBits == 16)
      val bytes = in.readAllBytes()
      assert(bytes.length == frames * ch * 2)
      // first frame, channel 0 decodes to the formula value
      val v0 = ((bytes(1) << 8) | (bytes(0) & 0xFF)).toShort.toInt
      assert(v0 == MediaCodec.pcmSample(0, 0))
    }
  }

  test("trimmed OCR glyph templates stay pairwise distinct") {
    val bitmaps = Ocr.trimmedFont.values.toSeq
    assert(bitmaps.distinct.size == bitmaps.size,
      "two glyphs share a trimmed bitmap — recognition would be ambiguous")
  }
}
