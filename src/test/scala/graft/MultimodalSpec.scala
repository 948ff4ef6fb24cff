package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the REAL image-codec properties of the multimodal path (r17): the
  * payloads are genuine PNG containers, the decoded raster matches the
  * closed-form generator pixel-for-pixel, and the resample's source mapping
  * is the deterministic integer one the oracle replays. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("payloads are real PNG containers the JDK decoder accepts") {
    val rows = Multimodal.pngPayloads(spark, sf)
      .filter("doc_id < 20").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      // PNG 8-byte signature, per the PNG spec
      assert(bytes.take(8).sameElements(
        Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)))
      assert(Multimodal.sniffFormat(bytes) == "png")
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "JDK PNG reader rejected the payload")
    }
  }

  test("decode roundtrip is pixel-exact vs the closed-form generator") {
    val rows = Multimodal.pngPayloads(spark, sf)
      .filter("doc_id IN (0, 7, 123, 499)").collect()
    rows.foreach { r =>
      val d = r.getLong(0)
      val img = ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      assert(img.getWidth == Multimodal.genWidth(d))
      assert(img.getHeight == Multimodal.genHeight(d))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val (er, eg, eb) = Multimodal.pixel(d, x, y)
        assert(((rgb >> 16) & 0xFF) == er && ((rgb >> 8) & 0xFF) == eg &&
          (rgb & 0xFF) == eb, s"pixel mismatch doc=$d ($x,$y)")
      }
    }
  }

  test("extractFeatures decodes through the real reader (dims + format)") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.pngPayloads(spark, sf).filter("doc_id < 50")).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.format == "png")
      assert(f.width == Multimodal.genWidth(f.doc_id))
      assert(f.height == Multimodal.genHeight(f.doc_id))
      assert(f.mean_r >= 0.0 && f.mean_r <= 255.0)
    }
  }

  test("jpeg arm: real lossy roundtrip — dims/format exact, means gated") {
    val rows = Multimodal.multimodalJpeg.fn(spark, sf)
      .filter("doc_id < 100").collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getString(1) == "jpeg", s"doc $d: sniff said ${r.getString(1)}")
      assert(r.getInt(2) == Multimodal.genWidth(d) &&
        r.getInt(3) == Multimodal.genHeight(d), s"doc $d: dims drifted")
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"doc $d: a channel mean drifted past the measured JPEG tolerance")
    }
  }

  test("nearest resample uses the integer source mapping (sx = x*w/W)") {
    val d = 42L
    val img = ImageIO.read(new ByteArrayInputStream(
      Multimodal.pngPayloads(spark, sf).filter(s"doc_id = $d")
        .head().getAs[Array[Byte]](1)))
    val out = Multimodal.resizeNearest(img)
    assert(out.getWidth == 8 && out.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val (er, eg, eb) =
        Multimodal.pixel(d, x * img.getWidth / 8, y * img.getHeight / 8)
      val rgb = out.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == er && ((rgb >> 8) & 0xFF) == eg &&
        (rgb & 0xFF) == eb)
    }
  }

  test("gif frames: real animated container, demux is pixel-exact (r19)") {
    for (d <- Seq(0L, 7L, 23L, 101L)) {
      val bytes = Multimodal.genGif(d)
      // GIF signature per the spec
      assert(new String(bytes.take(3), "US-ASCII") == "GIF")
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      reader.setInput(iis)
      assert(reader.getNumImages(true) == Multimodal.genFrames(d))
      // decode a middle frame and compare every pixel to the closed form
      val f = Multimodal.genFrames(d) / 2
      val img = reader.read(f)
      assert(img.getWidth == Multimodal.genWidth(d) &&
        img.getHeight == Multimodal.genHeight(d))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xff) == Multimodal.framePixel(d, f, x, y),
          s"doc $d frame $f pixel ($x,$y)")
      iis.close()
    }
  }

  test("sampleFrames demuxes at even stride with exact pixel sums") {
    import spark.implicits._
    val payloads = Seq(5L, 42L).toDF("doc_id")
      .as[Long].map(id => (id, Multimodal.genGif(id))).toDF("doc_id", "payload")
    val rows = Multimodal.sampleFrames(spark, payloads).collect()
      .groupBy(_.doc_id)
    for ((d, frames) <- rows) {
      val nf = Multimodal.genFrames(d)
      val k = math.min(4, nf)
      assert(frames.length == k)
      assert(frames.map(_.frame_no).sorted.sameElements(
        (0 until k).map(i => i * nf / k)))
      for (fr <- frames) {
        var sum = 0L
        for (y <- 0 until fr.height; x <- 0 until fr.width)
          sum += Multimodal.framePixel(d, fr.frame_no, x, y)
        assert(fr.pix_sum == sum && fr.n_frames == nf)
      }
    }
  }
}
