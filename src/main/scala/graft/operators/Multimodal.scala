package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: the payload is a binary
  * column (or a `file::` pointer — reference: types/src/value/file.rs), the
  * pipeline extracts metadata/features per batch, and decode runs inside
  * `mapPartitions` so one task amortizes codec setup over its whole
  * partition.
  *
  * The IMAGE path is a real codec end-to-end: payloads are genuine PNG and
  * JPEG containers written by the in-JDK encoders (javax.imageio — public,
  * zero-dependency), and decode/feature-extract/resize run through the real
  * readers. The pixels are a deterministic closed-form function of
  * (doc_id, x, y); PNG is lossless 8-bit RGB, so the DuckDB oracle pins
  * the DECODED dimensions and per-channel means exactly from the same
  * closed form — a decoder that misread a single pixel would hash-mismatch.
  * JPEG is lossy: the oracle pins format + decoded dimensions exactly and
  * gates channel means within a measured tolerance of the closed form.
  * The FRAME sampler parses a real multi-frame container too (r19):
  * animated GIF — the one multi-image format the JDK both writes
  * (`ImageWriter.writeToSequence`) and demuxes (`getNumImages`/`read(i)`)
  * — with palette-indexed lossless frames the oracle replays exactly.
  * True video codecs (H.264 etc.) don't ship in the JDK and stay out of
  * scope; the GIF path exercises the same batch shape a video demuxer
  * needs: one row → container parse → ≤ SampleK frame rows. */
object Multimodal {

  // ImageIO defaults to a FILE-backed stream cache — every encode/decode
  // would hit disk for a temp cache file. In-memory payloads this small
  // want the memory cache (one-time JVM-wide switch, executor-side too
  // since this object initializes wherever the codec runs).
  ImageIO.setUseCache(false)

  // --- deterministic test images (closed-form pixels) --------------------

  /** Image dimensions for doc `d`: w ∈ 8..16, h ∈ 8..14 — small, varied,
    * and cheap for the oracle's unnest replay. */
  private[graft] def genWidth(d: Long): Int = 8 + (d % 9).toInt
  private[graft] def genHeight(d: Long): Int = 8 + ((d / 9) % 7).toInt

  /** Closed-form sRGB pixel of doc `d` at (x, y) — plain integer math the
    * oracle replays verbatim (BIGINT-safe; doc_id ≤ ~5k). */
  private[graft] def pixel(d: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((d * 31 + x * 7 + y * 13) % 256).toInt,
    ((d * 17 + x * 5 + y * 3) % 256).toInt,
    ((d * 11 + x * 3 + y * 29) % 256).toInt)

  private def renderImage(d: Long): BufferedImage = {
    val w = genWidth(d); val h = genHeight(d)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(d, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode a BufferedImage as a real PNG container (in-JDK encoder). */
  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Container sniff from magic bytes — the only part of decode that runs
    * before the codec (a real pipeline routes on it). */
  private[graft] def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
    else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
    else "raw"

  /** PNG-payload table: one real PNG per document row, rendered + encoded
    * inside mapPartitions (codec work amortized per partition, payloads
    * never leave the executors). This is the stand-in for a 100 TB binary
    * column scan — everything downstream treats `payload` as opaque. */
  def pngPayloads(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // documentsWide, not documents: the testdata table is ONE parquet row
    // group = one scan task, which serialized every encode/decode below
    // onto a single core; the trivial repartition fans the per-row codec
    // work across the cluster (see Tables.documentsWide — a no-op decision
    // on a real many-file corpus)
    Tables.documentsWide(spark, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // one encoder context per partition, reused across its rows
        it.map(id => (id, encodePng(renderImage(id))))
      }
      .toDF("doc_id", "payload")
  }

  /** Typed record for the image feature-extraction output. */
  final case class ImageFeature(doc_id: Long, format: String,
      width: Int, height: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Channel means of a decoded image — the feature vector the oracle pins. */
  private def channelMeans(img: BufferedImage): (Double, Double, Double) = {
    val w = img.getWidth; val h = img.getHeight
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    (round4(sr / n), round4(sg / n), round4(sb / n))
  }

  /** REAL decode + feature extraction over a binary column: mapPartitions
    * so the codec initializes once per partition; per row, the actual PNG
    * reader parses the container and the features come from the decoded
    * raster — not from byte statistics. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[ImageFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder context per partition (ImageIO registry lookup amortized)
        it.map { case (id, bytes) =>
          val fmt = sniffFormat(bytes)
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val (mr, mg, mb) = channelMeans(img)
          ImageFeature(id, fmt, img.getWidth, img.getHeight, mr, mg, mb)
        }
      }
  }

  /** SQL replay of the closed-form pixel channel `expr` averaged over the
    * doc's w×h raster — what a CORRECT decode must reproduce. */
  private def sqlDims =
    """SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 7 AS h
       FROM documents"""

  /** Metadata pass over the binary payload — pure column expressions (byte
    * length, content digest, base64 head), oracle-checked. */
  val multimodalMeta = Q("multimodal_meta",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              md5(text) AS digest,
              substring(to_base64(encode(text)), 1, 16) AS b64_head
       FROM documents ORDER BY doc_id""") {
    (s, d) =>
      val payload = col("text").cast("binary")
      Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text")).cast("bigint").as("n_bytes"),
        md5(payload).as("digest"),
        substring(base64(payload), 1, 16).as("b64_head"))
        .orderBy("doc_id")
  }

  /** Image decode + feature extraction, REAL codec: render → PNG-encode →
    * PNG-decode → per-channel means. The oracle computes the identical
    * stats from the closed-form pixels (PNG is lossless), so this row is a
    * full value oracle over the actual javax.imageio roundtrip. */
  val multimodalFeatures = Q("multimodal_features",
    s"""WITH dims AS ($sqlDims),
        px AS (
          SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM dims),
        ch AS (
          SELECT doc_id, w, h,
                 (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 AS r,
                 (doc_id * 17 + (i % w) * 5 + (i // w) * 3) % 256 AS g,
                 (doc_id * 11 + (i % w) * 3 + (i // w) * 29) % 256 AS b
          FROM px)
        SELECT doc_id, 'png' AS format,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               round(avg(r), 4) AS mean_r,
               round(avg(g), 4) AS mean_g,
               round(avg(b), 4) AS mean_b
        FROM ch GROUP BY doc_id, w, h ORDER BY doc_id""") { (s, d) =>
    extractFeatures(s, pngPayloads(s, d)).toDF().orderBy("doc_id")
  }

  /** JPEG-payload table: the same closed-form rasters through the in-JDK
    * JPEG writer (lossy, default quality) — the format a real image corpus
    * is mostly made of. */
  def jpegPayloads(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // documentsWide: fan the per-row JPEG encode across cores (see
    // pngPayloads note)
    Tables.documentsWide(spark, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bos = new ByteArrayOutputStream()
          ImageIO.write(renderImage(id), "jpg", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Lossy decode can't be replayed closed-form, so the JPEG gate splits:
    * format sniff + decoded DIMENSIONS are exact (JPEG preserves geometry
    * losslessly — a truncated or byte-shifted read fails them), and each
    * channel MEAN must sit within [[JpegMeanTol]] of the closed-form truth.
    * Tolerance from measurement, not guesswork: worst mean drift over all
    * 5000 docs of this noise-like corpus (JPEG's worst case) is 6.58 on
    * THIS JDK's com.sun.imageio JPEG codec (Temurin 17); a different
    * imageio plugin could quantize differently, so the gate carries 2x
    * headroom over the measured worst — still ~4x below the ~64 drift of
    * a wholesale misread, so it separates codec noise from real bugs. */
  private val JpegMeanTol = 13.0

  val multimodalJpeg = Q("multimodal_jpeg",
    s"""SELECT doc_id, 'jpeg' AS format,
               CAST(8 + doc_id % 9 AS INT) AS width,
               CAST(8 + (doc_id // 9) % 7 AS INT) AS height,
               true AS ok_r, true AS ok_g, true AS ok_b
        FROM documents ORDER BY doc_id""") { (s, d) =>
    import s.implicits._
    jpegPayloads(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder context per partition; per row the REAL JPEG reader
        // parses the container and the gate compares its raster's channel
        // means against the closed-form truth of the same doc
        it.map { case (id, bytes) =>
          val fmt = sniffFormat(bytes)
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val (mr, mg, mb) = channelMeans(img)
          val w = genWidth(id); val h = genHeight(id)
          var (tr, tg, tb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = pixel(id, x, y); tr += r; tg += g; tb += b
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          (id, fmt, img.getWidth, img.getHeight,
            math.abs(mr - tr / n) <= JpegMeanTol,
            math.abs(mg - tg / n) <= JpegMeanTol,
            math.abs(mb - tb / n) <= JpegMeanTol)
        }
      }
      .toDF("doc_id", "format", "width", "height", "ok_r", "ok_g", "ok_b")
      .orderBy("doc_id")
  }

  /** One sampled frame of a multi-frame media payload. */
  final case class Frame(doc_id: Long, n_frames: Int, frame_no: Int,
      width: Int, height: Int, pix_sum: Long)

  /** Frames sampled per payload (even stride over the container). */
  private val SampleK = 4

  /** Frame count for doc `d`: 3..12 — more frames than [[SampleK]] for
    * most docs, so the even-stride sampler actually skips. */
  private[graft] def genFrames(d: Long): Int = 3 + (d % 10).toInt

  /** Closed-form grayscale value of doc `d`, frame `f`, pixel (x, y). */
  private[graft] def framePixel(d: Long, f: Int, x: Int, y: Int): Int =
    ((d * 31 + f * 41 + x * 7 + y * 13) % 256).toInt

  private val GrayRamp: Array[Byte] = Array.tabulate(256)(_.toByte)

  /** Animated GIF for doc `d`: [[genFrames]] full-size grayscale frames
    * through the in-JDK GIF sequence writer. GIF is palette-indexed and
    * lossless — a 256-entry gray ramp palette carries every value
    * exactly, so decode replays the closed form bit-for-bit. */
  private[graft] def genGif(d: Long): Array[Byte] = {
    val w = genWidth(d); val h = genHeight(d); val nf = genFrames(d)
    val cm = new java.awt.image.IndexColorModel(8, 256, GrayRamp, GrayRamp, GrayRamp)
    val out = new ByteArrayOutputStream
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nf) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, framePixel(d, f, x, y))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Frame sampling over a REAL multi-frame container: the payload is an
    * animated GIF, demuxed with the in-JDK reader — `getNumImages(true)`
    * walks the stream's image descriptors, `read(i)` decodes one frame —
    * and ONE input row fans out to ≤ [[SampleK]] frame rows at even
    * stride ⌊i·n/k⌋. mapPartitions: the reader SPI is resolved once per
    * partition and the reader object reused across payloads (demuxer
    * init amortized over the partition, the 100-TB shape). */
  def sampleFrames(spark: SparkSession, payloads: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = ImageIO.getImageReadersByFormatName("gif").next()
        it.flatMap { case (id, bytes) =>
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val nf = reader.getNumImages(true)
          val k = math.min(SampleK, nf)
          val frames = (0 until k).map { i =>
            val fno = i * nf / k
            val img = reader.read(fno)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += img.getRGB(x, y) & 0xff // gray: b == g == r == index
                x += 1
              }
              y += 1
            }
            Frame(id, nf, fno, img.getWidth, img.getHeight, sum)
          }
          iis.close()
          frames
        }
      }
  }

  /** Frame-sampling entry — REAL container parsing: each doc's payload is
    * an animated GIF (in-JDK encoder), demuxed back with the in-JDK
    * reader; the oracle replays frame count, sampled indices, decoded
    * dimensions, and exact per-frame pixel sums from the closed form. A
    * demuxer that miscounted frames, sampled the wrong index, or misread
    * one pixel mismatches. */
  val multimodalFrames = Q("multimodal_frames",
    s"""WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 7 AS h,
                          3 + doc_id % 10 AS nf FROM documents),
        s AS (SELECT doc_id, w, h, nf,
                     unnest(range(0, least($SampleK, nf))) AS i FROM d),
        fr AS (SELECT doc_id, w, h, nf, i * nf // least($SampleK, nf) AS frame_no FROM s),
        px AS (SELECT doc_id, frame_no, w, h, nf, unnest(range(0, w)) AS x FROM fr),
        pxy AS (SELECT doc_id, frame_no, w, h, nf, x, unnest(range(0, h)) AS y FROM px)
        SELECT doc_id, CAST(nf AS INT) AS n_frames, CAST(frame_no AS INT) AS frame_no,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(sum((doc_id * 31 + frame_no * 41 + x * 7 + y * 13) % 256) AS BIGINT)
                 AS pix_sum
        FROM pxy GROUP BY doc_id, nf, frame_no, w, h
        ORDER BY doc_id, frame_no""") {
    (s, d) =>
      import s.implicits._
      // documentsWide: the GIF encode+demux is the heaviest per-row codec
      // path — fan it across cores (see pngPayloads note)
      val payloads = Tables.documentsWide(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, genGif(id))))
        .toDF("doc_id", "payload")
      sampleFrames(s, payloads).toDF().orderBy("doc_id", "frame_no")
  }

  private val ResizeW = 8
  private val ResizeH = 8

  /** Nearest-neighbor resample to [[ResizeW]]×[[ResizeH]] — explicit integer
    * source mapping (sx = (x*w)/W) rather than AWT Graphics2D scaling, so the
    * result is pixel-deterministic across JVMs and the oracle replays it. */
  private[graft] def resizeNearest(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(ResizeW, ResizeH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ResizeH) {
      var x = 0
      while (x < ResizeW) {
        out.setRGB(x, y,
          img.getRGB(x * img.getWidth / ResizeW, y * img.getHeight / ResizeH))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Image resize, REAL codec roundtrip ×2: PNG-decode → nearest-neighbor
    * resample → PNG-RE-encode → decode AGAIN → channel means of the final
    * raster. The emitted stats come from the second decode, so the row
    * value-checks encoder AND decoder; the oracle replays the resample's
    * integer source mapping on the closed-form pixels. */
  val multimodalResize = Q("multimodal_resize",
    s"""WITH dims AS ($sqlDims),
        px AS (
          SELECT doc_id, w, h, unnest(range(0, $ResizeW * $ResizeH)) AS i FROM dims),
        src AS (
          SELECT doc_id,
                 ((i % $ResizeW) * w) // $ResizeW AS sx,
                 ((i // $ResizeW) * h) // $ResizeH AS sy
          FROM px),
        ch AS (
          SELECT doc_id,
                 (doc_id * 31 + sx * 7 + sy * 13) % 256 AS r,
                 (doc_id * 17 + sx * 5 + sy * 3) % 256 AS g,
                 (doc_id * 11 + sx * 3 + sy * 29) % 256 AS b
          FROM src)
        SELECT doc_id, CAST($ResizeW AS INT) AS out_w, CAST($ResizeH AS INT) AS out_h,
               round(avg(r), 4) AS mean_r,
               round(avg(g), 4) AS mean_g,
               round(avg(b), 4) AS mean_b
        FROM ch GROUP BY doc_id ORDER BY doc_id""") {
    (s, d) =>
      import s.implicits._
      pngPayloads(s, d)
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // codec context per partition: decode → resample → encode → decode
          it.map { case (id, bytes) =>
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            val resized = encodePng(resizeNearest(img))
            val back = ImageIO.read(new ByteArrayInputStream(resized))
            val (mr, mg, mb) = channelMeans(back)
            (id, back.getWidth, back.getHeight, mr, mg, mb)
          }
        }
        .toDF("doc_id", "out_w", "out_h", "mean_r", "mean_g", "mean_b")
        .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(multimodalMeta, multimodalFeatures, multimodalFrames,
    multimodalResize, multimodalJpeg)
}
