package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: the payload is a binary
  * column (or a `file::` pointer — reference: types/src/value/file.rs), the
  * pipeline extracts metadata/features per batch, and decode runs inside
  * `mapPartitions` so one task amortizes codec setup over its whole
  * partition. The decode itself is STUBBED here (no image/audio libs in this
  * container — see [[decodeStub]]); everything around it — schema, encoder,
  * partition shape, deterministic feature output — is real and tested.
  *
  * The testdata has no binary tables, so document text bytes stand in as the
  * opaque payload. */
object Multimodal {

  /** Typed record for the feature-extraction output. */
  final case class MediaFeature(
      doc_id: Long, n_bytes: Long, format: String, feature: Array[Double])

  /** STUB decoder — stands in for an image/audio codec. Deterministic fake:
    * "format" from a magic-byte sniff, "feature" from byte statistics. A real
    * deployment replaces only this function (same signature: bytes in,
    * features out); the Spark plumbing around it is unchanged. */
  def decodeStub(bytes: Array[Byte]): (String, Array[Double]) = {
    val format =
      if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else "raw"
    // fake 4-dim feature: byte count, mean byte, min, max — deterministic
    val n = bytes.length.toDouble
    val mean = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xFF).toDouble).sum / n
    val mn = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xFF).toDouble).min
    val mx = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xFF).toDouble).max
    (format, Array(n, mean, mn, mx))
  }

  /** Batch feature extraction over a binary column: mapPartitions so a real
    * decoder initializes once per partition, not once per row. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // (real impl: initialize codec here, once per partition)
        it.map { case (id, bytes) =>
          val (fmt, feat) = decodeStub(bytes)
          MediaFeature(id, bytes.length.toLong, fmt, feat)
        }
      }
  }

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

  /** Feature-extraction pipeline through the mapPartitions stub decoder.
    * The stub is deterministic byte math (count/mean/min/max), and the
    * documents corpus is pure ASCII (bytes == code points), so DuckDB can
    * replay the whole pipeline exactly: the row became a full value oracle
    * on the decode plumbing instead of a rows-only entry. */
  val multimodalFeatures = Q("multimodal_features",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              'raw' AS format,
              round(COALESCE(list_avg(list_transform(
                range(1, length(text) + 1), i -> ascii(text[i]))), 0.0), 4)
                AS mean_byte
       FROM documents ORDER BY doc_id""") { (s, d) =>
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    extractFeatures(s, payloads)
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("format"),
        round(element_at(col("feature"), 2), 4).as("mean_byte"))
      .orderBy("doc_id")
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_no: Int, frame_digest: String,
      frame_bytes: Long)

  private val NumFrames = 8
  private val FrameBytes = 16

  /** Frame sampling over a video-like payload: ONE input row fans out to ≤
    * [[NumFrames]] output rows (the demuxer batch shape), evenly strided
    * through the payload. mapPartitions so a real demuxer initializes once
    * per partition; the stand-in "frame" is a byte slice, deterministic so
    * the oracle can replay it. */
  def sampleFrames(spark: SparkSession, payloads: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // (real impl: initialize the demuxer here, once per partition)
        it.flatMap { case (id, bytes) =>
          val stride = math.max(1, bytes.length / NumFrames)
          (0 until NumFrames).iterator
            .takeWhile(i => i * stride < bytes.length)
            .map { i =>
              val slice = bytes.slice(i * stride,
                math.min(i * stride + FrameBytes, bytes.length))
              Frame(id, i, md5hex(slice), slice.length.toLong)
            }
        }
      }
  }

  private val ResizeTarget = 64

  /** Resize-to-fixed-size stub: cycle the payload to exactly
    * [[ResizeTarget]] bytes — stands in for an image resample with the same
    * plumbing (binary in, binary out, per-partition codec init). */
  def resizeStub(bytes: Array[Byte]): Array[Byte] =
    if (bytes.isEmpty) Array.fill(ResizeTarget)(0.toByte)
    else Array.tabulate(ResizeTarget)(i => bytes(i % bytes.length))

  /** Frame-sampling entry — oracle-checked: the deterministic slicing
    * replays in SQL (ASCII corpus: byte offsets == char offsets). */
  val multimodalFrames = Q("multimodal_frames",
    s"""WITH f AS (
          SELECT doc_id, text, unnest(range(0, $NumFrames)) AS frame_no,
                 greatest(1, length(text) // $NumFrames) AS stride
          FROM documents)
        SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
               md5(substring(text, frame_no * stride + 1, $FrameBytes)) AS frame_digest,
               CAST(least($FrameBytes, length(text) - frame_no * stride) AS BIGINT)
                 AS frame_bytes
        FROM f WHERE frame_no * stride < length(text)
        ORDER BY doc_id, frame_no""") {
    (s, d) =>
      val payloads = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      sampleFrames(s, payloads).toDF().orderBy("doc_id", "frame_no")
  }

  /** Resize entry — oracle-checked via the cycled-byte replay. */
  val multimodalResize = Q("multimodal_resize",
    s"""SELECT doc_id,
               CAST($ResizeTarget AS BIGINT) AS n_out,
               md5(substring(repeat(text, CAST(ceil($ResizeTarget.0 / length(text)) AS INT)),
                             1, $ResizeTarget)) AS out_digest
        FROM documents ORDER BY doc_id""") {
    (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // (real impl: image codec init once per partition)
          it.map { case (id, bytes) =>
            val out = resizeStub(bytes)
            (id, out.length.toLong, md5hex(out))
          }
        }
        .toDF("doc_id", "n_out", "out_digest")
        .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(multimodalMeta, multimodalFeatures, multimodalFrames,
    multimodalResize)
}
