package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-pipeline operator): treat
  * opaque binary payloads as first-class columns and run an imperative
  * per-partition "decoder" over them.
  *
  * The corpus has no image/audio tables, so the binary column is the
  * UTF-8 encoding of `text` and the decode step is a deterministic
  * stand-in (byte length, content hash, leading bytes — the places a
  * real pipeline extracts dimensions/duration/frames). Everything
  * around the stub is the real pattern: a BinaryType column, a typed
  * Dataset, and mapPartitions so a real decoder would amortize its
  * per-batch init (model load, codec context) across each partition's
  * iterator and hold only one record's media in memory at a time —
  * the shape that survives 100 TB of binaries.
  */
object Multimodal {

  /** The binary-payload table as a typed Dataset — shared entry point
    * of all three decoders. */
  private def binaryDocs(spark: SparkSession,
      sf: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))

  private def hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Extracted "features" of one binary payload. */
  final case class MmFeature(doc_id: Long, byte_len: Long,
      content_hash: String, b0: Int, b1: Int, b2: Int, b3: Int)

  def decodeStub(spark: SparkSession, sf: String): DataFrame = {
    val feats = binaryDocs(spark, sf).mapPartitions { it =>
      // Per-partition init would go here (codec/model handles).
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        def b(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else -1
        MmFeature(id, bytes.length.toLong, hex(md, bytes), b(0), b(1), b(2), b(3))
      }
    }(Encoders.product[MmFeature])
    feats.toDF().orderBy("doc_id")
  }

  /** One sampled "frame" of a binary payload. */
  final case class MmFrame(doc_id: Long, frame_idx: Long, frame_len: Long,
      frame_hash: String)

  /** Frame-sampling plumbing: treat the payload as fixed-size frames
    * (64 bytes), keep every 4th, emit per-frame metadata + content
    * hash. The row-expanding mapPartitions is the real shape for video
    * frame extraction — per-partition codec init, one frame in memory
    * at a time, sampled stride to bound output volume at scale. */
  def frameSample(spark: SparkSession, sf: String): DataFrame = {
    val frameBytes = 64
    val stride = 4
    val frames = binaryDocs(spark, sf).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).filter(_ % stride == 0).map { fi =>
          val start = fi * frameBytes
          val len = math.min(frameBytes, bytes.length - start)
          val h = hex(md, java.util.Arrays.copyOfRange(bytes, start, start + len))
          MmFrame(id, fi.toLong, len.toLong, h)
        }
      }
    }(Encoders.product[MmFrame])
    frames.toDF().orderBy("doc_id", "frame_idx")
  }

  /** A "resized" binary payload's metadata. */
  final case class MmResized(doc_id: Long, orig_len: Long, resized_len: Long,
      resized_hash: String)

  /** Resize plumbing: downsample the payload by keeping every 2nd byte
    * (the 1-D stand-in for image downscaling — a real pipeline calls
    * the codec's resampler here), emitting the resized length and
    * content hash. Same per-partition scalar-map shape as the decoder:
    * one payload in memory at a time. */
  def resizeStub(spark: SparkSession, sf: String): DataFrame = {
    val out = binaryDocs(spark, sf).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        val resized = Array.tabulate((bytes.length + 1) / 2)(i => bytes(i * 2))
        MmResized(id, bytes.length.toLong, resized.length.toLong, hex(md, resized))
      }
    }(Encoders.product[MmResized])
    out.toDF().orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> decodeStub,
    "mm_frame_sample" -> frameSample,
    "mm_resize_stub" -> resizeStub
  )

  val oracle: Map[String, String] = Map(
    // ASCII corpus: byte k of the UTF-8 payload == ascii of char k+1.
    "mm_decode_stub" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, md5(text) AS content_hash, " +
        "CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS b0, CAST(ascii(substring(text, 2, 1)) AS INTEGER) AS b1, " +
        "CAST(ascii(substring(text, 3, 1)) AS INTEGER) AS b2, CAST(ascii(substring(text, 4, 1)) AS INTEGER) AS b3 " +
        "FROM documents ORDER BY doc_id"),
    // ASCII corpus: frame byte-slices == character substrings.
    "mm_frame_sample" ->
      ("SELECT doc_id, i AS frame_idx, CAST(LEAST(64, length(text) - i * 64) AS BIGINT) AS frame_len, " +
        "md5(substring(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_hash " +
        "FROM (SELECT doc_id, text, unnest(range(CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i FROM documents) t " +
        "WHERE i % 4 = 0 ORDER BY doc_id, frame_idx"),
    // Every-2nd-byte downsample ≡ collapsing char pairs to their first
    // char (ASCII corpus); an odd trailing char survives both ways.
    "mm_resize_stub" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS orig_len, " +
        "CAST(length(regexp_replace(text, '(.).', '\\1', 'g')) AS BIGINT) AS resized_len, " +
        "md5(regexp_replace(text, '(.).', '\\1', 'g')) AS resized_hash " +
        "FROM documents ORDER BY doc_id")
  )
}
