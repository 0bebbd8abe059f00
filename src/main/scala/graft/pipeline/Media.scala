package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Batch decode/feature-extract plumbing for multimodal binary columns
  * (builder-prompt mandate).
  *
  * The Scala analog of `mapInPandas`: a typed Dataset processed with
  * `mapPartitions`, so a decoder that benefits from batch setup (model
  * weights, codec contexts) initializes once per partition and streams
  * through the iterator — the same batch shape a Pandas-UDF pipeline has,
  * without per-row overhead. The decoder itself is a pluggable seam: real
  * image/audio codecs are NOT available in this container, so the shipped
  * implementation is a clearly-marked deterministic fake; the schema,
  * partitioning, signature, and batch mechanics are real and tested.
  */
object Media {

  /** Opaque payload + typed metadata: the storage shape for media at rest. */
  final case class MediaRow(docId: Long, mime: String, payload: Array[Byte])

  final case class MediaFeatures(
      docId: Long,
      mime: String,
      nBytes: Int,
      digest: String,
      width: Int,
      height: Int,
      frameOffsets: Seq[Int])

  /** The decode seam. A real implementation wraps an image/audio codec;
    * `FakeDecoder` stands in deterministically. */
  trait Decoder extends Serializable {
    /** Returns (width, height) of the decoded media. */
    def decodeDims(payload: Array[Byte]): (Int, Int)
    /** Frame-sample offsets for time-coded media (video/audio). */
    def sampleOffsets(payload: Array[Byte], maxFrames: Int): Seq[Int]
    /** Re-encoded payload at target dimensions. */
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** STUB: a real decoder would parse the container header here
    * (`ImageIO.read` / ffmpeg / soundfile). Deterministic byte-derived
    * dimensions keep the pipeline testable offline. */
  object FakeDecoder extends Decoder {
    override def decodeDims(payload: Array[Byte]): (Int, Int) =
      (payload.length * 7 % 1024, payload.length * 13 % 768)
    override def sampleOffsets(payload: Array[Byte], maxFrames: Int): Seq[Int] =
      (0 to math.min(payload.length / 100, maxFrames - 1)).map(_ * 100)
    /** Deterministic stand-in for a re-encode: output size scales with the
      * target pixel count, content is a truncation/cycle of the input. */
    override def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val outLen = math.max(16, width * height / 64)
      Array.tabulate(outLen)(i => payload(i % math.max(payload.length, 1)))
    }
  }

  final case class ResizedMedia(
      docId: Long, mime: String, width: Int, height: Int, payload: Array[Byte])

  /** Partition-batched extraction: decoder init happens once per partition
    * (the expensive part of real codecs), rows stream through. */
  def extractFeatures(rows: Dataset[MediaRow], decoder: Decoder,
      maxFrames: Int = 5): Dataset[MediaFeatures] = {
    rows.mapPartitions { it =>
      // per-partition setup (a real decoder opens its codec context here)
      val md = MessageDigest.getInstance("MD5")
      it.map { r =>
        val (w, h) = decoder.decodeDims(r.payload)
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.docId, r.mime, r.payload.length, digest, w, h,
          decoder.sampleOffsets(r.payload, maxFrames))
      }
    }(org.apache.spark.sql.Encoders.product[MediaFeatures])
  }

  /** Partition-batched resize: the write-side transform of a media
    * pipeline (thumbnailing, normalization before feature extraction).
    * Same batch mechanics as extractFeatures — codec context once per
    * partition, rows streamed. */
  def resizeTo(rows: Dataset[MediaRow], decoder: Decoder,
      width: Int, height: Int): Dataset[ResizedMedia] = {
    rows.mapPartitions { it =>
      // per-partition setup slot (a real encoder allocates buffers here)
      it.map { r =>
        ResizedMedia(r.docId, r.mime, width, height,
          decoder.resize(r.payload, width, height))
      }
    }(org.apache.spark.sql.Encoders.product[ResizedMedia])
  }

  /** Text table → media rows (UTF-8 payloads) for offline testing. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] =
    graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id AS docId", "'text/plain' AS mime",
        "encode(text, 'utf-8') AS payload")
      .as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
}
