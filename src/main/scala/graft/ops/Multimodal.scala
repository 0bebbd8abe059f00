package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Multimodal-column plumbing (builder-prompt mandate): treat media as
  * opaque `binary` payloads with typed, deterministic metadata extraction.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (md5/length-derived "features") — the
  * Spark-side plumbing is real: text → binary payload column, byte-level
  * metadata, frame-sample offset generation, all row-local codegen'd
  * expressions. The batch-decode path (the `mapInPandas` analog for Scala:
  * Dataset.mapPartitions with a pluggable decoder) lives in
  * graft.pipeline.Media with its own unit tests.
  */
object Multimodal {

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
          col("text"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          substring(lower(hex(col("payload"))), 1, 16).as("header_hex"),
          // FAKE-DECODE: width/height/frame-count derived from byte length,
          // stand-ins for a real codec (not available in this container).
          pmod(octet_length(col("payload")) * 7, lit(1024)).as("fake_width"),
          pmod(octet_length(col("payload")) * 13, lit(768)).as("fake_height"),
          (octet_length(col("payload")).cast("int") / 100 + 1).cast("int")
            .as("n_frames"),
          md5(col("text")).as("content_digest"),
          expr("array_join(transform(sequence(0, least(octet_length(payload) DIV 100, 4)), " +
            "i -> CAST(i * 100 AS STRING)), ',')").as("sample_offsets"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, " +
        "substr(lower(hex(encode(text))), 1, 16) AS header_hex, " +
        "CAST(octet_length(encode(text)) * 7 % 1024 AS INTEGER) AS fake_width, " +
        "CAST(octet_length(encode(text)) * 13 % 768 AS INTEGER) AS fake_height, " +
        "CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames, " +
        "md5(text) AS content_digest, " +
        "array_to_string(list_transform(generate_series(0, least(octet_length(encode(text)) // 100, 4)), " +
        "i -> CAST(i * 100 AS VARCHAR)), ',') AS sample_offsets " +
        "FROM documents ORDER BY doc_id")
  )
}
