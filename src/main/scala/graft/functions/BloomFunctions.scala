package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Bloom-filter membership as a query-side primitive.
  *
  * Spark uses `BloomFilterMightContain` internally for injected runtime
  * filters but does not expose it in the SQL surface; registering it as
  * `might_contain_l(bloom_bytes, long_value)` turns a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (built driver-side over a
  * SMALL set — e.g. a benchmark's shingle hashes) into a row-local,
  * codegen'd membership predicate over an arbitrarily large corpus.
  *
  * Why this matters at 100 TB: a broadcast semi-join against the eval set
  * costs a hash-table probe per row plus the broadcast of the full set; a
  * bloom prefilter is a few bit-probes per row against KB–MB of shipped
  * bitset, never false-negative, and the (bounded-rate) false positives
  * are removed by an exact join over the tiny surviving fraction. This is
  * the standard sketch-prefilter shape for membership tests whose exact
  * set would be too big to broadcast.
  *
  * Hash contract: the value side must be the SAME 64-bit hash that was
  * inserted — build the filter over `xxhash64(key)` and probe with
  * `might_contain_l(bloom, xxhash64(key))`; `BloomFilter.putLong` /
  * `mightContainLong` then agree bit-for-bit.
  */
object BloomFunctions {
  /** Register `might_contain_l(bloom_binary, value_long)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain_l",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")

  /** Serialize a driver-built bloom filter for use as a literal argument
    * to `might_contain_l`. */
  def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
