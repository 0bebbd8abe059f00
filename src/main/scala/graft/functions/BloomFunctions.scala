package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

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

  /** Register a one-off probe function bound to a BROADCAST bloom filter
    * (idempotent per name). Unlike the literal form, the filter bytes never
    * enter the plan: the expression serializes as a broadcast HANDLE, the
    * bytes ship once per executor via broadcast machinery, and the plan
    * stays flat no matter how large the eval set is — a 10⁹-shingle bloom
    * at fpp=0.01 is ~1 GB, which as a `lit()` would ride in every task
    * binary. Use a per-run unique name so concurrent pipelines in one
    * session don't clobber each other's binding. */
  def registerBroadcast(spark: SparkSession, name: String,
      bloomBytes: Broadcast[Array[Byte]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => MightContainBroadcast(bloomBytes, exprs(0)), "built-in")
}

/** Executor-side cache of deserialized bloom filters, keyed by broadcast
  * id: `BloomFilter.readFrom` copies the whole bitset, so deserializing per
  * task would turn a large filter into a per-task allocation storm. One
  * decode per executor per broadcast; bounded so long-lived executors
  * running many decontamination passes don't accumulate dead bitsets. */
object BloomBroadcast {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[Long, BloomFilter]

  def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter = {
    if (cache.size > 16) cache.clear()
    cache.getOrElseUpdate(bc.id,
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bc.value)))
  }
}

/** `might_contain` over a BROADCAST serialized bloom filter — the
  * scale-correct sibling of the registered `might_contain_l` literal form.
  * Codegen keeps the probe row-local and inside whole-stage codegen; the
  * generated code lazily resolves the filter once per task from the
  * executor-wide [[BloomBroadcast]] cache. */
case class MightContainBroadcast(bloom: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"might_contain_bc requires a BIGINT probe, got ${child.dataType.simpleString}")

  override def prettyName: String = "might_contain_bc"

  @transient private lazy val bf = BloomBroadcast.filterFor(bloom)

  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val bfVar = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloomFilter")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($bfVar == null) {
         |  $bfVar = graft.functions.BloomBroadcast.filterFor($bcRef);
         |}
         |${ev.value} = $bfVar.mightContainLong($c);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
