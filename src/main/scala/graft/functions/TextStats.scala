package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local kernels for per-document n-gram statistics.
  *
  * Scale rationale: character-trigram entropy and top-bigram share are
  * PER-DOCUMENT statistics, but their straightforward relational forms
  * (explode each gram → groupBy (doc_id, gram) → per-doc rollup) shuffle
  * one row per gram — roughly 3× the corpus bytes for trigrams, ~1× for
  * word bigrams. At 100 TB that is a multi-hundred-TB shuffle whose keys
  * never leave their document. These kernels fold the gram multiset inside
  * the row instead (one HashMap bounded by the document's length), so the
  * whole query becomes a scan: zero shuffles, full codegen, nothing wide.
  *
  * Parity contract: gram construction mirrors the relational formulation
  * exactly — trigrams are 3-CODE-POINT windows (UTF8String character
  * semantics, same as `substring(text, i, 3)`), bigrams join adjacent
  * words with a single space exactly as `concat_ws(' ', w[i], w[i+1])`
  * does INCLUDING its null-skipping edge cases at the array tail. The
  * Σ c·ln c fold sums in hash-iteration order; consumers round to 4dp,
  * which absorbs double-summation-order ulps exactly as the aggregate
  * formulation already must across engines (the DuckDB oracle is
  * unchanged and still computes the relational form).
  */
object TextStatKernels {
  /** (n_grams, n_uniq_grams, Σ c·ln c) over all 3-code-point windows of
    * `s` — `greatest(len - 2, 1)` windows, same as the explode range, so
    * texts shorter than 3 chars contribute their single truncated gram. */
  def trigramStats(s: UTF8String): GenericInternalRow = {
    val nChars = s.numChars()
    val nWindows = math.max(nChars - 2, 1)
    val counts = new java.util.HashMap[UTF8String, Long]()
    var i = 0
    while (i < nWindows) {
      // substringSQL is 1-based and clamps the window at the tail,
      // matching substring(text, i, 3) for the short-text edge
      val g = s.substringSQL(i + 1, 3)
      counts.merge(g, 1L, (a, b) => a + b)
      i += 1
    }
    var clc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      clc += c * math.log(c)
    }
    new GenericInternalRow(Array[Any](nWindows.toLong, counts.size.toLong, clc))
  }

  private val space = UTF8String.fromString(" ")

  /** Max multiplicity over the adjacent-word "bigrams" of `w`, built as
    * `concat_ws(' ', w[i], w[i+1])` for i in 1..greatest(len(w)-1, 1):
    * the final window (and both windows of short arrays) degrades exactly
    * as concat_ws does when an index runs off the end — w[len] alone for
    * the last i of a 1-element array, the empty string for an empty one. */
  def topBigramCount(w: ArrayData): Long = {
    val n = w.numElements()
    val nWindows = math.max(n - 1, 1)
    val counts = new java.util.HashMap[UTF8String, Long]()
    var max = 0L
    var i = 0
    while (i < nWindows) {
      val g =
        if (i + 1 < n)
          UTF8String.concatWs(space, w.getUTF8String(i), w.getUTF8String(i + 1))
        else if (i < n) {
          val e = w.getUTF8String(i)
          if (e == null) UTF8String.EMPTY_UTF8 else e // concat_ws skips nulls
        } else UTF8String.EMPTY_UTF8
      val c = counts.merge(g, 1L, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max
  }

  /** 16-bit simhash over the word multiset of `w`, md5 computed ONCE per
    * DISTINCT word (Zipf: distinct ≪ occurrences) with each digest nibble
    * j contributing sign ±multiplicity to bit j. Exactly equal — integer
    * sums — to the relational form
    * `aggregate(transform(w, x -> md5(x)), 0, (acc, h) ->
    *   acc + IF(substr(h, j+1, 1) <= '7', 1, -1))` per bit j, because hex
    * digit ≤ '7' ⟺ nibble value ≤ 7, and summing ±1 per occurrence equals
    * summing ±count per distinct word. Returns the 16-char '0'/'1'
    * signature (bit j = '1' iff the sum is > 0), matching
    * `concat(IF(b_j > 0, '1', '0') ...)`. A null element contributes −1 to
    * every bit (IF(null ≤ '7', 1, -1) = -1), though the split+filter call
    * sites can't produce one. Replaces 16 interpreted higher-order folds
    * (plus an md5 and a substr allocation per occurrence) with one
    * codegen'd pass — the simhash signature stage is the dominant cost of
    * the dedup_simhash family. */
  def simhash16(w: ArrayData): UTF8String = {
    val n = w.numElements()
    val counts = new java.util.HashMap[UTF8String, Long]()
    var nulls = 0L
    var i = 0
    while (i < n) {
      val s = w.getUTF8String(i)
      if (s == null) nulls += 1
      else counts.merge(s, 1L, (a, b) => a + b)
      i += 1
    }
    val bits = new Array[Long](16)
    if (nulls > 0) {
      var j = 0
      while (j < 16) { bits(j) -= nulls; j += 1 }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val digest = md.digest(e.getKey.getBytes) // digest() resets md
      val c = e.getValue
      var j = 0
      while (j < 16) {
        val nib =
          if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xf
          else digest(j >> 1) & 0xf
        if (nib <= 7) bits(j) += c else bits(j) -= c
        j += 1
      }
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) { out(j) = if (bits(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }
}

/** `graft_trigram_stats(text)` →
  * struct(n_grams BIGINT, n_uniq_grams BIGINT, clc DOUBLE). */
case class GraftTrigramStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_uniq_grams", LongType, nullable = false),
    StructField("clc", DoubleType, nullable = false)))
  override def prettyName: String = "graft_trigram_stats"
  override def nullSafeEval(s: Any): Any =
    TextStatKernels.trigramStats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatKernels.trigramStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_top_bigram_count(words)` — max adjacent-pair multiplicity. */
case class GraftTopBigramCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_bigram_count"
  override def nullSafeEval(w: Any): Any =
    TextStatKernels.topBigramCount(w.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatKernels.topBigramCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_simhash16(words)` — 16-char '0'/'1' simhash signature. */
case class GraftSimhash16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash16"
  override def nullSafeEval(w: Any): Any =
    TextStatKernels.simhash16(w.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatKernels.simhash16($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextStats {
  /** Register the kernels on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(
      "graft_trigram_stats", exprs => GraftTrigramStats(exprs.head), "built-in")
    r.createOrReplaceTempFunction(
      "graft_top_bigram_count", exprs => GraftTopBigramCount(exprs.head), "built-in")
    r.createOrReplaceTempFunction(
      "graft_simhash16", exprs => GraftSimhash16(exprs.head), "built-in")
  }
}
