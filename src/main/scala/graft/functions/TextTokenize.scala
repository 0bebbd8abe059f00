package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass byte-scan tokenization kernels.
  *
  * Why these exist (measured, scale-rehearsal finding): the BPE-ish
  * tokenizer `filter(split(text, '[^a-zA-Z0-9]+'), x -> length(x) > 0)`
  * routes through `java.util.regex`, which on the 10× rehearsal corpus
  * (22.5 MB of text) took ~1.9 s single-threaded and — pathologically —
  * got SLOWER under 32 concurrent executor threads (~4 s wall, ~128 s
  * summed task time), while an equivalent single-pass char-class scan ran
  * the same corpus in 0.06 s and scaled linearly with threads. A ~30×
  * single-thread gap and an anti-scaling multiplier is exactly what a
  * 100 TB text pipeline cannot carry in its hottest per-row loop, so the
  * tokenize sites get a tight byte loop instead of a regex engine.
  *
  * Semantics contract (oracle parity): ASCII class tests are applied per
  * BYTE. Every byte of a multi-byte UTF-8 character is ≥ 0x80, so it can
  * never test as `[A-Za-z0-9]` — token boundaries land exactly where the
  * per-CHARACTER regex `[^a-zA-Z0-9]+` puts them, tokens themselves are
  * pure-ASCII runs, and results are byte-identical to the regex
  * formulation (and to DuckDB's `str_split_regex` in the oracle SQL).
  */
object TextKernels {
  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** Maximal `[A-Za-z0-9]+` runs of `s`, in order — equal to the non-empty
    * pieces of a `[^a-zA-Z0-9]+` regex split. Called from both the
    * interpreted and generated code paths. */
  def tokensAlnum(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !isAlnum(bytes(i))) i += 1
      val start = i
      while (i < n && isAlnum(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
    }
    new GenericArrayData(out.toArray)
  }

  /** Count of maximal `[A-Za-z0-9]+` runs — `size(tokensAlnum(s))` without
    * materializing the array (the size-only call sites sum this per row). */
  def tokenCountAlnum(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var c = 0
    val n = bytes.length
    while (i < n) {
      if (isAlnum(bytes(i)) && (i == 0 || !isAlnum(bytes(i - 1)))) c += 1
      i += 1
    }
    c
  }

  /** Count of `[A-Za-z]` characters — equal to
    * `length(regexp_replace(s, '[^a-zA-Z]', ''))` (the surviving chars are
    * ASCII, so byte count = char count). */
  def alphaCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var c = 0
    val n = bytes.length
    while (i < n) {
      if (isAlpha(bytes(i))) c += 1
      i += 1
    }
    c
  }
}

private[functions] trait TextScanExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")

  /** Fully-qualified static kernel call with one UTF8String parameter —
    * shared by the interpreted and codegen paths so there is exactly one
    * implementation of the scan. */
  def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.$kernel($c)")
}

/** `graft_tokens(text)` — array of maximal alphanumeric runs. */
case class GraftTokens(child: Expression) extends TextScanExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override def kernel: String = "tokensAlnum"
  override def nullSafeEval(s: Any): Any =
    TextKernels.tokensAlnum(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_token_count(text)` — count of maximal alphanumeric runs. */
case class GraftTokenCount(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"
  override def kernel: String = "tokenCountAlnum"
  override def nullSafeEval(s: Any): Any =
    TextKernels.tokenCountAlnum(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_alpha_count(text)` — count of ASCII alphabetic characters. */
case class GraftAlphaCount(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_alpha_count"
  override def kernel: String = "alphaCount"
  override def nullSafeEval(s: Any): Any =
    TextKernels.alphaCount(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextTokenize {
  /** Register the three kernels on the session (idempotent), same contract
    * as [[FloatDotProduct.register]]. */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(
      "graft_tokens", exprs => GraftTokens(exprs.head), "built-in")
    r.createOrReplaceTempFunction(
      "graft_token_count", exprs => GraftTokenCount(exprs.head), "built-in")
    r.createOrReplaceTempFunction(
      "graft_alpha_count", exprs => GraftAlphaCount(exprs.head), "built-in")
  }
}
