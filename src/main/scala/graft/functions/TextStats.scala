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
  def simhash16(w: ArrayData): UTF8String = simhashN(w, 16)

  private val salt1 = "x1:".getBytes("UTF-8")

  /** Width-generic simhash over the word multiset of `w` — the same
    * one-md5-per-distinct-word fold as [[simhash16]] (which is exactly
    * `simhashN(w, 16)`), reading digest nibble j for bit j. One 128-bit
    * md5 carries 32 independent uniform nibbles, so widths up to 32 cost
    * the SAME hashing 16 did; widths 33-64 read nibble j-32 of a second,
    * salted digest md5("x1:" || word) — computed only when asked for.
    * Width is the text path's quality knob (see Dedup.autoBitsSimhash):
    * 16 fixed bits birthday-over-merge once the corpus outgrows ~2^8 docs
    * (the r8 report measured 8218bp of false drops at sf0.01); 64 bits is
    * the published web-scale operating point (Manku, Jain, Das Sarma,
    * WWW'07 — 64-bit simhash, Hamming ≤ 3). */
  def simhashN(w: ArrayData, bits: Int): UTF8String = {
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
    require(bits >= 1 && bits <= 64,
      s"simhash width must be in [1, 64] (two md5s' nibble budget), got $bits")
    val sums = new Array[Long](bits)
    if (nulls > 0) {
      var j = 0
      while (j < bits) { sums(j) -= nulls; j += 1 }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val wordBytes = e.getKey.getBytes
      val digest = md.digest(wordBytes) // digest() resets md
      val digest2 =
        if (bits <= 32) null
        else { md.update(salt1); md.digest(wordBytes) }
      val c = e.getValue
      var j = 0
      while (j < bits) {
        val (d, k) = if (j < 32) (digest, j) else (digest2, j - 32)
        val nib =
          if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf
          else d(k >> 1) & 0xf
        if (nib <= 7) sums(j) += c else sums(j) -= c
        j += 1
      }
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) { out(j) = if (sums(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }

  private val hexDigits = "0123456789abcdef".getBytes

  /** 8-slot MinHash signature over the 3-word shingles of `w`, md5 computed
    * ONCE per DISTINCT shingle. Exactly equal — string for string — to the
    * relational form
    * `min(substring(md5(shingle), 4k+1, 4))` over
    * `explode(transform(sequence(1, greatest(size(w) - 2, 1)),
    *   i -> concat_ws(' ', try_element_at(w, i), try_element_at(w, i+1),
    *                       try_element_at(w, i+2))))`
    * because (a) min over the shingle MULTISET equals min over the distinct
    * set, (b) each 4-hex-digit slice of the lowercase digest compares
    * lexically exactly as its 16-bit value compares numerically
    * ('0'<'9'<'a'<'f' matches nibble order), and (c) the tail windows
    * degrade identically: an out-of-range `try_element_at` is NULL and
    * `concat_ws` skips NULLs, which is precisely what the null-padded
    * `UTF8String.concatWs` call below does (an empty `w` still yields one
    * window — the empty shingle — matching `greatest(…, 1)`).
    *
    * Replaces the banding paths' explode → (distinct) → groupBy-min chain —
    * a shuffle of roughly 3× the corpus bytes whose keys never leave their
    * document — with one codegen'd scan: the dominant cost of every
    * MinHash-banding query becomes the md5 pass itself. */
  def minhash8(w: ArrayData): GenericInternalRow = {
    val n = w.numElements()
    val nWindows = math.max(n - 2, 1)
    val seen = new java.util.HashSet[UTF8String]()
    val mins = new Array[Int](8)
    java.util.Arrays.fill(mins, Int.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nWindows) {
      val a = if (i < n) w.getUTF8String(i) else null
      val b = if (i + 1 < n) w.getUTF8String(i + 1) else null
      val c = if (i + 2 < n) w.getUTF8String(i + 2) else null
      val g = UTF8String.concatWs(space, a, b, c) // skips nulls, like concat_ws
      if (seen.add(g)) {
        val digest = md.digest(g.getBytes) // digest() resets md
        var k = 0
        while (k < 8) {
          val v = ((digest(2 * k) & 0xff) << 8) | (digest(2 * k + 1) & 0xff)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](8)
    var k = 0
    while (k < 8) {
      val v = mins(k)
      val hex = new Array[Byte](4)
      hex(0) = hexDigits((v >> 12) & 0xf)
      hex(1) = hexDigits((v >> 8) & 0xf)
      hex(2) = hexDigits((v >> 4) & 0xf)
      hex(3) = hexDigits(v & 0xf)
      out(k) = UTF8String.fromBytes(hex)
      k += 1
    }
    new GenericInternalRow(out)
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

/** `graft_simhash(words, bits)` — width-parameterized simhash signature
  * ('0'/'1' string of length `bits`, bits ≤ 64). `bits` must be a foldable
  * integer (the width is a plan-time knob derived from a corpus count, not
  * per-row data), enforced at construction so a non-literal width fails
  * analysis, not execution. */
case class GraftSimhashN(child: Expression, bits: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName width must be in [1, 64], got $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(w: Any): Any =
    TextStatKernels.simhashN(w.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatKernels.simhashN($c, $bits)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_minhash8(words)` →
  * struct(s0 .. s7 STRING) — the 8-slot MinHash signature. */
case class GraftMinhash8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(
    (0 to 7).map(k => StructField(s"s$k", StringType, nullable = false)))
  override def prettyName: String = "graft_minhash8"
  override def nullSafeEval(w: Any): Any =
    TextStatKernels.minhash8(w.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatKernels.minhash8($c)")
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
    r.createOrReplaceTempFunction(
      "graft_simhash", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"graft_simhash(words, bits) takes exactly 2 arguments, " +
              s"got ${exprs.length}")
        val bits = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_simhash(words, bits) needs a literal INT width, got $other")
        }
        GraftSimhashN(exprs.head, bits)
      }, "built-in")
    r.createOrReplaceTempFunction(
      "graft_minhash8", exprs => GraftMinhash8(exprs.head), "built-in")
  }
}
