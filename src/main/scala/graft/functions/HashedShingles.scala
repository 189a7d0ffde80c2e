package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-hash expressions for the dedup/containment hot path.
  *
  * The Column composition they replace —
  * `array_sort(array_distinct(transform(charNgrams(text, n), h)))` — walks
  * FOUR interpreted higher-order/collection expressions per document and
  * materializes the full substring array (one UTF8String per gram, tens of
  * millions per corpus pass) just to hash and discard it. Measured on the
  * sf0.1 documents corpus (MeasurePrefixStages): materializing the 8-gram
  * array alone costs 2.4 s, the hash transforms another ~1 s; this single
  * pass computes the identical `array<long>` with no per-gram allocation.
  *
  * Semantics are BIT-IDENTICAL by construction to the composed form,
  * including order (distinct keeps first occurrence, exactly like
  * `array_distinct`), the `length(text) <= n → [text]` whole-text gram of
  * [[GraftFunctions.charNgrams]], and the `size(toks) <= k → [join(toks)]`
  * whole-doc shingle of [[GraftFunctions.wordShinglesFromTokens]] —
  * property-pinned against the composed expressions in HashedShinglesSpec.
  * Both hash kinds reproduce existing oracle-visible values:
  *
  *  - `Xx64`: `xxhash64(seed, gram)` over the gram's UTF8 bytes — the
  *    verification-space hash (seeds 17/31/11);
  *  - `Md5Prefix60`: `conv(substring(md5(gram), 1, 15), 16, 10)` — the
  *    engine-portable 60-bit token id ([[GraftFunctions.portableHash60]]),
  *    computed directly as the top 60 bits of the digest.
  *
  * Interpreted-eval expressions (CodegenFallback), like the HOF chain they
  * replace — the win is the fused single pass, not codegen.
  */
object HashedShingles {
  val KindXx64 = 0
  val KindMd5Prefix60 = 1

  private[functions] val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 over `bytes[off, off+len)` — equals
    * `conv(substring(md5(s), 1, 15), 16, 10)` (15 hex chars = 60 bits). */
  private[functions] def md5Prefix60(md: MessageDigest, out16: Array[Byte],
      bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    md.digest(out16, 0, 16)
    (((out16(0) & 0xffL) << 56) | ((out16(1) & 0xffL) << 48) |
      ((out16(2) & 0xffL) << 40) | ((out16(3) & 0xffL) << 32) |
      ((out16(4) & 0xffL) << 24) | ((out16(5) & 0xffL) << 16) |
      ((out16(6) & 0xffL) << 8) | (out16(7) & 0xffL)) >>> 4
  }

  /** Column API mirroring
    * `maybeSort(maybeDistinct(transform(charNgrams(lower? text, n), h)))`. */
  def hashedCharNgrams(text: Column, n: Int, kind: Int, seed: Long,
      distinct: Boolean, sorted: Boolean): Column =
    ExpressionUtils.column(HashedCharNgrams(
      ExpressionUtils.expression(text), n, kind, seed, distinct, sorted))

  /** Column API mirroring
    * `maybeSort(maybeDistinct(transform(wordShinglesFromTokens(toks, k), h)))`. */
  def hashedWordShingles(toks: Column, k: Int, kind: Int, seed: Long,
      distinct: Boolean, sorted: Boolean): Column =
    ExpressionUtils.column(HashedWordShingles(
      ExpressionUtils.expression(toks), k, kind, seed, distinct, sorted))

  /** Insertion-ordered long distinct + optional sort, shared by both
    * expressions. `vals[0, m)` is the raw hash stream; returns the packed
    * result array. */
  private[functions] def finish(vals: Array[Long], m: Int,
      distinct: Boolean, sorted: Boolean): Array[Long] = {
    val kept =
      if (!distinct || m <= 1) { if (m == vals.length) vals else java.util.Arrays.copyOf(vals, m) }
      else {
        // open-addressing set, linear probe; first-occurrence order out
        var cap = Integer.highestOneBit(math.max(4, m * 2 - 1)) << 1
        if (cap < 0) cap = 1 << 30
        val mask = cap - 1
        val table = new Array[Long](cap)
        val used = new Array[Boolean](cap)
        val out = new Array[Long](m)
        var k = 0
        var i = 0
        while (i < m) {
          val v = vals(i)
          var slot = ((v ^ (v >>> 32)).toInt * 0x9E3779B9) & mask
          var dup = false
          var break = false
          while (!break) {
            if (!used(slot)) break = true
            else if (table(slot) == v) { dup = true; break = true }
            else slot = (slot + 1) & mask
          }
          if (!dup) { table(slot) = v; used(slot) = true; out(k) = v; k += 1 }
          i += 1
        }
        java.util.Arrays.copyOf(out, k)
      }
    if (sorted) java.util.Arrays.sort(kept)
    kept
  }
}

/** `array<long>` of hashed character `n`-grams of a string — see
  * [[HashedShingles]]. */
case class HashedCharNgrams(child: Expression, n: Int, kind: Int, seed: Long,
    distinct: Boolean, sorted: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_char_ngrams expects a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val nBytes = bytes.length
    val nChars = u.numChars()
    // byte offset of each char start, plus the end sentinel; identity for ASCII
    val offs: Array[Int] =
      if (nBytes == nChars) null
      else {
        val o = new Array[Int](nChars + 1)
        var b = 0; var c = 0
        while (b < nBytes) {
          o(c) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          c += 1
        }
        o(nChars) = nBytes
        o
      }
    @inline def charOff(c: Int): Int = if (offs == null) c else offs(c)
    val m = if (nChars <= n) 1 else nChars - n + 1
    val vals = new Array[Long](m)
    if (kind == HashedShingles.KindMd5Prefix60) {
      val md = HashedShingles.md5Local.get()
      val out16 = new Array[Byte](16)
      var i = 0
      while (i < m) {
        val lo = charOff(i)
        val hi = if (nChars <= n) nBytes else charOff(i + n)
        vals(i) = HashedShingles.md5Prefix60(md, out16, bytes, lo, hi - lo)
        i += 1
      }
    } else {
      var i = 0
      while (i < m) {
        val lo = charOff(i)
        val hi = if (nChars <= n) nBytes else charOff(i + n)
        vals(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + lo, hi - lo, seed)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(
      HashedShingles.finish(vals, m, distinct, sorted))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` of hashed word `k`-shingles of a token array — see
  * [[HashedShingles]]. Shingle text = tokens joined by a single space
  * (null tokens skipped entirely, the `concat_ws` rule). */
case class HashedWordShingles(child: Expression, k: Int, kind: Int, seed: Long,
    distinct: Boolean, sorted: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_word_shingles expects array<string> input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nToks = arr.numElements()
    val toks = new Array[UTF8String](nToks)
    var i = 0
    while (i < nToks) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val m = if (nToks <= k) 1 else nToks - k + 1
    val width = math.min(k, nToks)
    val vals = new Array[Long](m)
    // reusable shingle byte buffer (grown on demand)
    var buf = new Array[Byte](64)
    val md = if (kind == HashedShingles.KindMd5Prefix60) HashedShingles.md5Local.get() else null
    val out16 = if (md != null) new Array[Byte](16) else null
    var s = 0
    while (s < m) {
      // join toks[s, s+width) by single spaces, skipping nulls (concat_ws)
      var len = 0
      var first = true
      var j = 0
      while (j < width) {
        val t = toks(s + j)
        if (t != null) {
          val tb = t.numBytes()
          val need = len + tb + (if (first) 0 else 1)
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '; len += 1 }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          first = false
        }
        j += 1
      }
      vals(s) =
        if (md != null) HashedShingles.md5Prefix60(md, out16, buf, 0, len)
        else XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, seed)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      HashedShingles.finish(vals, m, distinct, sorted))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
