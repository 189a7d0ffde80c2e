package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused row generators for the LM-perplexity / DSIR feature pipelines.
  *
  * The Column compositions they replace evaluate
  * `portableHash60(concat(element_at(toks, i+1), "", element_at(toks,
  * i+2)))` per position inside an interpreted `transform` lambda — each call
  * materializes the concatenated bigram string, an md5 HEX STRING, a
  * 15-char substring, and a base-16 `conv` parse, millions of times per
  * corpus pass. These expressions walk the token array once, feed token
  * bytes (with the 0x01 separator) straight into a reused MessageDigest,
  * and read the 60-bit id off the digest's first bytes — bit-identical
  * values (`conv(substring(md5(s),1,15),16,10)` = top 60 digest bits),
  * pinned against the composed forms in PortableHashRowsSpec.
  */
object PortableHashRows {

  /** `md5Prefix60(s)` as a single native expression — the fused form of
    * [[GraftFunctions.portableHash60]]'s conv∘substring∘md5 chain. */
  def md5Prefix60(s: Column): Column =
    ExpressionUtils.column(Md5Prefix60(ExpressionUtils.expression(s)))

  /** LM bigram rows from a token array — the fused form of
    * [[graft.functions.LmPerplexity.bigramRows]]'s transform:
    * `array<struct<pos:int, bg_id:bigint, ctx_id:bigint>>`, empty when the
    * doc has fewer than 2 tokens. */
  def lmBigramRows(toks: Column): Column =
    ExpressionUtils.column(LmBigramRows(ExpressionUtils.expression(toks)))

  /** DSIR hashed-feature rows from a token array — the fused form of
    * [[graft.functions.Dsir.featureRows]]'s uni ++ bi transform:
    * `array<struct<pos:int, knd:int, fb:bigint>>` with
    * `fb = pmod(md5Prefix60(gram), buckets)`; unigrams (knd 0) first, then
    * bigrams (knd 1), empty when the doc has no token. */
  def dsirFeatureRows(toks: Column, buckets: Int): Column =
    ExpressionUtils.column(DsirFeatureRows(ExpressionUtils.expression(toks), buckets))

  private[functions] val Sep = Array[Byte](0x01)

  /** md5 of (a, 0x01, b) or of just (a) when b == null marker. */
  private[functions] def hashTok(md: java.security.MessageDigest,
      out16: Array[Byte], a: UTF8String): Long = {
    md.reset()
    md.update(a.getBytes)
    md.digest(out16, 0, 16)
    top60(out16)
  }

  private[functions] def hashBigram(md: java.security.MessageDigest,
      out16: Array[Byte], a: UTF8String, b: UTF8String): Long = {
    md.reset()
    md.update(a.getBytes)
    md.update(Sep)
    md.update(b.getBytes)
    md.digest(out16, 0, 16)
    top60(out16)
  }

  private def top60(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
}

/** Native `conv(substring(md5(s), 1, 15), 16, 10)::long`. */
case class Md5Prefix60(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix60 expects a string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val md = HashedShingles.md5Local.get()
    val out16 = new Array[Byte](16)
    PortableHashRows.hashTok(md, out16, input.asInstanceOf[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[PortableHashRows.lmBigramRows]]. */
case class LmBigramRows(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("bg_id", LongType, nullable = true),
    StructField("ctx_id", LongType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lm_bigram_rows expects array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val md = HashedShingles.md5Local.get()
    val out16 = new Array[Byte](16)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val rows = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      val a = toks(i); val b = toks(i + 1)
      val r = new GenericInternalRow(3)
      r.setInt(0, i)
      if (a == null || b == null) r.setNullAt(1)
      else r.setLong(1, PortableHashRows.hashBigram(md, out16, a, b))
      if (a == null) r.setNullAt(2)
      else r.setLong(2, PortableHashRows.hashTok(md, out16, a))
      rows(i) = r
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[PortableHashRows.dsirFeatureRows]]. */
case class DsirFeatureRows(child: Expression, buckets: Int)
  extends UnaryExpression with CodegenFallback {

  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("knd", IntegerType, nullable = false),
    StructField("fb", LongType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dsir_feature_rows expects array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = HashedShingles.md5Local.get()
    val out16 = new Array[Byte](16)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val nBi = if (n < 2) 0 else n - 1
    val rows = new Array[Any](n + nBi)
    val b = buckets.toLong
    i = 0
    while (i < n) { // unigrams, knd 0
      val r = new GenericInternalRow(3)
      r.setInt(0, i)
      r.setInt(1, 0)
      if (toks(i) == null) r.setNullAt(2)
      else r.setLong(2, PortableHashRows.hashTok(md, out16, toks(i)) % b)
      rows(i) = r
      i += 1
    }
    i = 0
    while (i < nBi) { // bigrams, knd 1
      val r = new GenericInternalRow(3)
      r.setInt(0, i)
      r.setInt(1, 1)
      if (toks(i) == null || toks(i + 1) == null) r.setNullAt(2)
      else r.setLong(2, PortableHashRows.hashBigram(md, out16, toks(i), toks(i + 1)) % b)
      rows(n + i) = r
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
