// Hosted inside the spark.sql package hierarchy because the extension
// surface (AbstractDataType, ExpressionUtils.column) is private[sql] —
// the established pattern for libraries shipping native expressions.
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hot path. The
  * higher-order-function formulation (`transform(...)` lambdas over
  * shingle arrays) evaluates interpreted — one virtual call per array
  * element with UTF8String boxing, outside whole-stage codegen. These
  * expressions do the same work as a single compiled call per row.
  *
  * Determinism contract (must match the DuckDB oracle bit-for-bit):
  * - tokens = maximal runs of non-space bytes (≡ `filter(split(text,
  *   ' '), x -> x != '')`; a space can never be a UTF-8 continuation
  *   byte, so byte scanning is character-safe);
  * - n-grams join n consecutive tokens with a single space;
  * - minhash uses md5 hex of "<perm>:<shingle>" and the lexicographic
  *   min hex — equal to the unsigned-byte min of the raw digests, so
  *   digests are compared raw and hex-encoded once at the end;
  * - band hash b = md5(minHex[2b] || minHex[2b+1] || ":" || b).
  */
object TextNative {

  private val digestTL: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  private val HexChars = "0123456789abcdef".getBytes

  private def hex(digest: Array[Byte], out: Array[Byte], outPos: Int): Unit = {
    var i = 0
    while (i < digest.length) {
      val b = digest(i) & 0xff
      out(outPos + 2 * i) = HexChars(b >>> 4)
      out(outPos + 2 * i + 1) = HexChars(b & 0x0f)
      i += 1
    }
  }

  /** Token (offset, length) pairs for maximal non-space runs. Returns
    * a packed array: [off0, len0, off1, len1, ...] and the count. */
  private def tokenize(bytes: Array[Byte]): (Array[Int], Int) = {
    val offs = new Array[Int](bytes.length + 2)
    var nTok = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && bytes(i) == ' ') i += 1
      if (i < bytes.length) {
        val start = i
        while (i < bytes.length && bytes(i) != ' ') i += 1
        offs(2 * nTok) = start
        offs(2 * nTok + 1) = i - start
        nTok += 1
      }
    }
    (offs, nTok)
  }

  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  /** Content-defined chunk boundaries: the 1-based CHARACTER positions
    * i in [window, nChars−1] where the base-31 polynomial over the last
    * `window` code points ≡ 0 (mod mask+1) — value-identical to the
    * SQL/oracle per-position formulation Σ_j cp(i−j)·31^j, computed
    * with the O(1) rolling update (h' = (h − dropped·31^{w−1})·31 +
    * added) instead of O(window) work per position. Code points (not
    * bytes) because `ascii(substring(text, i, 1))` is the i-th
    * character's code point in both engines. */
  def cdcBoundaries(t: UTF8String, window: Int, mask: Int): ArrayData = {
    val cps = t.toString.codePoints().toArray
    val n = cps.length
    if (n <= window) return EmptyArray
    var bTop = 1L
    var j = 0
    while (j < window - 1) { bTop *= 31L; j += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = h * 31L + cps(i); i += 1 }
    val m = mask + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = window // current 1-based position (window ends at char pos)
    if (h % m == 0) out += pos
    while (pos < n - 1) {
      h = (h - cps(pos - window) * bTop) * 31L + cps(pos)
      pos += 1
      if (h % m == 0) out += pos
    }
    if (out.isEmpty) EmptyArray else new GenericArrayData(out.toArray)
  }

  /** Word n-gram array (space-joined); empty when fewer than n tokens. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val (offs, nTok) = tokenize(bytes)
    if (nTok < n) return EmptyArray
    val out = new Array[Any](nTok - n + 1)
    var g = 0
    while (g < out.length) {
      var size = n - 1
      var j = 0
      while (j < n) { size += offs(2 * (g + j) + 1); j += 1 }
      val gram = new Array[Byte](size)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { gram(pos) = ' '; pos += 1 }
        val len = offs(2 * (g + j) + 1)
        System.arraycopy(bytes, offs(2 * (g + j)), gram, pos, len)
        pos += len
        j += 1
      }
      out(g) = UTF8String.fromBytes(gram)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Character n-gram array (sliding window, stride 1): equal to
    * `transform(sequence(1, numChars − n + 1), i -> substring(text, i, n))`
    * but ONE O(bytes) pass per row — per-position `substring` re-scans
    * the UTF8String from byte 0 because character indexing is linear,
    * making the HOF form O(len²) per document (measured as most of the
    * LID-trigram operator's cost). Code-point safe: windows advance by
    * UTF-8 character starts, so multi-byte text slices exactly like
    * SQL substring. Empty when fewer than n characters. */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val starts = new Array[Int](len + 1)
    var i = 0
    var c = 0
    while (i < len) {
      starts(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(c) = len
    if (c < n) return EmptyArray
    val out = new Array[Any](c - n + 1)
    var k = 0
    while (k < out.length) {
      val off = starts(k)
      out(k) = UTF8String.fromBytes(bytes, off, starts(k + n) - off)
      k += 1
    }
    new GenericArrayData(out)
  }

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** LSH band hashes from the minhash signature of a shingle array:
    * nPerms seeded md5 mins, folded into nBands band-bucket hashes.
    * One compiled pass over the shingles; digests stay raw until the
    * final hex encode. Empty input → empty output. */
  def minhashBands(arr: ArrayData, nPerms: Int, nBands: Int): ArrayData = {
    val nSh = arr.numElements()
    if (nSh == 0) return EmptyArray
    val md = digestTL.get()
    val prefixes = new Array[Array[Byte]](nPerms)
    var p = 0
    while (p < nPerms) { prefixes(p) = (p.toString + ":").getBytes; p += 1 }
    val mins = new Array[Array[Byte]](nPerms)
    var i = 0
    while (i < nSh) {
      val s = arr.getUTF8String(i).getBytes
      p = 0
      while (p < nPerms) {
        md.reset()
        md.update(prefixes(p))
        md.update(s)
        val d = md.digest()
        if (mins(p) == null || lessUnsigned(d, mins(p))) mins(p) = d
        p += 1
      }
      i += 1
    }
    val rowsPerBand = nPerms / nBands
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val suffix = (":" + b.toString).getBytes
      val buf = new Array[Byte](32 * rowsPerBand + suffix.length)
      var r = 0
      while (r < rowsPerBand) {
        hex(mins(rowsPerBand * b + r), buf, 32 * r)
        r += 1
      }
      System.arraycopy(suffix, 0, buf, 32 * rowsPerBand, suffix.length)
      md.reset()
      val d = md.digest(buf)
      val hx = new Array[Byte](32)
      hex(d, hx, 0)
      out(b) = UTF8String.fromBytes(hx)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** The raw minhash SIGNATURE (nPerms seeded md5 mins as hex) —
    * the persistable form: cross-corpus dedup joins signatures
    * computed in different runs, so the per-perm mins must be
    * emitted, not only the folded band hashes. Same hash family as
    * [[minhashBands]] (perm-seeded md5, unsigned-lexicographic min).
    * Empty input → empty output. */
  def minhashSig(arr: ArrayData, nPerms: Int): ArrayData = {
    val nSh = arr.numElements()
    if (nSh == 0) return EmptyArray
    val md = digestTL.get()
    val prefixes = new Array[Array[Byte]](nPerms)
    var p = 0
    while (p < nPerms) { prefixes(p) = (p.toString + ":").getBytes; p += 1 }
    val mins = new Array[Array[Byte]](nPerms)
    var i = 0
    while (i < nSh) {
      val s = arr.getUTF8String(i).getBytes
      p = 0
      while (p < nPerms) {
        md.reset()
        md.update(prefixes(p))
        md.update(s)
        val d = md.digest()
        if (mins(p) == null || lessUnsigned(d, mins(p))) mins(p) = d
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](nPerms)
    p = 0
    while (p < nPerms) {
      val hx = new Array[Byte](32)
      hex(mins(p), hx, 0)
      out(p) = UTF8String.fromBytes(hx)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** One-permutation-hashing slot minima: ONE md5 per shingle, binned
    * by the digest's last hex char mod nSlots (≡ the interpreted form
    * `(locate(substring(md5(s), 32, 1), '0123456789abcdef') - 1) %
    * nSlots` — the last hex char is the low nibble of byte 15), each
    * bin keeping its unsigned-min digest (≡ the lexicographic hex
    * min). Empty bins stay NULL — the caller densifies (an 8-element
    * HOF, free) and counts them. This is the kernel that makes OPH's
    * hashing refund real: the k-perm tier pays nPerms md5 per
    * shingle, this pays exactly one. */
  def ophSlots(arr: ArrayData, nSlots: Int): ArrayData = {
    val nSh = arr.numElements()
    val md = digestTL.get()
    val mins = new Array[Array[Byte]](nSlots)
    var i = 0
    while (i < nSh) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val slot = (d(15) & 0x0f) % nSlots
      if (mins(slot) == null || lessUnsigned(d, mins(slot))) mins(slot) = d
      i += 1
    }
    val out = new Array[Any](nSlots)
    var p = 0
    while (p < nSlots) {
      if (mins(p) != null) {
        val hx = new Array[Byte](32)
        hex(mins(p), hx, 0)
        out(p) = UTF8String.fromBytes(hx)
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  /** 128-bit SimHash over whitespace tokens — the WIDE tier of the
    * perceptual-hash ladder (the 60-bit tier's band buckets saturate
    * past ~10⁸ distinct payloads; 21/22-bit bands push that bound past
    * 10¹²). Per token the FULL md5 digest, split into two 64-bit
    * big-endian words: w1 = digest bytes 0–7 (hex chars 1–16),
    * w2 = bytes 8–15 (hex 17–32); a ±1 vote per bit position over all
    * tokens, bit set iff votes > 0, bit j of a word read LSB-first
    * ((w >>> j) & 1) — the same conventions as [[simhash60]], just
    * over both words. Returns [w1, w2] (two's-complement longs — the
    * oracle mirrors them as hugeints with an explicit 2⁶⁴ wraparound);
    * null on zero tokens. */
  def simhash128(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val (offs, nTok) = tokenize(bytes)
    if (nTok == 0) return null
    val votes = new Array[Int](128)
    val md = digestTL.get()
    var t = 0
    while (t < nTok) {
      md.reset()
      md.update(bytes, offs(2 * t), offs(2 * t + 1))
      val d = md.digest()
      var w1 = 0L
      var w2 = 0L
      var i = 0
      while (i < 8) {
        w1 = (w1 << 8) | (d(i) & 0xffL)
        w2 = (w2 << 8) | (d(i + 8) & 0xffL)
        i += 1
      }
      var j = 0
      while (j < 64) {
        if (((w1 >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        if (((w2 >>> j) & 1L) == 1L) votes(64 + j) += 1 else votes(64 + j) -= 1
        j += 1
      }
      t += 1
    }
    var o1 = 0L
    var o2 = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) o1 |= (1L << j)
      if (votes(64 + j) > 0) o2 |= (1L << j)
      j += 1
    }
    new GenericArrayData(Array[Any](o1, o2))
  }

  /** Lexicographically smallest md5 hex over the array's elements
    * (the k=1 winnow fingerprint); null for an empty array. */
  def md5Min(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = digestTL.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      if (min == null || lessUnsigned(d, min)) min = d
      i += 1
    }
    val hx = new Array[Byte](32)
    hex(min, hx, 0)
    UTF8String.fromBytes(hx)
  }

  /** 60-bit SimHash; see [[SimHash60]] for the contract. */
  def simhash60(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val (offs, nTok) = tokenize(bytes)
    if (nTok == 0) return null
    val votes = new Array[Int](60)
    val md = digestTL.get()
    var t = 0
    while (t < nTok) {
      md.reset()
      md.update(bytes, offs(2 * t), offs(2 * t + 1))
      val d = md.digest()
      // first 15 hex chars = the top 60 bits of the digest, big-endian
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }
}

/** `word_ngrams(text, n)` — the tokenizer+shingler as one compiled call. */
/** 60-bit SimHash over whitespace tokens: per token the first 60 bits
  * of its md5 (≡ `conv(substring(md5(t), 1, 15), 16, 10)`), a ±1 vote
  * per bit position over ALL tokens, bit set iff votes > 0 — exactly
  * the HOF cascade it replaces (ddSimhash's 60×tokens interpreted
  * lambda fold), as one compiled pass per row. Null on zero tokens
  * (mirrors the caller's `size(toks) >= 1` filter). */
case class CdcBoundaries(child: Expression, window: Int, mask: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1 && mask >= 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(t: Any): Any =
    TextNative.cdcBoundaries(t.asInstanceOf[UTF8String], window, mask)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.TextNative.cdcBoundaries($t, $window, $mask);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def nullSafeEval(t: Any): Any =
    TextNative.simhash60(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |java.lang.Long ${ev.value}Box = org.apache.spark.sql.graft.TextNative.simhash60($t);
         |${ev.isNull} = (${ev.value}Box == null);
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}Box.longValue();
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash128(text)` — see [[TextNative.simhash128]]; returns
  * array<bigint> [w1, w2], null on zero tokens. */
case class SimHash128(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "simhash128"

  override def nullSafeEval(t: Any): Any =
    TextNative.simhash128(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.TextNative.simhash128($t);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(t: Any): Any =
    TextNative.charNgrams(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.TextNative.charNgrams($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(t: Any): Any =
    TextNative.wordNgrams(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.TextNative.wordNgrams($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_bands(shingles, nPerms, nBands)` — signature + banding in
  * one compiled pass (replaces nPerms interpreted transform/array_min
  * passes plus the band-hash projection). */
case class MinHashBands(child: Expression, nPerms: Int, nBands: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPerms % nBands == 0, "nPerms must divide into nBands evenly")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(a: Any): Any =
    TextNative.minhashBands(a.asInstanceOf[ArrayData], nPerms, nBands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextNative.minhashBands($a, $nPerms, $nBands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(shingles, nPerms)` — the raw signature (per-perm md5
  * mins as hex), the persistable cross-run dedup form. */
case class MinHashSig(child: Expression, nPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPerms >= 1, "nPerms must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    TextNative.minhashSig(a.asInstanceOf[ArrayData], nPerms)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextNative.minhashSig($a, $nPerms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `oph_slots(shingles, nSlots)` — one-permutation minhash slot
  * minima in one compiled pass (one md5 per shingle vs the k-perm
  * kernel's nPerms); NULL slots mark empty bins for the caller's
  * densification. */
case class OphSlots(child: Expression, nSlots: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nSlots >= 1, "nSlots must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "oph_slots"

  override def nullSafeEval(a: Any): Any =
    TextNative.ophSlots(a.asInstanceOf[ArrayData], nSlots)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextNative.ophSlots($a, $nSlots);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_min(arr)` — min md5 hex over array elements; null on empty. */
case class Md5Min(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "md5_min"

  override def nullSafeEval(a: Any): Any =
    TextNative.md5Min(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.TextNative.md5Min($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def wordNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(text), n))
  def charNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgrams(ExpressionUtils.expression(text), n))
  def minhashBands(shingles: Column, nPerms: Int, nBands: Int): Column =
    ExpressionUtils.column(MinHashBands(
      ExpressionUtils.expression(shingles), nPerms, nBands))
  def md5Min(arr: Column): Column =
    ExpressionUtils.column(Md5Min(ExpressionUtils.expression(arr)))
  def minhashSig(shingles: Column, nPerms: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), nPerms))
  def ophSlots(shingles: Column, nSlots: Int): Column =
    ExpressionUtils.column(OphSlots(ExpressionUtils.expression(shingles), nSlots))
  def simhash60(text: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(text)))
  def simhash128(text: Column): Column =
    ExpressionUtils.column(SimHash128(ExpressionUtils.expression(text)))
  def cdcBoundaries(text: Column, window: Int, mask: Int): Column =
    ExpressionUtils.column(CdcBoundaries(
      ExpressionUtils.expression(text), window, mask))
}
