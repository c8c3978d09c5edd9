package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the dedup family's hot path:
  * normalized word n-gram shingle HASHES of a text column, in one
  * linear pass with zero intermediate strings.
  *
  * The declarative form (normText regex → split → per-token xxhash64
  * HOF → n-gram combine) was the dominant cost of the whole jaccard/
  * minhash family: higher-order functions are interpreted per
  * element, and any composite array expression referenced inside a
  * lambda is RE-EVALUATED per element — the n-gram combine step was
  * O(tokens²) per document however it was phrased (measured 36 s at
  * sf0.1 vs 6 s for the regex string path, vs 0.6 s for this kernel).
  * A custom expression is the documented escalation path (SURVEY §4.3)
  * once `functions._` can't express a linear pass.
  *
  * Semantics (mirrors `TextFns.normText` + space split, byte-wise):
  * lowercase (UTF8String.toLowerCase — same as Spark's `lower`), then
  * every byte outside [a-z0-9] is a token boundary (multi-byte UTF-8
  * units have the high bit set, so non-ASCII text splits exactly like
  * normText's `[^a-z0-9 ]` → space rule). Each token hashes via
  * XXH64 over its bytes; an n-gram is the XXH64-chained combination
  * of its n token hashes (order-sensitive). The result is the sorted
  * DISTINCT hash set — exactly the relation the jaccard prefix filter
  * and minhash signatures consume. Set cardinalities (hence every
  * Jaccard value and minhash collision statistic) equal the string
  * form's w.h.p. (~n²/2⁶⁵ collision odds, same contract the string
  * path already accepted when it hashed its shingles).
  *
  * Reference behavior covered: near-dup detection over document text
  * (the scale-out analogue of the reference's per-record dedup steps).
  */
case class ShingleHash64(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 8, s"shingle size $n out of range")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 needs a string column, got ${child.dataType}")

  private val Seed = 42L

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].toLowerCase.getBytes
    // first pass: hash tokens in place ([a-z0-9] runs)
    var tokenHashes = new Array[Long](math.max(8, bytes.length / 4))
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok) {
        var j = i + 1
        while (j < len && {
          val c = bytes(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        if (nTok == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        }
        tokenHashes(nTok) =
          XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, j - i, Seed)
        nTok += 1
        i = j
      } else i += 1
    }
    if (nTok < n) return ArrayData.toArrayData(Array.emptyLongArray)
    // second pass: chain n consecutive token hashes per gram
    val grams = new Array[Long](nTok - n + 1)
    var g = 0
    while (g < grams.length) {
      var h = Seed
      var k = 0
      while (k < n) { h = XXH64.hashLong(tokenHashes(g + k), h); k += 1 }
      grams(g) = h
      g += 1
    }
    // sorted distinct, in place
    java.util.Arrays.sort(grams)
    var out = 1
    var r = 1
    while (r < grams.length) {
      if (grams(r) != grams(out - 1)) { grams(out) = grams(r); out += 1 }
      r += 1
    }
    ArrayData.toArrayData(
      if (out == grams.length) grams else java.util.Arrays.copyOf(grams, out))
  }

  private object Platform {
    val BYTE_ARRAY_OFFSET: Long = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "shingle_hash64"
}

/** Native kernel for the span-dedup family (`Dedup.spanHashes`): the
  * md5 hex of every k-word span of a single-space-separated text, in
  * document order (NOT distinct — position identity matters), one
  * array entry per span start. Declaratively this is
  * `transform(sequence(...), i -> md5(concat_ws(" ", slice(words, i, k))))`
  * — a higher-order function, interpreted per element, that
  * re-slices and re-concatenates per span (measured ~1.5 s per
  * evaluation at sf0.1, ×2 evaluations ≈ 3/4 of q180's cost). The
  * kernel exploits that words split on SINGLE spaces re-join into
  * exactly the original byte range: each span md5 is computed
  * straight over the text's bytes [wordStart(i), wordEnd(i+k-1)) —
  * one boundary scan, zero intermediate strings, and the digest
  * object reused across rows. Output is bit-identical to the HOF
  * form (spec-pinned), and to DuckDB's
  * `md5(array_to_string(ws[i:i+k-1], ' '))` — the q180/q181 oracle
  * replay stays exact. Split semantics mirror Spark's
  * `split(text, " ")` (limit -1): consecutive/leading/trailing
  * spaces yield empty words, which count toward positions.
  */
case class WordSpanMd5(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2, s"span width $k must be >= 2")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_span_md5 needs a string column, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // word i starts at starts(i); sentinel starts(nWords) = len + 1 so
    // a span ending at the last word closes at exactly `len`
    var starts = new Array[Int](16)
    starts(0) = 0
    var nWords = 1
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') {
        if (nWords + 1 > starts.length) {
          starts = java.util.Arrays.copyOf(starts, starts.length * 2)
        }
        starts(nWords) = i + 1
        nWords += 1
      }
      i += 1
    }
    if (nWords < k) return new GenericArrayData(Array.empty[Any])
    if (nWords + 1 > starts.length) {
      starts = java.util.Arrays.copyOf(starts, starts.length + 1)
    }
    starts(nWords) = len + 1
    val md = WordSpanMd5.digest.get()
    val out = new Array[Any](nWords - k + 1)
    var s = 0
    while (s < out.length) {
      val from = starts(s)
      val until = starts(s + k) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(s) = UTF8String.fromBytes(WordSpanMd5.hex(md.digest()))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "word_span_md5"
}

object WordSpanMd5 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789abcdef".getBytes
  private def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    out
  }
}
