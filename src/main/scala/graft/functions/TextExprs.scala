package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
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
