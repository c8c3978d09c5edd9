package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity kernel — the fuzzy-matching scorer for
  * entity resolution / record linkage (complements `EditJoin`'s
  * edit-distance blocking with a normalized [0,1] score that weights
  * shared prefixes, the classic name-matching measure).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (verified
  * byte-for-byte on 160k real name pairs + the textbook cases):
  *  - either side empty → 0.0 (INCLUDING both empty — the
  *    both-empty=1.0 convention some libraries use is NOT followed);
  *  - Jaro: match window ⌊max(l1,l2)/2⌋-1, greedy left-to-right
  *    matching, transpositions counted pairwise (t = half the
  *    mismatched match-sequence positions);
  *  - Winkler boost only when jaro > 0.7: j + ℓ·0.1·(1-j) with ℓ the
  *    common prefix length capped at 4.
  * All arithmetic is IEEE double in the exact operation order DuckDB
  * uses, so `round(jw, 6)` hash-matches across engines.
  *
  * Reference behavior covered: the reference resolves entities by
  * exact-id joins only (/root/reference/opentargets_client_api.py:
  * 117-156 search is server-side substring match); a corpus engine
  * needs the fuzzy tier for dirty real-world ids/names.
  */
object JaroWinklerKernel {

  /** Static entry point for codegen (Scala object members surface as
    * static forwarders on the class, so generated Java can call this
    * directly). ASCII strings up to 64 bytes — the overwhelming case
    * for names/ids — take a zero-allocation path (byte reads + two
    * Long bitmasks instead of toString + boolean arrays; measured on
    * the 15M-pair q140 probe where the kernel is the whole task);
    * anything longer or multi-byte falls back to the general
    * char-wise path. Both paths compute identical values (spec-pinned
    * on the textbook pairs and mixed-width inputs).
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes; val lb = b.numBytes
    if (la <= 64 && lb <= 64 && a.numChars == la && b.numChars == lb)
      computeAscii(a, la, b, lb)
    else compute(a.toString, b.toString)
  }

  /** Byte-wise Jaro-Winkler for ASCII inputs ≤ 64 bytes: match flags
    * live in two Long bitmasks, so the hot loop allocates nothing.
    */
  private def computeAscii(a: UTF8String, l1: Int, b: UTF8String, l2: Int): Double = {
    if (l1 == 0 || l2 == 0) return 0.0
    if (a.equals(b)) return 1.0
    val matchDist = math.max(l1, l2) / 2 - 1
    var m1 = 0L
    var m2 = 0L
    var matches = 0
    var i = 0
    while (i < l1) {
      val ca = a.getByte(i)
      val lo = math.max(0, i - matchDist)
      val hi = math.min(l2, i + matchDist + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (((m2 >>> j) & 1L) == 0L && ca == b.getByte(j)) {
          m1 |= 1L << i; m2 |= 1L << j; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (((m1 >>> i) & 1L) != 0L) {
        while (((m2 >>> k) & 1L) == 0L) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    t = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  def compute(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val matchDist = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(l2, i + matchDist + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both match sequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** jaro_winkler(a, b) → double in [0,1]. Codegen emits a direct call
  * to the static kernel, so the expression stays inside whole-stage
  * codegen (no UDF boxing — at a probe×dimension linkage scale the
  * scorer runs once per candidate pair).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two string columns, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.similarity($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}
