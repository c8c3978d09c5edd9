package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword-segmentation kernels (unigram-LM tokenization — the
  * SentencePiece model family; complements `BpeLearn`'s merge-based
  * tokenizer with the probabilistic one).
  *
  * Costs are integer micro-nats (−ln p × 1e6, rounded once at vocab
  * build time), so the DP below is EXACT long arithmetic — every
  * engine and every execution order computes the same segmentation.
  */
object UnigramKernel {

  /** Viterbi segmentation: split `word` into vocab pieces minimizing
    * total cost (= maximizing unigram-LM likelihood). Unknown single
    * characters cost `unkCost` (so every word is segmentable);
    * multi-char substrings outside the vocab are not candidates.
    *
    * Deterministic tie-break: on equal total cost the LONGER last
    * piece wins at every DP cell (smaller backpointer), which makes
    * the full segmentation unique for a given vocab.
    *
    * Returns the pieces space-joined (words are space-split upstream,
    * so the piece alphabet never contains a space).
    */
  def viterbi(word: String, cost: java.util.HashMap[String, java.lang.Long],
              maxLen: Int, unkCost: Long): String = {
    val n = word.length
    if (n == 0) return ""
    val best = new Array[Long](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(back, Int.MaxValue)
    var i = 1
    while (i <= n) {
      val lMax = math.min(maxLen, i)
      var l = 1
      while (l <= lMax) {
        val j = i - l
        if (best(j) != Long.MaxValue) {
          val c0 = cost.get(word.substring(j, i))
          val c: Long =
            if (c0 != null) c0.longValue()
            else if (l == 1) unkCost
            else -1L
          if (c >= 0L) {
            val tot = best(j) + c
            if (tot < best(i) || (tot == best(i) && j < back(i))) {
              best(i) = tot
              back(i) = j
            }
          }
        }
        l += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n + 4)
    def emit(k: Int): Unit = if (k > 0) {
      emit(back(k))
      if (back(k) > 0) sb.append(' ')
      sb.append(word, back(k), k)
    }
    emit(n)
    sb.toString
  }

  /** UTF8String adapter for codegen call sites. */
  def viterbiU(word: UTF8String, cost: java.util.HashMap[String, java.lang.Long],
               maxLen: Int, unkCost: Long): UTF8String =
    UTF8String.fromString(viterbi(word.toString, cost, maxLen, unkCost))
}

/** unigram_viterbi(word) → space-joined pieces. The vocab rides the
  * expression as a broadcast-in-plan reference object (parameter-
  * sized — it IS the model), and codegen emits a direct static-kernel
  * call, so segmentation stays inside whole-stage codegen in the scan
  * stage: no UDF boxing, no shuffle.
  */
case class UnigramViterbi(child: Expression,
                          vocab: java.util.HashMap[String, java.lang.Long],
                          maxLen: Int, unkCost: Long)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi needs a string column, got ${child.dataType}")

  override def nullSafeEval(w: Any): Any =
    UnigramKernel.viterbiU(w.asInstanceOf[UTF8String], vocab, maxLen, unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernel.viterbiU($c, $ref, $maxLen, ${unkCost}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unigram_viterbi"
}
