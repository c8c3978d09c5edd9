package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern dictionary tagging (Aho-Corasick) — the blocklist /
  * topic-phrase scanner of a training-data pipeline: N patterns are
  * matched in ONE pass over each document, instead of N contains()
  * scans (the naive form re-reads every byte N times — at a 10⁵-entry
  * blocklist over 100 TB that is the difference between one corpus
  * read and a hundred thousand).
  *
  * Semantics: ALL occurrences, including overlapping ones — the count
  * for pattern p is |{ i : text[i .. i+|p|) = p }| (an SQL engine
  * replays this exactly with a positional substr scan; replace()-based
  * counting is WRONG for self-overlapping patterns like "aa" in
  * "aaa"). Matching is byte-wise over UTF-8; a pattern that is valid
  * UTF-8 can never match at a non-codepoint boundary (a multi-byte
  * sequence's continuation bytes never equal a lead byte), so byte
  * positions and character positions agree wherever a match exists.
  *
  * The automaton is the classic goto/fail/output construction:
  * per-state transitions as sorted parallel byte/target arrays
  * (binary search — a dense 256-way row per state would be ~1 KB per
  * trie node, unaffordable at blocklist scale), BFS-computed fail
  * links, and output links (nearest fail-ancestor with a pattern
  * ending there) so the per-position output walk touches only actual
  * matches. Built once on the driver (model-sized state: the pattern
  * set), rides the plan as a reference object like the unigram vocab.
  */
object AcKernel {

  /** Frozen automaton: flat arrays, serializable, shareable across
    * tasks. States are BFS-ordered; state 0 is the root.
    */
  final class Automaton(
      private[AcKernel] val edgeOffset: Array[Int],  // state -> first edge index
      private[AcKernel] val edgeByte: Array[Byte],   // sorted within a state's slice
      private[AcKernel] val edgeTo: Array[Int],
      private[AcKernel] val fail: Array[Int],
      private[AcKernel] val patEnd: Array[Int],      // patterns ending EXACTLY here, flattened
      private[AcKernel] val patOffset: Array[Int],   // state -> first patEnd index
      private[AcKernel] val outLink: Array[Int],     // nearest output ancestor via fail, -1 = none
      val nPatterns: Int) extends Serializable {
    def nStates: Int = fail.length
  }

  /** Build from the pattern list. Patterns must be non-empty and are
    * matched as raw UTF-8 byte strings; duplicates each keep their
    * own slot (the counts array is positional).
    */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "pattern list must be non-empty")
    patterns.foreach(p => require(p != null && p.nonEmpty, "patterns must be non-empty"))
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
    // trie with per-state growable edge maps
    val trans = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Byte, Int])
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var pi = 0
    while (pi < pats.length) {
      var s = 0
      val p = pats(pi)
      var i = 0
      while (i < p.length) {
        val b = p(i)
        s = trans(s).getOrElse(b, {
          val ns = trans.length
          trans(s).update(b, ns)
          trans += scala.collection.mutable.TreeMap.empty[Byte, Int]
          ends += scala.collection.mutable.ArrayBuffer.empty[Int]
          ns
        })
        i += 1
      }
      ends(s) += pi
      pi += 1
    }
    val n = trans.length
    val fail = new Array[Int](n)
    // BFS fail links over the trie
    val queue = new java.util.ArrayDeque[Int]()
    trans(0).foreach { case (_, c) => fail(c) = 0; queue.add(c) }
    while (!queue.isEmpty) {
      val s = queue.poll()
      trans(s).foreach { case (b, c) =>
        var f = fail(s)
        var next = -1
        var done = false
        while (!done) {
          trans(f).get(b) match {
            case Some(t) => next = t; done = true
            case None => if (f == 0) { next = 0; done = true } else f = fail(f)
          }
        }
        fail(c) = next
        queue.add(c)
      }
    }
    // freeze edges + outputs to flat arrays
    val edgeOffset = new Array[Int](n + 1)
    val patOffset = new Array[Int](n + 1)
    var eo = 0; var po = 0
    var s = 0
    while (s < n) {
      edgeOffset(s) = eo; eo += trans(s).size
      patOffset(s) = po; po += ends(s).length
      s += 1
    }
    edgeOffset(n) = eo; patOffset(n) = po
    val edgeByte = new Array[Byte](eo)
    val edgeTo = new Array[Int](eo)
    val patEnd = new Array[Int](po)
    s = 0
    while (s < n) {
      var k = edgeOffset(s)
      trans(s).foreach { case (b, c) => edgeByte(k) = b; edgeTo(k) = c; k += 1 }
      k = patOffset(s)
      ends(s).foreach { p => patEnd(k) = p; k += 1 }
      s += 1
    }
    // output links: nearest proper fail-ancestor with a pattern end.
    // fail(s) is always BFS-shallower than s, but BFS order is not
    // array order here — resolve by chasing fail links ITERATIVELY
    // (chase depth is bounded by the longest pattern, which must not
    // become a stack bound: a pathologically long pattern is valid
    // input), memoizing every state on the walked chain
    val outLink = Array.fill(n)(-2) // -2 = unresolved, -1 = none
    outLink(0) = -1
    val chain = new Array[Int](n)
    s = 1
    while (s < n) {
      if (outLink(s) == -2) {
        // descend the fail chain: a state whose fail-parent has no
        // pattern end inherits ITS output link (ol(p) = ol(fail(p))),
        // so every pushed state resolves to the terminal state's value
        var st = s
        var depth = 0
        while (outLink(st) == -2 &&
            patOffset(fail(st) + 1) == patOffset(fail(st))) {
          chain(depth) = st; depth += 1
          st = fail(st)
        }
        val resolved =
          if (outLink(st) != -2) outLink(st)
          else { outLink(st) = fail(st); fail(st) } // fail(st) has ends
        var d = depth - 1
        while (d >= 0) { outLink(chain(d)) = resolved; d -= 1 }
      }
      s += 1
    }
    new Automaton(edgeOffset, edgeByte, edgeTo, fail, patEnd, patOffset, outLink,
      pats.length)
  }

  private def step(a: Automaton, state: Int, b: Byte): Int = {
    var s = state
    while (true) {
      // binary search the state's sorted edge slice
      var lo = a.edgeOffset(s); var hi = a.edgeOffset(s + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Byte.compare(a.edgeByte(mid), b)
        if (c == 0) return a.edgeTo(mid)
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      if (s == 0) return 0
      s = a.fail(s)
    }
    0 // unreachable
  }

  /** Per-pattern occurrence counts over `text` — one automaton pass,
    * all (overlapping) occurrences counted positionally.
    */
  def counts(a: Automaton, text: UTF8String): Array[Long] = {
    val out = new Array[Long](a.nPatterns)
    var state = 0
    val nb = text.numBytes
    var i = 0
    while (i < nb) {
      state = step(a, state, text.getByte(i))
      var t = if (a.patOffset(state + 1) > a.patOffset(state)) state
              else a.outLink(state)
      while (t >= 0) {
        var k = a.patOffset(t)
        val end = a.patOffset(t + 1)
        while (k < end) { out(a.patEnd(k)) += 1L; k += 1 }
        t = a.outLink(t)
      }
      i += 1
    }
    out
  }

  /** Codegen entry point: ArrayData of longs for the expression. */
  def countsU(a: Automaton, text: UTF8String): GenericArrayData =
    new GenericArrayData(counts(a, text))

  /** Leftmost-longest non-overlapping REDACTION: every selected match
    * is replaced by `token`. Candidates are ALL occurrences (the
    * counts/hits match semantics, overlapping included); selection
    * sorts candidates by (start asc, length desc) and greedily takes
    * any match starting at or after the cursor — the standard
    * PII-scrub rule, fully deterministic, and exactly replayable in
    * SQL (q209's oracle). With the q200 dictionary, "data data" wins
    * over "data" at the same start, and an overlapped shorter match
    * inside a consumed span is skipped. Byte-space arithmetic is
    * UTF-8-safe: every splice boundary is a whole-pattern boundary.
    * Returns (redacted, nRedactions).
    */
  def redact(a: Automaton, patLenBytes: Array[Int], text: UTF8String,
             token: UTF8String): (UTF8String, Int) = {
    var starts = new Array[Int](8)
    var lens = new Array[Int](8)
    var nm = 0
    var state = 0
    val nb = text.numBytes
    var i = 0
    while (i < nb) {
      state = step(a, state, text.getByte(i))
      var t = if (a.patOffset(state + 1) > a.patOffset(state)) state
              else a.outLink(state)
      while (t >= 0) {
        var k = a.patOffset(t)
        val end = a.patOffset(t + 1)
        while (k < end) {
          if (nm == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nm * 2)
            lens = java.util.Arrays.copyOf(lens, nm * 2)
          }
          val l = patLenBytes(a.patEnd(k))
          starts(nm) = i - l + 1; lens(nm) = l; nm += 1
          k += 1
        }
        t = a.outLink(t)
      }
      i += 1
    }
    if (nm == 0) return (text, 0)
    // order candidates by (start asc, len desc) without boxing:
    // pack into one long per match (start << 32 | (MaxLen - len))
    val keys = new Array[Long](nm)
    var j = 0
    while (j < nm) {
      keys(j) = (starts(j).toLong << 32) | ((Int.MaxValue - lens(j)).toLong & 0xffffffffL)
      j += 1
    }
    java.util.Arrays.sort(keys)
    val bytes = text.getBytes
    val tok = token.getBytes
    val out = new java.io.ByteArrayOutputStream(nb + 16)
    var cur = 0
    var n = 0
    j = 0
    while (j < nm) {
      val s = (keys(j) >>> 32).toInt
      val l = Int.MaxValue - (keys(j) & 0xffffffffL).toInt
      if (s >= cur) {
        out.write(bytes, cur, s - cur)
        out.write(tok, 0, tok.length)
        cur = s + l
        n += 1
      }
      j += 1
    }
    out.write(bytes, cur, nb - cur)
    (UTF8String.fromBytes(out.toByteArray), n)
  }

  /** Codegen entry point: (redacted, n_redactions) struct row. */
  def redactU(a: Automaton, patLenBytes: Array[Int], text: UTF8String,
              token: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (r, n) = redact(a, patLenBytes, text, token)
    org.apache.spark.sql.catalyst.InternalRow(r, n)
  }

  // Sparse accumulator scratch, per thread: a dense counts array
  // (grown to the widest dictionary this thread has seen) plus the
  // list of touched pattern ids, so reset is O(hits) — per-row
  // allocation is then HITS-sized, not dictionary-sized. At a
  // 10⁵-entry blocklist the dense form allocates ~800 KB per row;
  // this form allocates a few structs for the handful of patterns a
  // typical document actually contains.
  private val scratchCnt = new ThreadLocal[Array[Long]]
  private val scratchIds = new ThreadLocal[Array[Int]]

  /** Sparse per-pattern hits: (pattern index, count) structs for
    * patterns with count > 0, ordered by pattern index (canonical).
    * Same match semantics as [[counts]] (all occurrences, overlapping
    * included) — equality is spec-pinned.
    */
  def hitsU(a: Automaton, text: UTF8String): GenericArrayData = {
    var cnt = scratchCnt.get()
    if (cnt == null || cnt.length < a.nPatterns) {
      cnt = new Array[Long](a.nPatterns); scratchCnt.set(cnt)
    }
    var ids = scratchIds.get()
    if (ids == null || ids.length < a.nPatterns) {
      ids = new Array[Int](a.nPatterns); scratchIds.set(ids)
    }
    var nt = 0
    try {
      var state = 0
      val nb = text.numBytes
      var i = 0
      while (i < nb) {
        state = step(a, state, text.getByte(i))
        var t = if (a.patOffset(state + 1) > a.patOffset(state)) state
                else a.outLink(state)
        while (t >= 0) {
          var k = a.patOffset(t)
          val end = a.patOffset(t + 1)
          while (k < end) {
            val p = a.patEnd(k)
            if (cnt(p) == 0L) { ids(nt) = p; nt += 1 }
            cnt(p) += 1L
            k += 1
          }
          t = a.outLink(t)
        }
        i += 1
      }
      java.util.Arrays.sort(ids, 0, nt)
      val out = new Array[Any](nt)
      var j = 0
      while (j < nt) {
        out(j) = org.apache.spark.sql.catalyst.InternalRow(ids(j), cnt(ids(j)))
        j += 1
      }
      new GenericArrayData(out)
    } finally {
      // reset ONLY the touched slots (O(hits)); finally, so a freak
      // failure can never leak stale counts into the next row
      var j = 0
      while (j < nt) { cnt(ids(j)) = 0L; j += 1 }
    }
  }
}

/** multi_pattern_counts(text) → array<bigint>, one slot per
  * dictionary pattern (positional, caller zips with the pattern
  * list). One automaton pass per row inside whole-stage codegen; the
  * automaton is driver-built, model-sized state riding the plan as a
  * reference object (the `UnigramViterbi` discipline).
  */
case class MultiPatternCounts(child: Expression, automaton: AcKernel.Automaton)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_counts needs a string column, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    AcKernel.countsU(automaton, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AcKernel.Automaton")
    defineCodeGen(ctx, ev, c => s"graft.functions.AcKernel.countsU($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "multi_pattern_counts"
}

/** multi_pattern_hits(text) → array<struct<p:int, n:bigint>> of the
  * NONZERO per-pattern occurrence counts, ordered by pattern index —
  * the blocklist-scale form of [[MultiPatternCounts]]: per-row output
  * (and garbage) is sized by the document's actual HITS, never by the
  * dictionary, so a 10⁵-pattern blocklist costs the same per-row
  * allocation as a 6-pattern one. Same one-pass automaton, same
  * all-occurrence semantics (equality spec-pinned).
  */
case class MultiPatternHits(child: Expression, automaton: AcKernel.Automaton)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("p", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_hits needs a string column, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    AcKernel.hitsU(automaton, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AcKernel.Automaton")
    defineCodeGen(ctx, ev, c => s"graft.functions.AcKernel.hitsU($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "multi_pattern_hits"
}

/** multi_pattern_redact(text) → struct<redacted:string,
  * n_redactions:int>: leftmost-longest non-overlapping replacement of
  * every dictionary match by a fixed token — the PII/blocklist-scrub
  * write side of [[MultiPatternHits]]. Same one-pass automaton (the
  * dictionary rides the plan as a reference object), same scan-stage
  * codegen; per-row cost is O(bytes + matches), and the selection
  * rule (start asc, length desc, greedy cursor) is deterministic and
  * SQL-replayable (q209's oracle).
  */
case class MultiPatternRedact(child: Expression, automaton: AcKernel.Automaton,
                              patLenBytes: Array[Int], token: String)
    extends UnaryExpression {
  require(token.nonEmpty, "redaction token must be non-empty")
  private val tokenU = UTF8String.fromString(token)
  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_redactions", IntegerType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_redact needs a string column, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    AcKernel.redactU(automaton, patLenBytes, t.asInstanceOf[UTF8String], tokenU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AcKernel.Automaton")
    val lRef = ctx.addReferenceObj("acPatLens", patLenBytes, "int[]")
    val tRef = ctx.addReferenceObj("acToken", tokenU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AcKernel.redactU($aRef, $lRef, $c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "multi_pattern_redact"
}
