package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths. Working on
  * `ArrayData` directly avoids the UDF ser/deser of `WrappedArray`
  * per row — at 100 TB the cosine kernel runs billions of times, so
  * it must not box. (SURVEY.md §4.3 allows promoting these from HOF
  * compositions when bench demands; brute-force top-k made it the
  * first candidate.)
  */
private[graft] object VecKernels {
  /** Read element i of a float or double array without boxing. */
  @inline def get(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _          => throw new IllegalArgumentException(s"unsupported element type $et")
  }

  def cosine(a: ArrayData, aet: DataType, b: ArrayData, bet: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, aet, i); val y = get(b, bet, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def dot(a: ArrayData, aet: DataType, b: ArrayData, bet: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, aet, i) * get(b, bet, i); i += 1 }
    s
  }
}

/** Base for the two binary vector kernels: interpreted path via
  * VecKernels, codegen path emitting a tight primitive loop directly
  * into whole-stage codegen (no boxing, no virtual dispatch — the
  * generated Java reads floats straight out of the columnar
  * ArrayData). At 100 TB the kernel runs billions of times; this is
  * the difference between staying inside one WholeStageCodegen span
  * and paying an interpreted-expression call per row.
  */
abstract class BinaryVecExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def et(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  /** ArrayData accessor name for the element type. */
  protected def getter(e: Expression): String = et(e) match {
    case FloatType  => "getFloat"
    case DoubleType => "getDouble"
    case other      => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** cosine(a, b) over array<float>/array<double>. Null-safe: null in →
  * null out (BinaryExpression handles that before nullSafeEval).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryVecExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], et(left),
      b.asInstanceOf[ArrayData], et(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, dot, na, nb, x, y, denom) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
        ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("denom"))
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double) $a.${getter(left)}($i);
       |  double $y = (double) $b.${getter(right)}($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
       |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** dot(a, b) over numeric arrays. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVecExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], et(left),
      b.asInstanceOf[ArrayData], et(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("s"))
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $s += (double) $a.${getter(left)}($i) * (double) $b.${getter(right)}($i);
       |}
       |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Spark SQL's nan-safe double ordering (NaN greatest, NaN == NaN,
  * ±0.0 equal) — the comparison semantics `array_min`/`array_max`
  * apply to a struct's leading double, replicated so the fused argmin
  * kernels below tie-break exactly like the expression forms they
  * replace.
  */
private[functions] object NanSafe {
  @inline def cmp(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1
}

/** Fused argmin over a literal cell matrix of ‖c‖² − 2·v·c — ONE
  * kernel replacing k inlined per-cell [[DotProduct]] expressions
  * wrapped in an array_min-of-structs (k×codegen'd loops per row; at
  * PQ widths numSub·k of them in one projection, a codegen blowup
  * that grows with the codebook). Bit-identical to that form by
  * construction: the per-cell distance calls the SAME
  * [[VecKernels.dot]] accumulation and the same driver-computed
  * ‖c‖², and the scan keeps the EARLIEST minimum under nan-safe
  * ordering — exactly array_min's lexicographic (d, code) rule
  * (smaller d wins, NaN greatest, ties → lower code). Spec-pinned
  * against the expression form (SimilaritySpec).
  */
case class NearestCodeL2(child: Expression, cents: Seq[Seq[Float]])
    extends UnaryExpression {
  require(cents.nonEmpty, "nearest_code_l2: empty codebook")
  override def dataType: DataType = IntegerType
  private def et: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val cells: Array[ArrayData] =
    cents.map(c => ArrayData.toArrayData(c.toArray)).toArray
  @transient private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
    s
  }.toArray

  def compute(v: ArrayData): Int = {
    val vt = et
    var best = norms(0) - 2.0 * VecKernels.dot(v, vt, cells(0), FloatType)
    var bestI = 0
    var i = 1
    while (i < cells.length) {
      val d = norms(i) - 2.0 * VecKernels.dot(v, vt, cells(i), FloatType)
      if (NanSafe.cmp(d, best) < 0) { best = d; bestI = i }
      i += 1
    }
    bestI
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("nearestCodeL2", this,
        classOf[NearestCodeL2].getName)
      s"${ev.value} = $ref.compute($v);"
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_code_l2"
}

/** Fused argmax over a literal centroid matrix of cosine(v, c) — ONE
  * kernel replacing nlist inlined [[CosineSim]] expressions wrapped
  * in an array_max-of-structs. Bit-identical: per-cell cosine IS
  * [[VecKernels.cosine]], and the scan keeps the LATEST maximum under
  * nan-safe ordering — exactly array_max's lexicographic (s, cid)
  * rule (larger s wins, NaN greatest, ties → HIGHER cid).
  * Spec-pinned against the expression form (SimilaritySpec).
  */
case class NearestCid(child: Expression, cents: Seq[Seq[Float]])
    extends UnaryExpression {
  require(cents.nonEmpty, "nearest_cid: empty centroid set")
  override def dataType: DataType = IntegerType
  private def et: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val cells: Array[ArrayData] =
    cents.map(c => ArrayData.toArrayData(c.toArray)).toArray

  def compute(v: ArrayData): Int = {
    val vt = et
    var best = VecKernels.cosine(v, vt, cells(0), FloatType)
    var bestI = 0
    var i = 1
    while (i < cells.length) {
      val s = VecKernels.cosine(v, vt, cells(i), FloatType)
      if (NanSafe.cmp(s, best) >= 0) { best = s; bestI = i }
      i += 1
    }
    bestI
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("nearestCid", this,
        classOf[NearestCid].getName)
      s"${ev.value} = $ref.compute($v);"
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_cid"
}

/** Random-hyperplane LSH signature: `numBits` sign bits of v·r_p
  * packed into a long. The planes are pseudo-random but fully
  * deterministic from (seed, bit, dim) via a splitmix64 mix, so the
  * signature is stable across executors and runs with no broadcast
  * state — the property that lets the ANN bucketing shuffle stay a
  * plain groupBy at cluster scale.
  */
case class HyperplaneSig(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numBits >= 1 && numBits <= 64, s"numBits $numBits out of [1,64]")
  override def dataType: DataType = LongType
  private def et: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  @inline private def mix(z0: Long): Double = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < numBits) {
      var s = 0.0; var i = 0
      while (i < d) {
        s += VecKernels.get(arr, et, i) * mix(seed * 1000003L + b.toLong * 131071L + i)
        i += 1
      }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}

/** Johnson–Lindenstrauss projection kernel: the per-row form of
  * `Similarity.randomProject` with the SAME semantics (1e-6
  * fixed-point quantization via BigDecimal HALF_UP — bit-matching
  * Spark's `round` — then an integer dot with the md5-derived ±1
  * sign matrix), but the matrix rides the expression as ONE
  * reference object (the UnigramViterbi discipline) instead of
  * inDim×outDim plan literals or an explode-join. At production
  * widths this is a dense matvec in a tight primitive loop —
  * O(inDim·outDim) flops per row with no row-machinery per scalar,
  * where the joined form pays one join-row per (dim, out) product.
  * Values are IDENTICAL to both other paths (spec-pinned).
  */
case class JlProject(child: Expression, inDim: Int, outDim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(inDim >= 1 && outDim >= 1, s"bad dims in=$inDim out=$outDim")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def et: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  // JVM-wide memo, not a per-instance lazy val: every deserialized
  // task copy of this expression would otherwise recompute
  // inDim×outDim MD5 digests (131k at 1024→128) before its first row.
  @transient private lazy val signs: Array[Array[Long]] =
    JlProject.signMatrix(seed, inDim, outDim)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != inDim) throw new IllegalArgumentException(
      s"jl_project: vector of dimension $n, expected $inDim — ragged corpus")
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = java.math.BigDecimal
        .valueOf(VecKernels.get(arr, et, i) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val s = signs(j)
      var acc = 0L
      var d = 0
      while (d < n) { acc += q(d) * s(d); d += 1 }
      out(j) = acc
      j += 1
    }
    ArrayData.toArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "jl_project"
}

object JlProject {
  /** Sign matrices keyed by (seed, inDim, outDim) — one computation
    * per executor JVM regardless of how many task-deserialized
    * expression copies share the projection. A job uses a handful of
    * distinct projections, but a LONG-LIVED executor serving many
    * jobs would otherwise retain every matrix it ever built (a few
    * MB each, forever) — so the cache is CAPPED: past [[MaxCached]]
    * distinct projections it is cleared wholesale before admitting
    * the newcomer. Matrices are pure functions of the key, so a
    * post-clear miss merely recomputes (~ms); correctness is
    * unaffected and memory stays bounded at MaxCached matrices.
    */
  private val MaxCached = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Long]]]()

  private[functions] def signMatrix(seed: Long, inDim: Int,
                                    outDim: Int): Array[Array[Long]] = {
    val k = (seed, inDim, outDim)
    if (cache.size >= MaxCached && !cache.containsKey(k)) cache.clear()
    cache.computeIfAbsent(k, { key =>
      val (s, in, out) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(out) { j =>
        Array.tabulate(in) { d =>
          md.reset()
          val h = md.digest(s"jl_${s}_${d}_${j}".getBytes("UTF-8"))
          if ((h(0) >> 4 & 1) == 0) 1L else -1L
        }
      }
    })
  }
}
