package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._

/** Column-level vector math for the similarity-search surface.
  * Two tiers:
  *  - HOF forms (`dotHof`, `cosineHof`): pure `functions._`
  *    compositions (zip_with/aggregate) — stay in whole-stage
  *    codegen, oracle-checkable, good default.
  *  - Native forms (`cosine`, `dot`, `hyperplaneSig`): custom
  *    Catalyst expressions over ArrayData (VecExprs.scala) for the
  *    brute-force top-k hot loop.
  */
object VecFns {

  /** zip_with + aggregate dot product (SURVEY.md §4.3's suggested
    * starting point). Element types are cast to double first.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column = {
    val denom = normHof(a) * normHof(b)
    when(denom === 0.0, 0.0).otherwise(dotHof(a, b) / denom)
  }

  /** Native-kernel forms — see VecExprs.scala. */
  def cosine(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))
  def dot(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))

  /** Fused argmin/argmax kernels over a literal cell matrix — one
    * expression instead of k inlined per-cell kernels; bit-identical
    * tie/NaN semantics to the array_min/array_max struct forms they
    * replace (see VecExprs.NearestCodeL2 / NearestCid).
    */
  def nearestCodeL2(v: Column, cents: Seq[Array[Float]]): Column =
    toCol(NearestCodeL2(toExpr(v), cents.map(_.toSeq)))
  def nearestCid(v: Column, cents: Seq[Array[Float]]): Column =
    toCol(NearestCid(toExpr(v), cents.map(_.toSeq)))

  /** numBits-bit random-hyperplane signature of a vector column. */
  def hyperplaneSig(v: Column, numBits: Int = 16, seed: Long = 42L): Column =
    toCol(HyperplaneSig(toExpr(v), numBits, seed))

  /** JL projection kernel (VecExprs.JlProject) — the per-row dense
    * matvec form of `Similarity.randomProject`, identical values.
    */
  def jlProject(v: Column, inDim: Int, outDim: Int, seed: Long): Column =
    toCol(JlProject(toExpr(v), inDim, outDim, seed))

  /** SQ8 code packing/serving kernels (Sq8Exprs.scala): int8 codes as
    * array<long> ↔ one-byte-per-dim binary, and the exact int64 dot
    * over the packed form — the persisted-index scan kernel.
    */
  def packInt8(codes: Column): Column = toCol(PackInt8(toExpr(codes)))
  def unpackInt8(bin: Column): Column = toCol(UnpackInt8(toExpr(bin)))
  def sq8Dot(a: Column, b: Column): Column = toCol(Sq8DotCodes(toExpr(a), toExpr(b)))

  /** L2-normalized copy of a vector (double elements); an all-zero
    * vector stays all-zero instead of dividing by zero. The norm
    * rides in as a zip_with lambda variable (array_repeat evaluates
    * it ONCE per row): referencing the aggregate composite inside the
    * element lambda would re-evaluate it per element — O(dim²) per
    * row, the SCALING.md HOF re-eval trap.
    */
  def l2Normalize(a: Column): Column = {
    val d = a.cast("array<double>")
    zip_with(d, array_repeat(normHof(a), size(d)), (x, n) =>
      when(n > 0.0, x / n).otherwise(x))
  }

  /** Matryoshka truncation: keep the first `dims` components and
    * re-normalize — the "small head of a big embedding" serving trick
    * (MRL-trained embeddings keep most of their retrieval quality at
    * a fraction of the dimensionality/cost). Pure per-row HOF math:
    * runs inside the scan stage at any corpus size.
    */
  def matryoshka(a: Column, dims: Int): Column =
    l2Normalize(slice(a.cast("array<double>"), 1, dims))
}
