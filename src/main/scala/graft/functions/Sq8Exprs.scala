package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Kernels for the SQ8 PERSISTED code column. `Similarity.sq8Quantize`
  * produces int8 codes as `array<long>` (the form the bit-exact DuckDB
  * oracle replays); the persisted index stores them PACKED as a
  * `binary` column — one byte per dimension, the honest version of the
  * "scan reads 1/4 the vector bytes" claim (an array<long> code column
  * would read 8 bytes per dim, twice the float vector it replaces).
  * Both kernels are exact integer arithmetic, so the indexed path is
  * bit-identical to the ad-hoc array form (SimilaritySpec pins it).
  */
private[graft] object Sq8Kernels {
  /** array<long> of int8-range codes → packed bytes. Out-of-range
    * codes fail LOUDLY: silent truncation (toByte) would corrupt every
    * dot product involving the row.
    */
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (v < -128L || v > 127L)
        throw new IllegalArgumentException(
          s"sq8 pack: code $v at dim $i outside int8 — not an sq8Quantize output")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** packed bytes → array<long> of int8 codes — [[pack]]'s exact
    * inverse (signed bytes widen losslessly), for maintenance paths
    * that must read code geometry back out of a persisted index.
    */
  def unpack(a: Array[Byte]): ArrayData = {
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i).toLong; i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Exact int64 dot product of two packed code vectors. Width
    * mismatch fails loudly — it means codes from two different
    * quantizations (different corpora/dims) were joined.
    */
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"sq8 dot: code width mismatch ${a.length} vs ${b.length} — " +
          "codes come from different quantizations")
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}

/** pack_int8(array<long>) → binary. Scan-stage codegen (static kernel
  * call, no boxing) — this is the index BUILD kernel, one pass over
  * the corpus.
  */
case class PackInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_int8 needs array<bigint> (sq8Quantize output), got $other")
    }
  override def nullSafeEval(v: Any): Any =
    Sq8Kernels.pack(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sq8Kernels.pack($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pack_int8"
}

/** unpack_int8(binary) → array<bigint> — [[PackInt8]]'s inverse, for
  * index-maintenance paths (partial rebuilds reconstruct member
  * geometry from the persisted codes instead of re-reading the float
  * corpus). Exact: signed bytes widen losslessly.
  */
case class UnpackInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unpack_int8 needs binary packed codes, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    Sq8Kernels.unpack(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sq8Kernels.unpack($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "unpack_int8"
}

/** sq8_dot(binary, binary) → bigint. The SERVE kernel: the ranking
  * scan reads only the packed code column and runs this inside
  * whole-stage codegen — exact integer arithmetic, same scores as the
  * array<long> zip_with/aggregate form.
  */
case class Sq8DotCodes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_dot needs (binary, binary) packed codes, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Kernels.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sq8Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sq8_dot"
}
