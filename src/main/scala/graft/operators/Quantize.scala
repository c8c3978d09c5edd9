package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/serving compression step
  * of an embedding pipeline (4× smaller vectors for the ANN index,
  * with a measurable reconstruction error).
  *
  * Symmetric per-vector scheme: scale = max|v|/127, q_i =
  * round(v_i/scale), dequant = q_i·scale. Everything is codegen'd
  * array higher-order functions over the vector column — per-row
  * work, no shuffle, no UDF — so quantization runs inside the scan
  * stage at any corpus size. `round` is spelled floor(x+0.5) to pin
  * half-way behavior to one rule across engines (JVM rint would
  * banker's-round, SQL engines vary).
  */
object Quantize {

  /** Input float vector as double array (quantization math happens in
    * double on every engine, so parity holds).
    */
  private def dbl(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Per-vector symmetric int8 scale: max|v| / 127. Zero vectors get
    * scale 0 and quantize to all-zeros (guarded in the error form).
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(dbl(vec), x => abs(x))) / lit(127.0)

  /** Quantized int8 codes. The scale rides in as a zip_with lambda
    * variable (array_repeat evaluates it ONCE per row); referencing
    * the array_max composite directly inside the element lambda would
    * re-evaluate it per element — the SCALING.md HOF re-eval trap,
    * O(dim²) per row.
    */
  def int8Codes(vec: Column): Column =
    zip_with(dbl(vec), array_repeat(int8Scale(vec), size(vec)), (x, s) =>
      when(s > 0, floor(x / s + lit(0.5))).otherwise(lit(0.0)).cast("int"))

  /** Mean absolute reconstruction error |v - dequant(quant(v))| of one
    * vector. The scale is computed once per row by riding in the
    * aggregate ACCUMULATOR (a lambda variable): referencing the
    * array_max composite inside the per-element lambda re-evaluates
    * it on every element — O(dim²) per row, measured 4.5 s → 0.6 s
    * for the sf0.1 report when fixed.
    */
  def int8MeanError(vec: Column): Column = {
    val errSum = aggregate(dbl(vec),
      struct(int8Scale(vec).as("s"), lit(0.0).as("sum")),
      (acc, x) => {
        val s = acc.getField("s")
        struct(s.as("s"),
          (acc.getField("sum") +
            when(s > 0, abs(x - floor(x / s + lit(0.5)) * s))
              .otherwise(lit(0.0))).as("sum"))
      },
      acc => acc.getField("sum"))
    errSum / size(vec).cast("double")
  }

  /** Per-label quantization report over an embedding table: average
    * reconstruction error, worst-case scale, vector count.
    */
  def int8Report(embeddings: DataFrame, labelName: String,
                 vecName: String): DataFrame =
    embeddings
      .select(col(labelName).as("label"),
        int8Scale(col(vecName)).as("scale"),
        int8MeanError(col(vecName)).as("mean_err"))
      .groupBy(col("label"))
      .agg(round(avg(col("mean_err")), 6).as("avg_err"),
        round(max(col("scale")), 6).as("max_scale"),
        count(lit(1)).as("n"))
}
