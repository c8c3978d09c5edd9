package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-surface registration for the native vector kernels, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API — the engine is usable from pure SQL like the built-in
  * function library. Two registration paths share one builder table:
  * [[all]] registers on an existing session (what `Graft.sql` calls),
  * and [[graft.GraftExtensions]] injects the same functions at
  * session build time via `spark.sql.extensions` — the config-only
  * path a cluster operator uses, no code access required.
  */
object Register {

  /** name → Catalyst expression builder, shared by both paths. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "hyperplane_sig" -> (es => {
      val bits = es.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(16)
      val seed = es.lift(2).map(_.eval().asInstanceOf[Number].longValue).getOrElse(42L)
      HyperplaneSig(es.head, bits, seed)
    }),
    "shingle_hash64" -> (es => {
      val n = es.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(3)
      ShingleHash64(es.head, n)
    }),
    "jaro_winkler" -> (es => JaroWinkler(es(0), es(1))))

  def all(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}
