package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-surface registration for the native vector kernels, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API — the engine is usable from pure SQL like the built-in
  * function library.
  */
object Register {
  def all(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "cosine_sim",
      es => CosineSim(es(0), es(1)))
    ColumnBridge.registerFunction(spark, "dot_product",
      es => DotProduct(es(0), es(1)))
    ColumnBridge.registerFunction(spark, "hyperplane_sig", es => {
      val bits = es.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(16)
      val seed = es.lift(2).map(_.eval().asInstanceOf[Number].longValue).getOrElse(42L)
      HyperplaneSig(es.head, bits, seed)
    })
    ColumnBridge.registerFunction(spark, "shingle_hash64", es => {
      val n = es.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(3)
      ShingleHash64(es.head, n)
    })
    ColumnBridge.registerFunction(spark, "jaro_winkler",
      es => JaroWinkler(es(0), es(1)))
  }
}
