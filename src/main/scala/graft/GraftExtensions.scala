package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-only activation of the engine's SQL functions: launching a
  * session (or a whole cluster) with
  * `--conf spark.sql.extensions=graft.GraftExtensions` injects the
  * native kernels (cosine_sim, dot_product, hyperplane_sig,
  * shingle_hash64, jaro_winkler) into every session's function
  * registry at build time — no call into the library needed. The same
  * builder table backs `functions.Register.all` for post-hoc
  * registration on an existing session (`Graft.sql`'s path), so the
  * two routes cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.Register.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
