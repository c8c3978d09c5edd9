package graft

import org.apache.spark.sql.functions._

/** The string frontend: query text in, DataFrame out. The oracle gate
  * already value-checks q127-q131; this spec pins the registration
  * semantics the gate cannot see.
  */
class GraftSqlSpec extends SparkSpec {

  test("sql() answers a query string over the registered tables") {
    val n = Graft.sql(spark, sfDir,
      "SELECT count(*) AS n FROM lineitem").head().getLong(0)
    assert(n == spark.read.parquet(s"$sfDir/lineitem.parquet").count())
  }

  test("native SQL functions are registered and agree with the Column API") {
    val viaSql = Graft.sql(spark, sfDir,
      """SELECT vec_id, round(dot_product(embedding, embedding), 4) AS d
         FROM embeddings ORDER BY vec_id LIMIT 10""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaCols = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        round(graft.functions.VecFns.dot(col("embedding"), col("embedding")), 4).as("d"))
      .orderBy("vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql == viaCols)
  }

  test("views rebind to the dir of the most recent call (single-schema catalog)") {
    val nSmall = Graft.sql(spark, sfDir,
      "SELECT count(*) AS n FROM documents").head().getLong(0)
    // registering the same dir again must be idempotent
    val again = Graft.sql(spark, sfDir,
      "SELECT count(*) AS n FROM documents").head().getLong(0)
    assert(nSmall == again && nSmall > 0)
  }

  test("query strings compile through Catalyst: pushdown reaches the scan") {
    val plan = Graft.sql(spark, sfDir,
      "SELECT p_partkey FROM part WHERE p_partkey = 7")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("p_partkey"),
      s"filter did not reach the parquet scan:\n$plan")
  }

  test("GraftExtensions injects every SQL function at session-build time") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    // apply the extensions object to a registry the way session build
    // does (config-only path: spark.sql.extensions=graft.GraftExtensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = FunctionRegistry.builtin.clone()
    org.apache.spark.sql.graftbridge.ColumnBridge
      .applyInjectedFunctions(ext, reg)
    Seq("cosine_sim", "dot_product", "hyperplane_sig",
      "shingle_hash64", "jaro_winkler").foreach { n =>
      assert(reg.functionExists(FunctionIdentifier(n)), s"missing $n")
    }
    // the injected builder yields a WORKING expression
    val e = reg.lookupFunction(FunctionIdentifier("jaro_winkler"),
      Seq(Literal("martha"), Literal("marhta")))
    assert(math.abs(e.eval().asInstanceOf[Double] - 0.9611) < 1e-3)
  }
}
