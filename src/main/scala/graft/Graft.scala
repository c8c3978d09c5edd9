package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The string entry point: a query string in, rows out — the
  * reference's entire user interface is this shape
  * (/root/reference/query_opentargets.py:4-16 hands a query string to
  * the endpoint and returns rows). Here the query language is Spark
  * SQL over the registered corpus tables plus the engine's native SQL
  * functions (`functions.Register`: cosine_sim, dot_product,
  * hyperplane_sig, shingle_hash64), so a user can drive the engine
  * without touching the Scala combinator API.
  *
  * Scale shape: `sql` is pure planning — the string compiles through
  * Catalyst into exactly the same optimized plans as the Column API
  * (pushdown, pruning, AQE all apply), and the registered views are
  * plain parquet scans. Nothing here executes on the driver.
  *
  * Registration is per (session, dir): views bind to the dir passed
  * in, so the last `sql`/`register` call in a session decides what
  * the table names point at — same contract as any SQL catalog with
  * one active schema.
  */
object Graft {
  /** The harness corpus tables, in FIXTURES.md order. */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the corpus tables under `dir` as temp views plus the
    * engine's SQL functions. Idempotent; cheap (no data touched).
    */
  def register(spark: SparkSession, dir: String): Unit = {
    functions.Register.all(spark)
    val tables = Tables(spark, dir)
    TableNames.foreach { n =>
      val df = n match {
        case "region"     => tables.region
        case "nation"     => tables.nation
        case "customer"   => tables.customer
        case "supplier"   => tables.supplier
        case "part"       => tables.part
        case "orders"     => tables.orders
        case "lineitem"   => tables.lineitem
        case "events"     => tables.events
        case "documents"  => tables.documents
        case "embeddings" => tables.embeddings
      }
      df.createOrReplaceTempView(n)
    }
  }

  /** Evaluate `query` against the corpus at `dir`. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }

  /** Evaluate a GraphQL-dialect query (the reference's query language
    * — api.GraphQl documents the supported subset) against the
    * knowledge-graph views over the corpus at `dir`. One row out: the
    * GraphQL `data` object as a nested Spark schema.
    */
  def graphql(spark: SparkSession, dir: String, query: String): DataFrame =
    api.GraphQl.execute(api.KnowledgeGraph(spark, dir), query)

  /** [[graphql]] rendered as the JSON `data` object — the reference's
    * actual return type (`query_opentargets.py` returns the parsed
    * JSON response and pretty-prints it). Returns the JSON text, or
    * None when the root entity does not exist (GraphQL's null data).
    */
  def graphqlJson(spark: SparkSession, dir: String, query: String): Option[String] = {
    val df = graphql(spark, dir, query)
    val cols = df.columns.map(org.apache.spark.sql.functions.col)
    df.select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(cols: _*)).as("json"))
      .collect().headOption.map(_.getString(0))
  }
}
