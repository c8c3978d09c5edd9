package graft

import org.apache.spark.sql.functions._

class EntityEndpointSpec extends SparkSpec {
  import spark.implicits._

  private lazy val endpointDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_endpoint_spec").toString
    spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
      .coalesce(2).write.mode("overwrite").json(dir)
    dir
  }

  private def endpoint(pageSize: Int = 100) =
    spark.read.format("entity-endpoint")
      .option("path", endpointDir)
      .option("schema",
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_retailprice DOUBLE")
      .option("pageSize", pageSize.toString)
      .load()

  test("full scan matches the parquet source row-for-row") {
    val viaEndpoint = endpoint().orderBy("p_partkey")
      .as[(Long, String, String, Double)].collect().toSeq
    val direct = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
      .orderBy("p_partkey")
      .as[(Long, String, String, Double)].collect().toSeq
    assert(viaEndpoint == direct)
  }

  test("one input partition per page") {
    val total = spark.read.parquet(s"$sfDir/part.parquet").count()
    val parts = endpoint(pageSize = 100).rdd.getNumPartitions
    // shards are 2 files; each contributes ceil(lines/pageSize) pages
    assert(parts >= (total / 100).toInt && parts <= (total / 100).toInt + 2,
      s"expected ~${total / 100} pages, got $parts")
  }

  test("search filter and projection are pushed into the scan") {
    val q = endpoint().filter(col("p_name").contains("red")).select("p_partkey", "p_name")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [") && plan.contains("StringContains"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("p_retailprice"), s"projection not pruned:\n$plan")
    val expected = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_name").contains("red")).select("p_partkey", "p_name")
      .orderBy("p_partkey").as[(Long, String)].collect().toSeq
    assert(q.orderBy("p_partkey").as[(Long, String)].collect().toSeq == expected)
  }

  test("plain limit pushes down and prunes the page list") {
    val q = endpoint(pageSize = 100).limit(5)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedLimit: 5"), s"limit not pushed:\n$plan")
    assert(q.count() == 5)
    // with no filters the scan plans only the first page of each of
    // the 2 shards instead of ~total/pageSize pages
    assert(endpoint(pageSize = 100).limit(5).rdd.getNumPartitions <= 2)
  }

  test("order-by + limit pushes down as per-page top-k (ranked page shape)") {
    val q = endpoint().orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(3)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedTopN:"), s"topN not pushed:\n$plan")
    val viaEndpoint = q.as[(Long, String, String, Double)].collect().toSeq
    val direct = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
      .as[(Long, String, String, Double)].collect().toSeq
    assert(viaEndpoint == direct)
  }

  test("top-k composes with a pushed search filter") {
    val q = endpoint().filter(col("p_name").contains("red"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(4)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedTopN:") && plan.contains("StringContains"),
      s"filter+topN not both pushed:\n$plan")
    val direct = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
      .filter(col("p_name").contains("red"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(4)
      .as[(Long, String, String, Double)].collect().toSeq
    assert(q.as[(Long, String, String, Double)].collect().toSeq == direct)
  }

  test("pushed top-k on a string key uses UTF-8 byte order, not UTF-16 code units") {
    // U+FFFD (BMP, UTF-16 code unit 0xFFFD, UTF-8 bytes EF BF BD) vs
    // U+1F600 (supplementary, UTF-16 lead surrogate 0xD83D, UTF-8 bytes
    // F0 9F 98 80): UTF-16 code-unit order puts the emoji FIRST
    // (0xD83D < 0xFFFD) while Spark's UTF8String byte order puts it
    // LAST (F0 > EF). A page-local top-k in UTF-16 order would drop
    // U+FFFD from an ascending top-2 — the partial-pushdown superset
    // contract demands byte order.
    val dir = java.nio.file.Files.createTempDirectory("graft_endpoint_utf8").toString
    Seq((1L, "�"), (2L, new String(Character.toChars(0x1F600))), (3L, "A"))
      .toDF("id", "name").coalesce(1).write.mode("overwrite").json(dir)
    val q = spark.read.format("entity-endpoint")
      .option("path", dir)
      .option("schema", "id BIGINT, name STRING")
      .option("pageSize", "100")
      .load()
      .orderBy(col("name").asc, col("id").asc).limit(2)
    assert(q.queryExecution.executedPlan.toString().contains("PushedTopN:"))
    assert(q.as[(Long, String)].collect().toSeq.map(_._1) == Seq(3L, 1L),
      "page-local top-k dropped the row that wins under UTF8 byte order")
  }

  test("ungrouped COUNT(*) pushes down and is answered from page headers") {
    val q = endpoint(pageSize = 100).groupBy().count()
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedAggregates: [COUNT(*)]"),
      s"count not pushed:\n$plan")
    val expected = spark.read.parquet(s"$sfDir/part.parquet").count()
    assert(q.as[Long].collect().toSeq == Seq(expected))
    // unfiltered: ONE partial per shard (2 shard files), not per page —
    // the cursor enumeration's row counts are the whole answer
    val scan = endpoint(pageSize = 10).groupBy().count()
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }.get
    val parts = scan.toBatch.planInputPartitions().length
    assert(parts <= 2,
      s"unfiltered count planned $parts partitions (expected <= 2 shard headers)")
  }

  test("COUNT(*) over a pushed filter ships partial counts, not rows") {
    val q = endpoint().filter(col("p_name").contains("red")).groupBy().count()
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedAggregates: [COUNT(*)]") &&
      plan.contains("StringContains"),
      s"filtered count not pushed:\n$plan")
    val expected = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_name").contains("red")).count()
    assert(q.as[Long].collect().toSeq == Seq(expected))
  }

  test("page-local top-k honors ABSOLUTE null ordering on a desc key") {
    // regression: the page comparator used to negate the null branch
    // under desc, so desc_nulls_last put nulls FIRST page-locally and
    // a truncated page dropped real rows. Build a corpus where nulls
    // outnumber the page k so the bug cannot hide.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls_spec").toString
    val rows = (1L to 20L).map { i =>
      (i, if (i % 2 == 0) Some(i.toDouble) else None)
    }
    rows.toDF("id", "score").coalesce(1).write.mode("overwrite").json(dir)
    val ep = spark.read.format("entity-endpoint")
      .option("path", dir)
      .option("schema", "id BIGINT, score DOUBLE")
      .option("pageSize", "5")
      .load()
    val got = ep.orderBy(col("score").desc_nulls_last, col("id").asc).limit(3)
      .select("id").as[Long].collect().toSeq
    val expected = rows.toDF("id", "score")
      .orderBy(col("score").desc_nulls_last, col("id").asc).limit(3)
      .select("id").as[Long].collect().toSeq
    assert(got == expected,
      s"got $got, expected $expected — nulls crowded out real rows page-locally")
  }

  test("ungrouped MIN/MAX push down as per-page partial-extrema rows") {
    val q = endpoint(pageSize = 100).groupBy()
      .agg(min(col("p_retailprice")).as("lo"), max(col("p_retailprice")).as("hi"),
        count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedAggregates: [MIN(p_retailprice), " +
      "MAX(p_retailprice), COUNT(*)]"), s"min/max not pushed:\n$plan")
    val src = spark.read.parquet(s"$sfDir/part.parquet")
    val expected = src.groupBy()
      .agg(min(col("p_retailprice")), max(col("p_retailprice")), count(lit(1)))
      .as[(Double, Double, Long)].collect().toSeq
    assert(q.as[(Double, Double, Long)].collect().toSeq == expected)
  }

  test("MIN/MAX over strings merge under UTF8 binary order, with filters") {
    val q = endpoint().filter(col("p_name").contains("red")).groupBy()
      .agg(min(col("p_name")).as("lo"), max(col("p_name")).as("hi"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedAggregates: [MIN(p_name), MAX(p_name)]") &&
      plan.contains("StringContains"), s"filtered min/max not pushed:\n$plan")
    val expected = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_name").contains("red")).groupBy()
      .agg(min(col("p_name")), max(col("p_name")))
      .as[(String, String)].collect().toSeq
    assert(q.as[(String, String)].collect().toSeq == expected)
  }

  test("MIN over an all-filtered endpoint is null and COUNT is 0") {
    val q = endpoint().filter(col("p_brand") === "NO#SUCH").groupBy()
      .agg(min(col("p_retailprice")).as("lo"), count(lit(1)).as("n"))
    val rows = q.collect()
    assert(rows.length == 1 && rows(0).isNullAt(0) && rows(0).getLong(1) == 0L)
  }

  test("COUNT(*) does not push past a residual (non-pushable) filter") {
    val q = endpoint().filter(col("p_retailprice") > 900.0).groupBy().count()
    val plan = q.queryExecution.executedPlan.toString()
    assert(!plan.contains("PushedAggregates"),
      s"count pushed despite residual filter:\n$plan")
    val expected = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_retailprice") > 900.0).count()
    assert(q.as[Long].collect().toSeq == Seq(expected))
  }

  test("equality and IN filters evaluate server-side with residuals left to Spark") {
    val q = endpoint()
      .filter(col("p_brand") === "Brand#11" && col("p_retailprice") > 900.0)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("EqualTo(p_brand,Brand#11)"), s"equality not pushed:\n$plan")
    val expected = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_brand") === "Brand#11" && col("p_retailprice") > 900.0)
      .count()
    assert(q.count() == expected)
  }
}
