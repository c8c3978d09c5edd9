package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.functions._

/** Drives the entity-endpoint's HTTP transport against a live
  * in-process server (com.sun.net.httpserver — JDK built-in, no
  * egress): cursor enumeration via GET /shards, page bodies via
  * GET /page, with the pushed filters and row cap executed
  * SERVER-side. The servedRows counter proves pushdown reduces what
  * crosses the wire, not just what Spark keeps.
  */
class EndpointHttpSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val servedRows = new AtomicLong(0)

  /** JSONL fixture dir (2 shards of the part table). */
  private lazy val dataDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_spec").toString
    spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
      .coalesce(2).write.mode("overwrite").json(dir)
    dir
  }

  private def shardFiles: Seq[java.io.File] =
    new java.io.File(dataDir).listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".json")).sortBy(_.getName)

  private def readLines(f: java.io.File): Seq[String] = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toList finally src.close()
  }

  /** Server-side filter evaluation over a parsed JSONL row — the
    * "search" the endpoint executes before shipping a page.
    */
  private def rowPasses(node: JsonNode, filters: JsonNode): Boolean =
    filters.elements().asScala.forall { f =>
      val colName = f.get("col").asText()
      val v = node.get(colName)
      f.get("op").asText() match {
        case "notnull"  => v != null && !v.isNull
        case "contains" => v != null && !v.isNull &&
          v.asText().contains(f.get("v").asText())
        case "eq" => v != null && !v.isNull && jsonEq(v, f.get("v"))
        case "in" => v != null && !v.isNull &&
          f.get("vs").elements().asScala.exists(jsonEq(v, _))
        case other => sys.error(s"unknown op $other")
      }
    }

  private def jsonEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.asDouble() == b.asDouble()
    else a.asText() == b.asText()

  /** Server-side value comparison for ranked pages. Strings compare in
    * UTF-8 BYTE order — the conforming-server contract (the client
    * merges pages under Spark's UTF8String order; a server using
    * UTF-16 code-unit order could truncate away the true top row).
    */
  private def jsonCmp(a: JsonNode, b: JsonNode): Int =
    if (a.isNumber && b.isNumber) java.lang.Double.compare(a.asDouble(), b.asDouble())
    else if (a.isBoolean && b.isBoolean) java.lang.Boolean.compare(a.asBoolean(), b.asBoolean())
    else {
      val x = a.asText().getBytes("UTF-8"); val y = b.asText().getBytes("UTF-8")
      var i = 0
      var c = 0
      while (c == 0 && i < x.length && i < y.length) {
        c = (x(i) & 0xff) - (y(i) & 0xff); i += 1
      }
      if (c != 0) c else x.length - y.length
    }

  /** Ranked page: sort the (already filtered) rows by the order spec —
    * null placement ABSOLUTE per nullsFirst, value order flipped by
    * desc — and keep the first k.
    */
  private def rankRows(rows: Seq[String], orderJson: String, k: Int): Seq[String] = {
    val order = mapper.readTree(orderJson).elements().asScala.toSeq
    rows.map(l => (l, mapper.readTree(l))).sortWith { case ((_, x), (_, y)) =>
      val firstNonZero = order.iterator.map { o =>
        val colName = o.get("col").asText()
        val desc = o.get("desc").asBoolean()
        val nullsFirst = o.get("nullsFirst").asBoolean()
        val xv = Option(x.get(colName)).filterNot(_.isNull)
        val yv = Option(y.get(colName)).filterNot(_.isNull)
        (xv, yv) match {
          case (None, None)       => 0
          case (None, _)          => if (nullsFirst) -1 else 1
          case (_, None)          => if (nullsFirst) 1 else -1
          case (Some(u), Some(v)) =>
            val c = jsonCmp(u, v); if (desc) -c else c
        }
      }.find(_ != 0).getOrElse(0)
      firstNonZero < 0
    }.map(_._1).take(k)
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/shards", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, shardFiles
          .map(f => s"${f.getName}\t${readLines(f).size}").mkString("\n"))
    })
    s.createContext("/page", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, pageBody(query(ex)))
    })
    s.start()
    s
  }

  /** The conforming server's page logic: filter → limit → rank.
    * `flipRank = true` simulates a NONCONFORMING ranked server that
    * truncates by the OPPOSITE ordering (ships each page's bottom-k) —
    * the class of server the trustRankedPages gate defends against.
    */
  private def pageBody(q: Map[String, String], flipRank: Boolean = false): String = {
    val file = shardFiles.find(_.getName == q("shard"))
      .getOrElse(sys.error(s"unknown shard ${q("shard")}"))
    val start = q("start").toInt
    val len = q("len").toInt
    var rows = readLines(file).slice(start, start + len)
    q.get("filters").foreach { fj =>
      val parsed = mapper.readTree(fj)
      rows = rows.filter(l => rowPasses(mapper.readTree(l), parsed))
    }
    q.get("limit").map(_.toInt).filter(_ >= 0)
      .foreach(l => rows = rows.take(l))
    q.get("order").foreach { oj =>
      val oj2 = if (!flipRank) oj else {
        val arr = mapper.readTree(oj)
        arr.elements().asScala.foreach {
          case o: com.fasterxml.jackson.databind.node.ObjectNode =>
            o.put("desc", !o.get("desc").asBoolean); ()
          case _ => ()
        }
        mapper.writeValueAsString(arr)
      }
      rows = rankRows(rows, oj2, q("k").toInt)
    }
    servedRows.addAndGet(rows.size.toLong)
    rows.mkString("\n")
  }

  private def endpointHttp(pageSize: Int = 100, trustRanked: Boolean = false,
                           port: Int = server.getAddress.getPort) =
    spark.read.format("entity-endpoint")
      .option("url", s"http://127.0.0.1:$port")
      .option("schema",
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_retailprice DOUBLE")
      .option("pageSize", pageSize.toString)
      .option("trustRankedPages", trustRanked.toString)
      .load()

  private def parquetSide = spark.read.parquet(s"$sfDir/part.parquet")
    .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  test("HTTP full scan matches the parquet source row-for-row") {
    val viaHttp = endpointHttp().orderBy("p_partkey")
      .as[(Long, String, String, Double)].collect().toSeq
    val direct = parquetSide.orderBy("p_partkey")
      .as[(Long, String, String, Double)].collect().toSeq
    assert(viaHttp == direct)
    assert(viaHttp.nonEmpty)
  }

  test("pushed search filter executes on the server: fewer rows cross the wire") {
    val total = parquetSide.count()
    val expected = parquetSide.filter(col("p_name").contains("red"))
      .select("p_partkey", "p_name").as[(Long, String)].collect().toSeq.sorted
    servedRows.set(0)
    // no orderBy on the scan: a range-partitioned sort would sample
    // the source in an extra pass and double the wire count
    val got = endpointHttp().filter(col("p_name").contains("red"))
      .select("p_partkey", "p_name")
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == expected)
    // the server shipped exactly the matching rows, not the corpus
    assert(servedRows.get() == expected.size.toLong,
      s"server shipped ${servedRows.get()} rows for ${expected.size} matches")
    assert(servedRows.get() < total)
  }

  test("pushed limit caps transfer: page pruning + server-side truncation") {
    servedRows.set(0)
    val got = endpointHttp(pageSize = 100).limit(5).collect()
    assert(got.length == 5)
    // no filters: the scan plans only the first page per shard (2
    // shards) and each page body is truncated to 5 rows server-side
    assert(servedRows.get() <= 10L,
      s"server shipped ${servedRows.get()} rows for a limit-5 scan")
  }

  test("pushed COUNT(*) reads only the cursor headers: zero rows cross the wire") {
    val expected = parquetSide.count()
    servedRows.set(0)
    val got = endpointHttp(pageSize = 100).groupBy().count().as[Long].head()
    assert(got == expected)
    // the /shards enumeration already carries the per-shard totals —
    // no /page request is ever issued
    assert(servedRows.get() == 0L,
      s"count(*) pulled ${servedRows.get()} rows over the wire")
  }

  test("pushed MIN/MAX over HTTP equals the parquet extrema") {
    val expected = parquetSide.groupBy()
      .agg(min(col("p_retailprice")), max(col("p_retailprice")))
      .as[(Double, Double)].head()
    val q = endpointHttp(pageSize = 100, trustRanked = true).groupBy()
      .agg(min(col("p_retailprice")).as("lo"), max(col("p_retailprice")).as("hi"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedAggregates: [MIN(p_retailprice), MAX(p_retailprice)]"),
      s"min/max not pushed over HTTP:\n$plan")
    servedRows.set(0)
    assert(q.as[(Double, Double)].head() == expected)
    // each spec issues ONE ranked size-1 request per page: ≤ 2 specs ×
    // #pages rows cross the wire, never the corpus
    val total = parquetSide.count()
    val pages = (total + 99) / 100 + 2 // ceil per shard boundary slack
    assert(servedRows.get() <= 2 * pages,
      s"extrema pulled ${servedRows.get()} rows over the wire (corpus=$total)")
  }

  test("HTTP top-k equals the parquet ranked result, k rows per page on the wire") {
    val expected = parquetSide
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
      .as[(Long, String, String, Double)].collect().toSeq
    servedRows.set(0)
    val got = endpointHttp(trustRanked = true)
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
      .as[(Long, String, String, Double)].collect().toSeq
    assert(got == expected)
    // ranked pages truncate server-side: ≤ k rows per page request
    val total = parquetSide.count()
    val pages = (total + 99) / 100 + 2
    assert(servedRows.get() <= 3 * pages,
      s"top-k pulled ${servedRows.get()} rows over the wire (corpus=$total)")
  }

  test("default (untrusted) top-k never issues ranked requests and stays exact") {
    val expected = parquetSide
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
      .as[(Long, String, String, Double)].collect().toSeq
    servedRows.set(0)
    val got = endpointHttp()
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
      .as[(Long, String, String, Double)].collect().toSeq
    assert(got == expected)
    // full pages cross the wire (the price of trusting nothing): the
    // client sorts locally, so even a hostile ranker cannot matter
    assert(servedRows.get() == parquetSide.count(),
      s"untrusted top-k shipped ${servedRows.get()} rows, expected full pages")
  }

  test("default (untrusted) MIN/MAX folds in ONE page pass, not one per spec") {
    val expected = parquetSide.groupBy()
      .agg(min(col("p_retailprice")), max(col("p_retailprice")))
      .as[(Double, Double)].head()
    servedRows.set(0)
    val got = endpointHttp().groupBy()
      .agg(min(col("p_retailprice")).as("lo"), max(col("p_retailprice")).as("hi"))
      .as[(Double, Double)].head()
    assert(got == expected)
    // MIN+MAX share a single AggregatingReader pass: each page body
    // crosses the wire exactly once (2× would mean one fetch per spec)
    assert(servedRows.get() == parquetSide.count(),
      s"untrusted extrema shipped ${servedRows.get()} rows, expected one pass")
  }

  test("a nonconforming ranked server corrupts trusted top-k (the documented trade)" +
       " but not the default mode") {
    // this server truncates ranked pages by the OPPOSITE ordering —
    // each page ships its bottom-k
    val s3 = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s3.createContext("/shards", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, shardFiles
          .map(f => s"${f.getName}\t${readLines(f).size}").mkString("\n"))
    })
    s3.createContext("/page", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, pageBody(query(ex), flipRank = true))
    })
    s3.start()
    try {
      val truth = parquetSide
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
        .as[(Long, String, String, Double)].collect().toSeq
      // DEFAULT mode never sends an order parameter, so the hostile
      // ranker is never engaged: results stay exact
      val safe = endpointHttp(port = s3.getAddress.getPort)
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
        .as[(Long, String, String, Double)].collect().toSeq
      assert(safe == truth)
      // TRUSTED mode hands truncation to the server — against this one
      // the true top rows never cross the wire (every 100-row page
      // keeps only its bottom 3). This pins the documented failure
      // mode the opt-in accepts.
      val corrupted = endpointHttp(trustRanked = true, port = s3.getAddress.getPort)
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc).limit(3)
        .as[(Long, String, String, Double)].collect().toSeq
      assert(corrupted != truth,
        "a bottom-k ranker should corrupt trusted top-k; if this ever " +
          "passes exactly, the gate is no longer exercising the server")
    } finally s3.stop(0)
  }

  test("transient 5xx per page is retried: flaky server still yields exact results") {
    // fails the FIRST request for every distinct URI with a 503, then
    // serves conforming pages — the reference client's flaky-remote
    // world (it sleeps and retries; the transport backs off per page)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val s4 = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s4.createContext("/shards", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (seen.add("shards")) { ex.sendResponseHeaders(503, -1); ex.close() }
        else respond(ex, shardFiles
          .map(f => s"${f.getName}\t${readLines(f).size}").mkString("\n"))
    })
    s4.createContext("/page", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (seen.add(ex.getRequestURI.toString)) {
          ex.sendResponseHeaders(503, -1); ex.close()
        } else respond(ex, pageBody(query(ex)))
    })
    s4.start()
    try {
      val expected = parquetSide.filter(col("p_name").contains("red"))
        .select("p_partkey", "p_name").as[(Long, String)].collect().toSeq.sorted
      val got = spark.read.format("entity-endpoint")
        .option("url", s"http://127.0.0.1:${s4.getAddress.getPort}")
        .option("schema",
          "p_partkey BIGINT, p_name STRING, p_brand STRING, p_retailprice DOUBLE")
        .option("pageSize", "100")
        .option("retryBackoffMs", "1")
        .load()
        .filter(col("p_name").contains("red"))
        .select("p_partkey", "p_name")
        .as[(Long, String)].collect().toSeq.sorted
      assert(got == expected)
    } finally s4.stop(0)
  }

  test("a lying server cannot corrupt results: client re-verifies pushed filters") {
    // point a scan at a PERMISSIVE server route that ignores filters
    val s2 = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s2.createContext("/shards", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, shardFiles
          .map(f => s"${f.getName}\t${readLines(f).size}").mkString("\n"))
    })
    s2.createContext("/page", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = query(ex)
        val file = shardFiles.find(_.getName == q("shard")).get
        // ships the raw page, ignoring filters and limit entirely
        respond(ex, readLines(file)
          .slice(q("start").toInt, q("start").toInt + q("len").toInt)
          .mkString("\n"))
      }
    })
    s2.start()
    try {
      val expected = parquetSide.filter(col("p_brand") === "Brand#11").count()
      val got = spark.read.format("entity-endpoint")
        .option("url", s"http://127.0.0.1:${s2.getAddress.getPort}")
        .option("schema",
          "p_partkey BIGINT, p_name STRING, p_brand STRING, p_retailprice DOUBLE")
        .option("pageSize", "100").load()
        .filter(col("p_brand") === "Brand#11").count()
      assert(got == expected)
    } finally s2.stop(0)
  }
}
