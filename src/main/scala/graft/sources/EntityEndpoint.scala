package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringContains}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S5 as a real Spark source: a DataSourceV2 connector modeling the
  * reference's paginated REST/GraphQL entity endpoint
  * (/root/reference/query_opentargets.py:4-16,
  * opentargets_client_api.py:53-104 — one page request per loop
  * iteration, search string and field selection sent server-side).
  *
  * {{{
  * spark.read.format("entity-endpoint")
  *   .option("path", endpointDir)               // JSONL-dir transport
  *   // or .option("url", "http://host:port")   // HTTP transport
  *   .option("schema", "id BIGINT, name STRING") // the entity type
  *   .option("pageSize", "500")                  // rows per request
  *   .load()
  * }}}
  *
  * What the connector pushes INTO each page request — exactly what
  * the reference sends in its GraphQL query string:
  *  - filters: equality / IN / string-contains (the `search` verb),
  *    via SupportsPushDownFilters;
  *  - field selection, via SupportsPushDownRequiredColumns;
  *  - limit and order-by-score top-k (the endpoint's `size`/ranked
  *    page shape, opentargets.schema:263-265,1047-1050), via
  *    SupportsPushDownLimit / SupportsPushDownTopN: each page request
  *    returns at most k rows (the per-page top-k by the pushed
  *    ordering), and a plain limit with no filters also prunes the
  *    page list itself — Spark keeps the global top, the transport
  *    stops shipping rows that cannot survive it;
  *  - ungrouped COUNT(*), via SupportsPushDownAggregates: the
  *    endpoint precomputes totals (opentargets.schema:14,959), so an
  *    unfiltered count is answered from the cursor enumeration's
  *    per-shard row counts with no page fetch at all, and a filtered
  *    count ships one partial-count row per page instead of bodies;
  *  - ungrouped MIN/MAX (optionally mixed with COUNT(*)): the ranked
  *    endpoint's ordered-page size=1 shape — each page collapses to
  *    one partial-extrema row at the source boundary and Spark merges
  *    the partials (see [[EndpointAggScan]]).
  * Each Spark input partition is ONE page, so page fetches
  * parallelize across executors instead of the reference's
  * one-request-per-second client loop.
  *
  * Transports (see [[PageTransport]]):
  *  - [[FileTransport]]: a JSONL directory; pages are line slices.
  *  - [[HttpTransport]]: a live HTTP endpoint (java.net.http) with
  *    `GET /shards` for cursor enumeration and `GET /page` carrying
  *    start/len plus the pushed filters and row cap as query
  *    parameters — the server executes the search and ships only
  *    surviving rows. Transient failures (connect/read errors, 429,
  *    5xx) are retried with bounded exponential backoff — the
  *    reference client's tolerate-a-flaky-remote behavior
  *    (/root/reference/x2.2.py:297-299), minus the fixed sleep.
  *
  * TRUST MODEL, by pushdown path:
  *  - ROW paths (filters, plain limit): every arriving row is
  *    re-verified client-side — a permissive or lying server cannot
  *    corrupt results, it can only waste transfer.
  *  - Pushed COUNT(*): takes the server's counts at face value (no
  *    rows cross the wire to re-verify) — see [[EndpointScanBuilder
  *    .pushAggregation]].
  *  - RANKED truncation (server-side top-k pages for pushed TopN /
  *    extrema): a server that ranks with different semantics decides
  *    which rows the client never sees, so ranked page requests are
  *    gated behind `.option("trustRankedPages", true)`. Default off:
  *    the client fetches full (filtered) pages and sorts/folds
  *    locally — correct against ANY server, at full transfer cost.
  * The planning, pushdown, and partitioning layers are shared; the
  * spec drives the HTTP path against an in-process server, including
  * a nonconforming-ranked-server case pinning the gate's semantics.
  */
class EntityEndpoint extends TableProvider with DataSourceRegister {
  override def shortName(): String = "entity-endpoint"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType.fromDDL(Option(options.get("schema")).getOrElse(
      throw new IllegalArgumentException(
        "entity-endpoint requires a 'schema' option (DDL string)")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val transport = (Option(properties.get("url")), Option(properties.get("path"))) match {
      case (Some(url), _) => HttpTransport(url,
        maxRetries = Option(properties.get("maxRetries")).map(_.toInt).getOrElse(3),
        retryBackoffMs = Option(properties.get("retryBackoffMs")).map(_.toLong).getOrElse(200L))
      case (None, Some(path)) => FileTransport(path)
      case _ => throw new IllegalArgumentException(
        "entity-endpoint requires a 'path' (JSONL dir) or 'url' (HTTP) option")
    }
    new EndpointTable(schema, transport,
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(1000),
      trustRanked = Option(properties.get("trustRankedPages")).exists(_.toBoolean))
  }
}

object EntityEndpoint {
  /** The endpoint's shard files (a real API's cursor streams). */
  def listShards(path: String): Seq[String] = {
    val f = new java.io.File(path)
    require(f.exists(), s"entity-endpoint path does not exist: $path")
    val files =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .filter(x => x.isFile && (x.getName.endsWith(".json") || x.getName.endsWith(".jsonl")))
    files.map(_.getAbsolutePath).sorted
  }

  /** Rows per shard — the stub for the API's HEAD `total` field. */
  def lineCount(file: String): Long = {
    val src = scala.io.Source.fromFile(file, "UTF-8")
    try src.getLines().count(_.nonEmpty) finally src.close()
  }

  /** Wire encoding of the pushed filters, shared by the HTTP client
    * and any conforming server: a JSON array of {op, col, v | vs}.
    */
  def filtersToJson(filters: Array[Filter]): String = {
    val m = new ObjectMapper()
    val arr = m.createArrayNode()
    filters.foreach {
      case EqualTo(a, v) =>
        val n = arr.addObject(); n.put("op", "eq"); n.put("col", a)
        n.set("v", m.valueToTree[JsonNode](v)); ()
      case In(a, vs) =>
        val n = arr.addObject(); n.put("op", "in"); n.put("col", a)
        n.set("vs", m.valueToTree[JsonNode](vs)); ()
      case StringContains(a, v) =>
        val n = arr.addObject(); n.put("op", "contains"); n.put("col", a)
        n.put("v", v); ()
      case IsNotNull(a) =>
        val n = arr.addObject(); n.put("op", "notnull"); n.put("col", a); ()
      case other => throw new IllegalArgumentException(
        s"entity-endpoint: unsupported pushed filter $other")
    }
    m.writeValueAsString(arr)
  }

  /** Wire encoding of a ranked-page ordering: JSON array of
    * {col, desc, nullsFirst}, shared by the HTTP client and any
    * conforming server (the reference endpoint's "search results
    * ordered by score" shape).
    */
  def orderToJson(order: Seq[PageOrder]): String = {
    val m = new ObjectMapper()
    val arr = m.createArrayNode()
    order.foreach { o =>
      val n = arr.addObject()
      n.put("col", o.col); n.put("desc", o.desc)
      n.put("nullsFirst", o.nullsFirst); ()
    }
    m.writeValueAsString(arr)
  }
}

/** One key of a ranked-page ordering, transport-level (plain strings —
  * the connector SortOrder never crosses into the wire layer).
  */
private[sources] final case class PageOrder(col: String, desc: Boolean,
                                            nullsFirst: Boolean)
private[sources] object PageOrder {
  /** The pushed TopN orders, when every key is a plain top-level
    * column (the only shape pushTopN accepts).
    */
  def fromSortOrders(orders: Array[SortOrder]): Seq[PageOrder] =
    orders.toSeq.map { so =>
      PageOrder(so.expression().asInstanceOf[NamedReference].fieldNames()(0),
        so.direction() == SortDirection.DESCENDING,
        so.nullOrdering() == NullOrdering.NULLS_FIRST)
    }
}

/** How shard metadata and page bodies reach the scan. Instances ship
  * to executors inside input partitions, so they carry only small
  * config (a path or URL) and build any connection state lazily.
  */
private[sources] sealed trait PageTransport extends Serializable {
  /** (shardId, rowCount) pairs — the API's cursor enumeration. */
  def shards(): Seq[(String, Long)]

  /** One page request: the JSONL rows [start, start+len) of `shard`.
    * Transports that can execute the pushed `filters` / `serverLimit`
    * server-side ship only surviving rows; the reader re-verifies
    * regardless, so this is purely a transfer-volume optimization.
    */
  def fetchPage(shard: String, start: Long, len: Long,
                filters: Array[Filter], serverLimit: Int): Iterator[String]

  /** One RANKED page request: the first k of the page's passing rows
    * under `order` — the endpoint's "results ordered by score,
    * size=k" response body. The default ships the full (filtered)
    * page, so transports without ranked-page support stay correct and
    * the override is purely a transfer-volume optimization; the
    * reader re-sorts and re-truncates whatever arrives either way.
    *
    * TRUST MODEL: unlike plain filters (where the client re-verifies
    * every arriving row), a server that truncates to k decides which
    * rows the client never sees — a lying ranked server CAN corrupt a
    * top-k or extrema result, exactly as a lying `total` header
    * corrupts a pushed COUNT(*). A conforming server must filter
    * FIRST, then rank with Spark's ordering semantics (strings in
    * UTF-8 byte order), then truncate.
    */
  def fetchPageTopK(shard: String, start: Long, len: Long,
                    filters: Array[Filter], order: Seq[PageOrder],
                    k: Int): Iterator[String] =
    fetchPage(shard, start, len, filters, -1)

  /** True when [[fetchPageTopK]] actually truncates server-side.
    * Drives two decisions upstream: ranked requests are only worth
    * ISSUING against such a transport (and only when the user opted
    * into trusting them), and the pure-extrema pushdown only splits
    * into per-spec size-1 requests when each request is genuinely one
    * row — on a full-page fallback that split would fetch and parse
    * the page once PER SPEC.
    */
  def supportsRankedPages: Boolean = false

  def describe: String
}

/** JSONL-directory transport: pages are line slices of shard files. */
private[sources] final case class FileTransport(path: String) extends PageTransport {
  override def shards(): Seq[(String, Long)] =
    EntityEndpoint.listShards(path).map(f => f -> EntityEndpoint.lineCount(f))

  override def fetchPage(shard: String, start: Long, len: Long,
                         filters: Array[Filter], serverLimit: Int): Iterator[String] = {
    // line-index addressing caps a shard at 2^31 lines; the HTTP
    // transport pages by cursor and has no such bound
    require(start + len <= Int.MaxValue,
      s"entity-endpoint file transport: shard $shard exceeds 2^31 lines")
    val src = scala.io.Source.fromFile(shard, "UTF-8")
    try src.getLines().filter(_.nonEmpty)
      .slice(start.toInt, (start + len).toInt).toList.iterator
    finally src.close()
  }

  override def describe: String = s"path=$path"
}

/** Live HTTP transport (java.net.http — JDK built-in):
  *  - `GET {url}/shards` → lines of `shardId<TAB>rowCount`;
  *  - `GET {url}/page?shard=&start=&len=&filters=&limit=` → JSONL
  *    body of the page's surviving rows.
  * The pushed filters ride along as a JSON query parameter
  * ([[EntityEndpoint.filtersToJson]]) — the server executes the
  * search, exactly the reference's GraphQL `search` verb. One
  * HttpClient per JVM (transient lazy: rebuilt after serialization to
  * an executor).
  */
private[sources] object HttpTransport {
  /** ONE client per JVM: the transport deserializes per task, and an
    * HttpClient owns a selector thread + connection pool that cannot
    * be closed before JDK 21 — per-task clients would leak threads
    * and defeat keep-alive reuse across page fetches.
    */
  lazy val sharedClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
}

private[sources] final case class HttpTransport(url: String,
                                                maxRetries: Int = 3,
                                                retryBackoffMs: Long = 200L)
    extends PageTransport {
  private def client = HttpTransport.sharedClient

  /** GET with bounded retry: page requests are idempotent reads, so a
    * connect/read failure, a 429, or a 5xx is retried up to
    * `maxRetries` times with exponential backoff (base
    * `retryBackoffMs`, doubling per attempt). Non-retryable statuses
    * (4xx other than 429) and exhausted retries surface the original
    * error. This is the reference client's flaky-remote tolerance
    * (x2.2.py:297-299 sleeps and retries the whole request) expressed
    * per-page, so one bad response costs one page's backoff rather
    * than failing a thousand-page scan.
    */
  private def get(uri: String): String = {
    var attempt = 0
    while (true) {
      val err: Throwable =
        try {
          val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
            .timeout(java.time.Duration.ofSeconds(60))
            .GET().build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => return resp.body()
            case s if s == 429 || s >= 500 =>
              new java.io.IOException(s"entity-endpoint HTTP $s from $uri")
            case s => throw new IllegalArgumentException(
              s"entity-endpoint HTTP $s from $uri")
          }
        } catch {
          // connect refused/reset, read timeout — transient by nature
          case e: java.io.IOException => e
        }
      if (attempt >= maxRetries) throw err
      Thread.sleep(retryBackoffMs << attempt)
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  override def shards(): Seq[(String, Long)] =
    get(s"$url/shards").split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val Array(id, n) = line.split('\t')
      id -> n.toLong
    }

  override def fetchPage(shard: String, start: Long, len: Long,
                         filters: Array[Filter], serverLimit: Int): Iterator[String] = {
    val enc = java.net.URLEncoder.encode(_: String, "UTF-8")
    val fparam =
      if (filters.isEmpty) ""
      else s"&filters=${enc(EntityEndpoint.filtersToJson(filters))}"
    val lparam = if (serverLimit >= 0) s"&limit=$serverLimit" else ""
    get(s"$url/page?shard=${enc(shard)}&start=$start&len=$len$fparam$lparam")
      .split('\n').iterator.filter(_.nonEmpty)
  }

  /** Ranked page over the wire: `order` and `k` ride as query
    * parameters and the server ships only the page's top k passing
    * rows (see the trait's trust note).
    */
  override def fetchPageTopK(shard: String, start: Long, len: Long,
                             filters: Array[Filter], order: Seq[PageOrder],
                             k: Int): Iterator[String] = {
    val enc = java.net.URLEncoder.encode(_: String, "UTF-8")
    val fparam =
      if (filters.isEmpty) ""
      else s"&filters=${enc(EntityEndpoint.filtersToJson(filters))}"
    val oparam = s"&order=${enc(EntityEndpoint.orderToJson(order))}&k=$k"
    get(s"$url/page?shard=${enc(shard)}&start=$start&len=$len$fparam$oparam")
      .split('\n').iterator.filter(_.nonEmpty)
  }

  override def supportsRankedPages: Boolean = true

  override def describe: String = s"url=$url"
}

private[sources] class EndpointTable(tableSchema: StructType,
                                     transport: PageTransport, pageSize: Int,
                                     trustRanked: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"entity-endpoint(${transport.describe})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EndpointScanBuilder(tableSchema, transport, pageSize, trustRanked)
}

private[sources] class EndpointScanBuilder(fullSchema: StructType,
                                           transport: PageTransport, pageSize: Int,
                                           trustRanked: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Int = -1
  private var topN: Array[SortOrder] = Array.empty
  private var countPushed: Boolean = false

  private def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: In | _: StringContains | _: IsNotNull => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(supported)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Plain limit: every page request caps its row count at the limit
    * (partial push — Spark still takes the global first-N).
    */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** Ranked page: order-by + limit becomes per-page top-k, the
    * endpoint's native "search results ordered by score, size=k"
    * shape. Only top-level single-column orderings are accepted —
    * anything else stays a Spark-side sort (partial push semantics
    * keep the global TopN exact either way).
    */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    val allSimple = orders.nonEmpty && orders.forall(_.expression() match {
      case f: NamedReference => f.fieldNames().length == 1 &&
        fullSchema.fieldNames.contains(f.fieldNames()(0))
      case _ => false
    })
    if (allSimple) { topN = orders; limit = l; true } else false
  }
  override def isPartiallyPushed(): Boolean = true

  /** Ungrouped COUNT(*) — the endpoint's precomputed `total` header
    * (the reference's server returns row counts alongside every page
    * list, opentargets.schema:14,959): with no filters the answer is
    * the sum of the cursor enumeration's shard counts and NO page
    * body is ever fetched; with pushed filters each page ships one
    * partial count instead of its rows. Partial-push contract
    * (supportCompletePushDown stays false): Spark sums the per-
    * partition partials. TRUST MODEL: this path takes the server's
    * counts at face value — that is the point of the pushdown (no
    * rows cross the wire to re-verify). The connector's client-side
    * re-verification guarantees apply to the ROW paths (filter
    * residuals, top-k reorder), not to pushed-down aggregates; a
    * server that lies about counts yields a wrong COUNT(*), exactly
    * as a parquet footer that lies about row counts would.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (limit >= 0 || topN.nonEmpty ||
        aggregation.groupByExpressions().nonEmpty ||
        aggregation.aggregateExpressions().isEmpty) return false
    val exprs = aggregation.aggregateExpressions()
    if (exprs.length == 1 && exprs(0).isInstanceOf[CountStar]) {
      countPushed = true
      return true
    }
    // ungrouped MIN/MAX (optionally mixed with COUNT(*)): each page
    // collapses to ONE partial-aggregate row at the source boundary —
    // the ordered-page `size=1` read of a ranked endpoint — and
    // Spark's final aggregate merges the partials (MIN of mins, MAX
    // of maxes, SUM of counts). Partial-push only, so a page that
    // contains no passing rows contributes nulls / zero harmlessly.
    def simpleCol(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        fullSchema.fields.find(_.name == f.fieldNames()(0))
      case _ => None
    }
    val specs = exprs.toSeq.map {
      case _: CountStar => Some(EndpointAggSpec.CountAll)
      case m: Min => simpleCol(m.column()).map(EndpointAggSpec.MinOf)
      case m: Max => simpleCol(m.column()).map(EndpointAggSpec.MaxOf)
      case _ => None
    }
    if (specs.forall(_.isDefined)) { aggSpecs = specs.flatten; true }
    else false
  }
  private var aggSpecs: Seq[EndpointAggSpec] = Seq.empty

  override def build(): Scan = {
    // ranked server-side truncation is only issued when the transport
    // actually truncates AND the user opted into trusting its ranking
    // semantics (see the TRUST MODEL in the class doc)
    val useRanked = trustRanked && transport.supportsRankedPages
    if (countPushed)
      new EndpointCountScan(fullSchema, pushed, transport, pageSize)
    else if (aggSpecs.nonEmpty)
      new EndpointAggScan(fullSchema, aggSpecs, pushed, transport, pageSize,
        useRanked)
    else
      new EndpointScan(fullSchema, required, pushed, transport, pageSize,
        limit, topN, useRanked)
  }
}

private[sources] class EndpointScan(fullSchema: StructType, required: StructType,
                                    filters: Array[Filter],
                                    transport: PageTransport, pageSize: Int,
                                    limit: Int, topN: Array[SortOrder],
                                    useRanked: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"entity-endpoint ${transport.describe} pageSize=$pageSize " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      (if (limit >= 0 && topN.isEmpty) s"PushedLimit: $limit, " else "") +
      (if (topN.nonEmpty) s"PushedTopN: [${topN.mkString(", ")}] limit=$limit, "
       else "") +
      s"ReadSchema: ${required.catalogString}"

  /** One input partition per page per shard: the planner's analogue
    * of enumerating the cursor up front so every page request runs in
    * parallel (the reference walks them serially at 1 rps).
    *
    * A pushed plain limit with no server-side filters also prunes the
    * page list: only the first ceil(limit/pageSize) pages of each
    * shard can contribute to the global first-N (each shard still
    * offers at least min(shardRows, limit) rows, so the global limit
    * is never starved). With filters — or a top-k ordering — every
    * page must be consulted, and only the per-page row cap applies.
    */
  override def planInputPartitions(): Array[InputPartition] =
    transport.shards().flatMap { case (shard, n0) =>
      val n = if (limit >= 0 && filters.isEmpty && topN.isEmpty)
        math.min(n0, limit.toLong) else n0
      (0L until n by pageSize.toLong).map { start =>
        EndpointPage(shard, start, math.min(pageSize.toLong, n - start))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new EndpointReaderFactory(fullSchema, required, filters, transport, limit,
      topN, useRanked)
}

private[sources] case class EndpointPage(shard: String, start: Long, len: Long)
    extends InputPartition

/** A header-derived partial count — no page body behind it. */
private[sources] case class EndpointHeaderCount(n: Long) extends InputPartition

/** COUNT(*) pushed into the endpoint. Unfiltered: one partition per
  * shard carrying the header row count (zero page fetches — the
  * cursor enumeration IS the answer). Filtered: one partition per
  * page shipping a single partial-count row instead of the page body.
  * Spark's final aggregate sums the partials (partial-push contract),
  * and the filtered path re-verifies rows client-side exactly like
  * the row scan — a lying server still cannot corrupt the count.
  */
private[sources] class EndpointCountScan(fullSchema: StructType,
                                         filters: Array[Filter],
                                         transport: PageTransport, pageSize: Int)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"entity-endpoint ${transport.describe} " +
      s"PushedAggregates: [COUNT(*)], " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val parts: Array[InputPartition] =
      if (filters.isEmpty)
        transport.shards().map { case (_, n) =>
          EndpointHeaderCount(n): InputPartition
        }.toArray
      else
        transport.shards().flatMap { case (shard, n) =>
          (0L until n by pageSize.toLong).map { start =>
            EndpointPage(shard, start, math.min(pageSize.toLong, n - start))
              : InputPartition
          }
        }.toArray
    // never plan ZERO partitions: the final agg sums the partials, and
    // a sum over no rows is NULL — an empty endpoint must still count 0
    if (parts.isEmpty) Array(EndpointHeaderCount(0L)) else parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EndpointCountReaderFactory(fullSchema, filters, transport)
}

private[sources] class EndpointCountReaderFactory(fullSchema: StructType,
                                                  filters: Array[Filter],
                                                  transport: PageTransport)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case EndpointHeaderCount(n) => new SingleCountReader(n)
      case page: EndpointPage =>
        // parse + re-verify via the ordinary page reader (empty
        // projection: only the filter columns are ever materialized),
        // then collapse the surviving rows to one partial count
        new CountingReader(new EndpointPageReader(page, fullSchema,
          StructType(Nil), filters, transport, -1, Array.empty))
    }
}

private[sources] class SingleCountReader(n: Long)
    extends PartitionReader[InternalRow] {
  private var emitted = false
  override def next(): Boolean = if (emitted) false else { emitted = true; true }
  override def get(): InternalRow = InternalRow(n)
  override def close(): Unit = ()
}

private[sources] class CountingReader(inner: EndpointPageReader)
    extends PartitionReader[InternalRow] {
  private var emitted = false
  override def next(): Boolean =
    if (emitted) false
    else {
      var c = 0L
      while (inner.next()) c += 1
      current = InternalRow(c)
      emitted = true
      true
    }
  private var current: InternalRow = _
  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

/** Which partial aggregate each output column of an
  * [[EndpointAggScan]] carries.
  */
private[sources] sealed trait EndpointAggSpec
private[sources] object EndpointAggSpec {
  case object CountAll extends EndpointAggSpec
  final case class MinOf(field: StructField) extends EndpointAggSpec
  final case class MaxOf(field: StructField) extends EndpointAggSpec
}

/** Ungrouped MIN/MAX (optionally with COUNT(*)) pushed into the
  * endpoint: one partition per page, each shipping a SINGLE
  * partial-aggregate row across the source boundary instead of its
  * page body — the ranked endpoint's "ordered page, size=1" response
  * shape. Rows are parsed and filter-re-verified by the ordinary page
  * reader (projection pruned to the aggregated columns), so the same
  * trust model as the row paths applies; only the per-page fold is
  * new. Spark merges the partials under the partial-push contract
  * (MIN of mins / MAX of maxes / SUM of counts), which also makes
  * empty pages harmless (null min/max partials are ignored, count 0
  * adds nothing).
  */
private[sources] class EndpointAggScan(fullSchema: StructType,
                                       specs: Seq[EndpointAggSpec],
                                       filters: Array[Filter],
                                       transport: PageTransport, pageSize: Int,
                                       useRanked: Boolean = false)
    extends Scan with Batch {
  import EndpointAggSpec._
  override def readSchema(): StructType = StructType(specs.map {
    case CountAll => StructField("count(*)", LongType, nullable = false)
    case MinOf(f) => StructField(s"min(${f.name})", f.dataType)
    case MaxOf(f) => StructField(s"max(${f.name})", f.dataType)
  })
  override def toBatch: Batch = this
  override def description(): String = {
    val shown = specs.map {
      case CountAll => "COUNT(*)"
      case MinOf(f) => s"MIN(${f.name})"
      case MaxOf(f) => s"MAX(${f.name})"
    }
    s"entity-endpoint ${transport.describe} " +
      s"PushedAggregates: [${shown.mkString(", ")}], " +
      s"PushedFilters: [${filters.mkString(", ")}]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val parts: Array[InputPartition] =
      transport.shards().flatMap { case (shard, n) =>
        (0L until n by pageSize.toLong).map { start =>
          EndpointPage(shard, start, math.min(pageSize.toLong, n - start))
            : InputPartition
        }
      }.toArray
    // an empty endpoint must still produce one partial row: COUNT
    // merges to 0 and MIN/MAX to null only if SOME partial arrives
    if (parts.isEmpty) Array(EndpointPage("", 0L, 0L)) else parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EndpointAggReaderFactory(fullSchema, specs, filters, transport, useRanked)
}

private[sources] class EndpointAggReaderFactory(fullSchema: StructType,
                                                specs: Seq[EndpointAggSpec],
                                                filters: Array[Filter],
                                                transport: PageTransport,
                                                useRanked: Boolean = false)
    extends PartitionReaderFactory {
  import EndpointAggSpec._
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val page = p.asInstanceOf[EndpointPage]
    if (page.shard.isEmpty) {
      // empty-endpoint sentinel partition: zero count, null extrema
      val row = InternalRow.fromSeq(specs.map {
        case CountAll => 0L
        case _        => null
      })
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean =
          if (emitted) false else { emitted = true; true }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    } else if (useRanked && specs.forall(_ != CountAll)) {
      // pure extrema against a TRUSTED ranked transport: ONE
      // ranked-page request per spec (order by the column, size=1 —
      // MIN asc / MAX desc, nulls last so the first row is the extreme
      // non-null value) — one row crosses the wire per spec instead of
      // the page body.
      val parts = specs.map { spec =>
        val (f, desc) = spec match {
          case MinOf(f) => (f, false)
          case MaxOf(f) => (f, true)
          case CountAll => throw new IllegalStateException("filtered above")
        }
        val projected = StructType(Seq(f))
        (spec, projected,
          new EndpointPageReader(page, fullSchema, projected, filters,
            transport, -1, Array.empty,
            serverOrder = Seq(PageOrder(f.name, desc, nullsFirst = false)),
            serverK = 1))
      }
      new ExtremaReader(parts)
    } else {
      // COUNT(*) in the mix (every passing row must be counted), an
      // untrusted server, or a transport whose fetchPageTopK falls
      // back to the full page anyway: ONE fetch+parse of the page
      // folds to one partial row. Splitting into per-spec ranked
      // requests here would fetch and parse the page once PER SPEC
      // for zero transfer savings (MIN+MAX = double page I/O).
      val cols = specs.collect {
        case MinOf(f) => f
        case MaxOf(f) => f
      }.distinct
      new AggregatingReader(
        new EndpointPageReader(page, fullSchema, StructType(cols), filters,
          transport, -1, Array.empty),
        specs, StructType(cols))
    }
  }
}

/** Folds each spec's ranked-page response (≤k rows from an honest
  * server, the full page from a fallback transport) to its extreme
  * value; comparisons mirror [[AggregatingReader]].
  */
private[sources] class ExtremaReader(
    parts: Seq[(EndpointAggSpec, StructType, EndpointPageReader)])
    extends PartitionReader[InternalRow] {
  import EndpointAggSpec._
  private var emitted = false
  private var current: InternalRow = _

  override def next(): Boolean =
    if (emitted) false
    else {
      val acc = parts.map { case (spec, projected, reader) =>
        val dt = projected.fields(0).dataType
        var best: Any = null
        while (reader.next()) {
          val v = reader.get().get(0, dt)
          if (v != null && (best == null || (spec match {
            case MinOf(_) => AggOrd.cmp(v, best) < 0
            case MaxOf(_) => AggOrd.cmp(v, best) > 0
            case CountAll => false
          }))) best = v
        }
        best
      }
      current = InternalRow.fromSeq(acc)
      emitted = true
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = parts.foreach(_._3.close())
}

/** Value comparisons for pushed MIN/MAX partials — the same orderings
  * Spark's own Min/Max use for these types (numeric order; UTF8String
  * BINARY order for strings — the page reader materializes strings as
  * UTF8String, whose compareTo is exactly that), so merged results
  * are identical to an unpushed aggregation.
  */
private[sources] object AggOrd {
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)             => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)               => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double)         => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean)       => java.lang.Boolean.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case _ => throw new IllegalStateException(
      s"entity-endpoint MIN/MAX: incomparable partial values $a / $b")
  }
}

/** Folds every surviving row of one page into a single partial-
  * aggregate row (used when COUNT(*) rides with the extrema, so the
  * whole page must be consulted); comparisons via [[AggOrd]].
  */
private[sources] class AggregatingReader(inner: EndpointPageReader,
                                         specs: Seq[EndpointAggSpec],
                                         projected: StructType)
    extends PartitionReader[InternalRow] {
  import EndpointAggSpec._
  private var emitted = false

  override def next(): Boolean =
    if (emitted) false
    else {
      val idx = specs.map {
        case MinOf(f) => projected.fieldIndex(f.name)
        case MaxOf(f) => projected.fieldIndex(f.name)
        case CountAll => -1
      }
      val acc = new Array[Any](specs.length)
      var count = 0L
      while (inner.next()) {
        val row = inner.get()
        count += 1
        var i = 0
        while (i < specs.length) {
          specs(i) match {
            case CountAll => ()
            case spec =>
              val v = row.get(idx(i), projected.fields(idx(i)).dataType)
              if (v != null) {
                val keep = acc(i) == null || (spec match {
                  case MinOf(_) => AggOrd.cmp(v, acc(i)) < 0
                  case MaxOf(_) => AggOrd.cmp(v, acc(i)) > 0
                  case CountAll => false
                })
                // InternalRow.get hands back a fresh immutable value
                // for these primitive/UTF8String types, safe to retain
                if (keep) acc(i) = v
              }
          }
          i += 1
        }
      }
      specs.indices.foreach { i =>
        if (specs(i) == CountAll) acc(i) = count
      }
      current = InternalRow.fromSeq(acc.toSeq)
      emitted = true
      true
    }

  private var current: InternalRow = _
  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

private[sources] class EndpointReaderFactory(fullSchema: StructType,
                                             required: StructType,
                                             filters: Array[Filter],
                                             transport: PageTransport,
                                             limit: Int, topN: Array[SortOrder],
                                             useRanked: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EndpointPageReader(p.asInstanceOf[EndpointPage], fullSchema, required,
      filters, transport, limit, topN, useRanked = useRanked)
}

/** Executes ONE page request: fetches the page body through the
  * transport (which may have filtered server-side), re-verifies the
  * pushed filters (the client never trusts the server's filtering),
  * applies the pushed limit / per-page top-k (the server's ranked
  * `size=k` page), and emits only the pruned columns.
  */
private[sources] class EndpointPageReader(page: EndpointPage,
                                          fullSchema: StructType,
                                          required: StructType,
                                          filters: Array[Filter],
                                          transport: PageTransport,
                                          limit: Int,
                                          topN: Array[SortOrder],
                                          serverOrder: Seq[PageOrder] = Nil,
                                          serverK: Int = -1,
                                          useRanked: Boolean = false)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  // an UNORDERED server cap under a pushed top-k could drop the very
  // rows the ordering keeps, so the plain `limit` cap applies only to
  // the plain-limit shape. A top-k page requests the RANKED page
  // (order + k server-side) ONLY when the caller decided ranked
  // truncation is trustworthy (`useRanked` — the trustRankedPages
  // option AND a transport that truncates); otherwise the full
  // filtered page arrives and the re-sort below stays authoritative
  // against any server. `serverOrder`/`serverK` let a caller (the
  // extrema pushdown) request a ranked page directly without engaging
  // the row-level top-k machinery — those callers apply the same
  // gate before constructing this reader.
  private val lines =
    if (serverOrder.nonEmpty)
      transport.fetchPageTopK(page.shard, page.start, page.len, filters,
        serverOrder, serverK)
    else if (topN.nonEmpty && useRanked)
      transport.fetchPageTopK(page.shard, page.start, page.len, filters,
        PageOrder.fromSortOrders(topN), limit)
    else if (topN.nonEmpty)
      transport.fetchPage(page.shard, page.start, page.len, filters, -1)
    else
      transport.fetchPage(page.shard, page.start, page.len, filters, limit)

  private def parse(node: JsonNode, f: StructField): Any = {
    val v = node.get(f.name)
    if (v == null || v.isNull) null
    else f.dataType match {
      case LongType    => v.asLong()
      case IntegerType => v.asInt()
      case DoubleType  => v.asDouble()
      case BooleanType => v.asBoolean()
      case StringType  => v.asText()
      case dt => throw new IllegalArgumentException(
        s"entity-endpoint: unsupported field type $dt for ${f.name}")
    }
  }

  private def passes(row: Map[String, Any]): Boolean = filters.forall {
    case EqualTo(a, v)        => row.get(a).flatMap(Option(_)).contains(v)
    case In(a, vs)            => row.get(a).flatMap(Option(_)).exists(x => vs.contains(x))
    case StringContains(a, v) => row.get(a).flatMap(Option(_))
      .exists(_.toString.contains(v))
    case IsNotNull(a)         => row.get(a).flatMap(Option(_)).isDefined
    case _                    => true
  }

  private def toRow(full: Map[String, Any]): InternalRow =
    InternalRow.fromSeq(required.fields.toSeq.map { f =>
      full(f.name) match {
        case null      => null
        case s: String => UTF8String.fromString(s)
        case other     => other
      }
    })

  /** Ordering over parsed row maps for the pushed top-k: single
    * top-level columns, null ordering per the connector SortOrder.
    * Comparing the parsed (pre-projection) values means the sort key
    * need not survive column pruning.
    */
  private lazy val topNOrdering: Ordering[Map[String, Any]] = {
    val comparators = topN.toSeq.map { so =>
      val name = so.expression().asInstanceOf[NamedReference].fieldNames()(0)
      val desc = so.direction() == SortDirection.DESCENDING
      val nullsFirst = so.nullOrdering() == NullOrdering.NULLS_FIRST
      (a: Map[String, Any], b: Map[String, Any]) => {
        val (x, y) = (a.get(name).flatMap(Option(_)), b.get(name).flatMap(Option(_)))
        // the null ordering is ABSOLUTE (SortOrder.nullOrdering says
        // where nulls land in the FINAL order) — only the value
        // comparison flips under a descending direction. Negating the
        // null branch too would put NULLS_LAST nulls first on a desc
        // key and a truncated page would drop real rows.
        (x, y) match {
          case (None, None)       => 0
          case (None, _)          => if (nullsFirst) -1 else 1
          case (_, None)          => if (nullsFirst) 1 else -1
          case (Some(u), Some(v)) =>
            val cmp = (u, v) match {
              case (u: Long, v: Long)       => java.lang.Long.compare(u, v)
              case (u: Int, v: Int)         => java.lang.Integer.compare(u, v)
              case (u: Double, v: Double)   => java.lang.Double.compare(u, v)
              case (u: Boolean, v: Boolean) => java.lang.Boolean.compare(u, v)
              // Spark's global TopN orders StringType by UTF8String BYTES
              // (code-point order); java.lang.String.compareTo orders UTF-16
              // code units, which disagrees for U+E000..U+FFFF vs
              // supplementary characters. The page-local top-k must be a
              // superset of the global top-k, so it must use the same order.
              case (u, v) => UTF8String.fromString(u.toString)
                .compareTo(UTF8String.fromString(v.toString))
            }
            if (desc) -cmp else cmp
        }
      }
    }
    (a: Map[String, Any], b: Map[String, Any]) =>
      comparators.iterator.map(_(a, b)).find(_ != 0).getOrElse(0)
  }

  /** With a pushed top-k: the "server" materializes this page's
    * passing rows, sorts by the pushed ordering, and returns only the
    * first k — the ranked-page response body. Spark's own global TopN
    * (partial-push contract) merges the pages.
    */
  private lazy val topNRows: Iterator[InternalRow] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next())
      val full = fullSchema.fields.map(f => f.name -> parse(node, f)).toMap
      if (passes(full)) buf += full
    }
    buf.sorted(topNOrdering).iterator.take(limit).map(toRow)
  }

  private var emitted = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    if (topN.nonEmpty) {
      if (!topNRows.hasNext) return false
      current = topNRows.next()
      emitted += 1
      return true
    }
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next())
      val full = fullSchema.fields.map(f => f.name -> parse(node, f)).toMap
      if (passes(full)) {
        current = toRow(full)
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
