package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a SODA-style paged HTTP JSON API — the S2
  * operator the reference implements as a hand-rolled retrying client
  * (extractor/main.go:291-336 retry/backoff; :654-683 `$limit`/`$offset`
  * paging; :716-779 `$select`/`$where` pushdown; :732 `$order` stable
  * pagination).
  *
  * Spark-first shape:
  *  - `SupportsPushDownRequiredColumns` renders the pruned column list as the
  *    `$select` query parameter (the server never serializes unused fields);
  *  - `SupportsPushDownFilters` renders comparable predicates as a `$where`
  *    conjunction with single-quote escaping (the reference's F14 rule) —
  *    every filter is also kept as a residual, so correctness never depends
  *    on the server honoring the parameter;
  *  - with a known page count (`pages` option, or `probeCount=true` issuing
  *    one `$select=count(1)` probe at planning time) each page becomes one
  *    input partition and the extraction fans out across the cluster — an
  *    upgrade over the reference's strictly sequential pager;
  *  - without a count, one partition pages sequentially until a short page,
  *    which is exactly the reference's termination rule.
  *
  * Every request retries transient failures (IO errors, HTTP 429/5xx) with
  * exponential backoff — `maxRetries`/`backoffMs` options. Rows arrive as
  * JSON objects with string fields (the Socrata convention; casts belong to
  * the Gold chain), read against the `entity` schema or a user schema.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SodaHttpSource")
  *   .option("url", "http://host/resource.json")
  *   .option("pageSize", 1000).option("pages", 8)   // or probeCount=true
  *   .load()
  * }}}
  */
class SodaHttpSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SodaHttpSource.schemaFor(options.getOrDefault("entity", "crashes"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SodaHttpTable(schema, SodaOptions.from(properties))

  override def supportsExternalMetadata(): Boolean = true
}

object SodaHttpSource {
  def schemaFor(entity: String): StructType = entity match {
    case "vehicles" => graft.model.Schemas.bronzeVehicles
    case "people"   => graft.model.Schemas.bronzePeople
    case _          => graft.model.Schemas.bronzeCrashes
  }
}

private[sources] final case class SodaOptions(
    url: String,
    pageSize: Int,
    pages: Option[Int],
    probeCount: Boolean,
    order: Option[String],
    maxRetries: Int,
    backoffMs: Long,
    timeoutMs: Long)

private[sources] object SodaOptions {
  def from(p: java.util.Map[String, String]): SodaOptions = {
    def opt(k: String): Option[String] = Option(p.get(k)).filter(_.nonEmpty)
    SodaOptions(
      url = opt("url").getOrElse(
        throw new IllegalArgumentException("SodaHttpSource requires option 'url'")),
      pageSize = opt("pagesize").orElse(opt("pageSize")).map(_.toInt).getOrElse(1000),
      pages = opt("pages").map(_.toInt),
      probeCount = opt("probecount").orElse(opt("probeCount")).exists(_.toBoolean),
      order = opt("order"),
      maxRetries = opt("maxretries").orElse(opt("maxRetries")).map(_.toInt).getOrElse(3),
      backoffMs = opt("backoffms").orElse(opt("backoffMs")).map(_.toLong).getOrElse(100L),
      timeoutMs = opt("timeoutms").orElse(opt("timeoutMs")).map(_.toLong).getOrElse(30000L))
  }
}

private[sources] class SodaHttpTable(schema: StructType, opts: SodaOptions)
    extends Table with SupportsRead {
  override def name(): String = s"soda_http(${opts.url})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SodaScanBuilder(schema, opts)
}

private[sources] class SodaScanBuilder(fullSchema: StructType, opts: SodaOptions)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var sawFilters = false
  private var countStarPushed = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    pushed = filters.filter(f => SodaScanBuilder.render(f).isDefined)
    filters // all residual: the server-side $where is an optimization, not the contract
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) with no grouping collapses to ONE `$select=count(1)` request —
    * the reference's own server-side count idiom
    * (streamlit_frontend.py:455). Every filter stays residual in this source
    * (post-scan), so Catalyst only attempts the aggregate push on filterless
    * plans; `sawFilters` double-guards against that invariant drifting.
    *
    * A `pages` option bounds the SCAN at pages*pageSize rows, but the server
    * count is unbounded — pushing it would make `df.count()` disagree with
    * `df.collect().length` on the same DataFrame. With a page bound the
    * aggregate falls back to the regular (bounded) scan.
    */
  private def isGlobalCountStar(agg: Aggregation): Boolean =
    !sawFilters &&
      opts.pages.isEmpty &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]

  override def supportCompletePushDown(agg: Aggregation): Boolean = isGlobalCountStar(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    countStarPushed = isGlobalCountStar(agg)
    countStarPushed
  }

  override def build(): Scan =
    if (countStarPushed) new SodaCountScan(opts) else new SodaScan(required, pushed, opts)
}

private[graft] object SodaScanBuilder {
  /** SoQL single-quote escaping — the reference's IN-list escaping rule
    * (F14): a quote inside a value doubles.
    */
  private def q(v: Any): String = "'" + String.valueOf(v).replace("'", "''") + "'"

  /** Render one Spark filter as a SoQL predicate; None = not pushable. */
  def render(f: Filter): Option[String] = f match {
    case EqualTo(c, v)            => Some(s"$c = ${q(v)}")
    case GreaterThan(c, v)        => Some(s"$c > ${q(v)}")
    case GreaterThanOrEqual(c, v) => Some(s"$c >= ${q(v)}")
    case LessThan(c, v)           => Some(s"$c < ${q(v)}")
    case LessThanOrEqual(c, v)    => Some(s"$c <= ${q(v)}")
    case In(c, vs) if vs.nonEmpty => Some(s"$c in (${vs.map(q).mkString(", ")})")
    case _                        => None
  }
}

private[sources] class SodaScan(
    required: StructType,
    pushed: Array[Filter],
    opts: SodaOptions)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def selectParam: Option[String] = {
    val cols = required.fieldNames
    // empty = a count-style scan reading zero columns; otherwise always push
    // the pruned list — the server never serializes unrequested fields
    if (cols.isEmpty) None else Some(cols.mkString(", "))
  }

  private def whereParam: Option[String] = {
    val preds = pushed.flatMap(SodaScanBuilder.render)
    if (preds.isEmpty) None else Some(preds.mkString(" AND "))
  }

  /** Page count: explicit option, else an optional one-request count probe
    * (`$select=count(1)`, honoring the pushed $where so the count matches
    * the filtered extraction), else sequential-pager mode (one partition).
    */
  private def plannedPages: Option[Int] = opts.pages.orElse {
    if (!opts.probeCount) None
    else {
      val n = SodaCount.fetch(opts, whereParam)
      Some(math.max(1L, (n + opts.pageSize - 1) / opts.pageSize).toInt)
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedPages match {
      case Some(n) =>
        (0 until n).map(i => SodaPagePartition(i.toLong * opts.pageSize, sequential = false): InputPartition).toArray
      case None =>
        Array(SodaPagePartition(0L, sequential = true))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SodaReaderFactory(required, selectParam, whereParam, opts)

  override def description(): String =
    s"SodaHttpScan url=${opts.url} pageSize=${opts.pageSize} " +
      s"select=[${selectParam.getOrElse("*")}] where=[${whereParam.getOrElse("-")}] " +
      s"pushed=[${pushed.mkString(", ")}]"
}

private[sources] case class SodaPagePartition(offset: Long, sequential: Boolean)
    extends InputPartition

/** One `$select=count(1)` request -> the row count (the reference's
  * server-side count idiom). Shared by the planning-time page probe and the
  * pushed-down COUNT(*) scan.
  */
private[sources] object SodaCount {
  /** Strict parse: the response must be a one-element array whose single
    * object carries one numeric field (`[{"count":"N"}]`). Anything else —
    * an empty array, a page of rows from a server that ignored `$select`, a
    * non-numeric field — throws instead of silently returning a wrong count:
    * this is the one code path where the server's answer IS the result (the
    * other pushdowns are hints with client-side residual correctness).
    */
  def fetch(opts: SodaOptions, where: Option[String]): Long = {
    val params = Seq("$select" -> "count(1)") ++ where.map("$where" -> _)
    val body = new SodaHttp(opts).get(params)
    val root = new ObjectMapper().readTree(body)
    val rows = if (root != null && root.isArray) root.elements().asScala.toSeq else Seq.empty
    val fields = rows.headOption.map(_.fields().asScala.toSeq).getOrElse(Seq.empty)
    if (rows.length != 1 || fields.length != 1)
      throw new java.io.IOException(
        s"server did not honor $$select=count(1) at ${opts.url}: expected " +
          s"[{count: N}], got ${body.take(200)}")
    try fields.head.getValue.asText().toLong
    catch {
      case _: NumberFormatException =>
        throw new java.io.IOException(
          s"non-numeric count(1) response at ${opts.url}: ${body.take(200)}")
    }
  }
}

/** The scan a pushed global COUNT(*) builds: one partition, one HTTP request,
  * one row. Complete pushdown — Spark consumes the value as the final count,
  * so `df.count()` on the connector never pages the resource.
  */
private[sources] class SodaCountScan(opts: SodaOptions) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count_star", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SodaCountPartition())
  override def createReaderFactory(): PartitionReaderFactory = new SodaCountReaderFactory(opts)
  override def description(): String =
    s"SodaHttpCountScan url=${opts.url} (pushed COUNT(*) -> one count(1) request)"
}

private[sources] case class SodaCountPartition() extends InputPartition

private[sources] class SodaCountReaderFactory(opts: SodaOptions)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      private var value = 0L
      override def next(): Boolean =
        if (emitted) false
        else { value = SodaCount.fetch(opts, None); emitted = true; true }
      override def get(): InternalRow = InternalRow(value)
      override def close(): Unit = ()
    }
}

private[sources] class SodaReaderFactory(
    required: StructType,
    select: Option[String],
    where: Option[String],
    opts: SodaOptions)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SodaPageReader(partition.asInstanceOf[SodaPagePartition], required, select, where, opts)
}

/** Minimal retrying HTTP client over the JDK's HttpClient: transient failures
  * (connect/IO errors, HTTP 429/5xx) retry with exponential backoff — the
  * reference client's loop (extractor/main.go:291-336). 4xx other than 429
  * fails fast: retrying a bad request can never succeed.
  */
private[sources] class SodaHttp(opts: SodaOptions) {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(opts.timeoutMs))
    .build()

  def get(params: Seq[(String, String)]): String = {
    val query = params
      .map { case (k, v) => URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8") }
      .mkString("&")
    val sep = if (opts.url.contains("?")) "&" else "?"
    val uri = URI.create(if (query.isEmpty) opts.url else s"${opts.url}$sep$query")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= opts.maxRetries) {
      if (attempt > 0) Thread.sleep(opts.backoffMs << (attempt - 1))
      try {
        val resp = client.send(
          HttpRequest.newBuilder(uri).timeout(Duration.ofMillis(opts.timeoutMs)).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case ok if ok >= 200 && ok < 300 => return resp.body()
          case retryable if retryable == 429 || retryable >= 500 =>
            lastErr = new java.io.IOException(s"HTTP $retryable from $uri")
          case fatal =>
            throw new java.io.IOException(s"HTTP $fatal from $uri (not retryable)")
        }
      } catch {
        case e: java.io.IOException if e.getMessage != null && e.getMessage.contains("not retryable") =>
          throw e
        case e: java.io.IOException => lastErr = e
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"giving up on $uri after ${opts.maxRetries + 1} attempts", lastErr)
  }
}

/** Reads one page (or, in sequential mode, pages until a short page) and
  * projects JSON object fields into the required schema as strings.
  */
private[sources] class SodaPageReader(
    part: SodaPagePartition,
    required: StructType,
    select: Option[String],
    where: Option[String],
    opts: SodaOptions)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val http = new SodaHttp(opts)

  private var offset = part.offset
  private var exhausted = false
  private var page: Iterator[JsonNode] = Iterator.empty
  private var current: InternalRow = _

  private def fetchPage(): Unit = {
    val params = Seq(
      "$limit" -> opts.pageSize.toString,
      "$offset" -> offset.toString,
      "$order" -> opts.order.getOrElse(":id")) ++
      select.map("$select" -> _) ++
      where.map("$where" -> _)
    val nodes = mapper.readTree(http.get(params)) match {
      case arr if arr != null && arr.isArray => arr.elements().asScala.toVector
      case _                                 => Vector.empty
    }
    // short page = end of resource (the reference's termination rule)
    exhausted = nodes.length < opts.pageSize || !part.sequential
    offset += nodes.length
    page = nodes.iterator
  }

  override def next(): Boolean = {
    if (!page.hasNext) {
      if (exhausted) return false
      fetchPage()
      if (!page.hasNext) return false
    }
    val node = page.next()
    val values: Array[Any] = required.fieldNames.map { f =>
      val v = node.get(f)
      if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
    }
    current = InternalRow.fromSeq(values.toSeq)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
