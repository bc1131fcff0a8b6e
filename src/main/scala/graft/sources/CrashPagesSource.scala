package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPInputStream

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas

/** DataSource V2 connector for the reference's landed Bronze page objects —
  * gzip (or plain) JSON **array** files under `{path}/year=YYYY/corr=ID/...`
  * exactly as the extractor lands them (reference: extractor/main.go:611-652
  * page writer; key layout :636-637). Also reads JSON-lines pages.
  *
  * This mirrors the reference's at-source pushdown (S1/P1/P3) in Spark's own
  * source API:
  *  - `SupportsPushDownRequiredColumns` — the `$select` list: only requested
  *    fields are parsed out of each JSON object;
  *  - `SupportsPushDownFilters` — the `$where` date predicate: filters on
  *    `crash_date` prune whole `year=` directories before any byte is read
  *    (the same work the extractor's server-side `$where` avoids), and
  *    `corr = '...'` equality prunes to one run. All filters are also
  *    retained as residuals so Spark re-evaluates them row-level —
  *    pruning is a superset guarantee, not an exactness one.
  *
  * Scale: file listing is driver-side metadata only; each page file is one
  * input partition (pages are bounded by the extractor's page size), so a
  * year of pages fans out across the cluster with no shuffle.
  *
  * Usage: `spark.read.format("graft.sources.CrashPagesSource")
  *   .option("path", base).load()` (schema = the 24-column Bronze crashes
  *   contract plus `year`,`corr` partition columns; override entity schema
  *   via `option("entity", "vehicles"|"people")`).
  */
class CrashPagesSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CrashPagesSource.schemaFor(options.getOrDefault("entity", "crashes"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CrashPagesTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object CrashPagesSource {
  def schemaFor(entity: String): StructType = {
    val base = entity match {
      case "vehicles" => Schemas.bronzeVehicles
      case "people"   => Schemas.bronzePeople
      case _          => Schemas.bronzeCrashes
    }
    base.add("year", "string").add("corr", "string")
  }
}

private[sources] class CrashPagesTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"crash_pages($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CrashPagesScanBuilder(schema, path)
}

private[sources] class CrashPagesScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Accept (for pruning) filters we can map to year/corr bounds; everything
    * is returned as residual so Spark still applies exact row-level
    * semantics.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(CrashPagesScanBuilder.prunable)
    filters // all residual: pruning is best-effort/superset
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new CrashPagesScan(path, fullSchema, required, pushed)
}

private[sources] object CrashPagesScanBuilder {
  def prunable(f: Filter): Boolean = f match {
    case GreaterThan("crash_date", _) | GreaterThanOrEqual("crash_date", _) |
        LessThan("crash_date", _) | LessThanOrEqual("crash_date", _) |
        EqualTo("crash_date", _) | EqualTo("corr", _) => true
    case _ => false
  }
}

private[sources] class CrashPagesScan(
    path: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  /** Year bounds implied by the pushed crash_date predicates (Socrata
    * floating timestamps sort lexicographically, so the leading year digits
    * bound the partition).
    */
  private def yearBounds: (Option[Int], Option[Int]) = {
    def yr(v: Any): Option[Int] =
      v.toString.take(4).toIntOption
    var lo: Option[Int] = None
    var hi: Option[Int] = None
    pushed.foreach {
      case GreaterThan("crash_date", v)        => yr(v).foreach(y => lo = Some(lo.fold(y)(math.max(_, y))))
      case GreaterThanOrEqual("crash_date", v) => yr(v).foreach(y => lo = Some(lo.fold(y)(math.max(_, y))))
      case LessThan("crash_date", v)           => yr(v).foreach(y => hi = Some(hi.fold(y)(math.min(_, y))))
      case LessThanOrEqual("crash_date", v)    => yr(v).foreach(y => hi = Some(hi.fold(y)(math.min(_, y))))
      case EqualTo("crash_date", v)            => yr(v).foreach { y => lo = Some(y); hi = Some(y) }
      case _                                   =>
    }
    (lo, hi)
  }

  private def corrFilter: Option[String] =
    pushed.collectFirst { case EqualTo("corr", v) => v.toString }

  override def planInputPartitions(): Array[InputPartition] = {
    val base = Paths.get(path)
    if (!Files.exists(base)) return Array.empty
    val (lo, hi) = yearBounds
    val all = Files.walk(base).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".json") || n.endsWith(".json.gz")
      }
      .toArray
    val kept = all.filter { p =>
      val rel = base.relativize(p).toString
      val year = "year=(\\d{4})".r.findFirstMatchIn(rel).map(_.group(1).toInt)
      val corr = "corr=([^/]+)".r.findFirstMatchIn(rel).map(_.group(1))
      val yearOk = year.forall(y => lo.forall(y >= _) && hi.forall(y <= _))
      val corrOk = corrFilter.forall(c => corr.forall(_ == c))
      yearOk && corrOk
    }
    kept.map(p => CrashPagePartition(
      p.toString,
      "year=(\\d{4})".r.findFirstMatchIn(p.toString).map(_.group(1)).orNull,
      "corr=([^/]+)".r.findFirstMatchIn(base.relativize(p).toString).map(_.group(1)).orNull
    ): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CrashPageReaderFactory(required)

  override def description(): String = {
    val (lo, hi) = yearBounds
    s"CrashPagesScan path=$path yearBounds=[${lo.getOrElse("-")},${hi.getOrElse("-")}] " +
      s"corr=${corrFilter.getOrElse("-")} pushed=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(",")}]"
  }
}

private[sources] case class CrashPagePartition(file: String, year: String, corr: String)
    extends InputPartition

private[sources] class CrashPageReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CrashPageReader(partition.asInstanceOf[CrashPagePartition], required)
}

/** Parses one landed page: a JSON array (the reference's format), an
  * `{"data": [...]}` envelope (schema-tolerant read, reference:
  * transformer/transformer.py:127-168), or JSON-lines; gzip auto-detected by
  * extension. Corrupt pages yield zero rows, like the reference's
  * bad-JSON -> [] fallback.
  */
private[sources] class CrashPageReader(part: CrashPagePartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val rows: Iterator[JsonNode] = {
    try {
      val raw = Files.readAllBytes(Paths.get(part.file))
      val bytes =
        if (part.file.endsWith(".gz")) {
          val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
          try in.readAllBytes() finally in.close()
        } else raw
      val text = new String(bytes, "UTF-8").trim
      // Parse EAGERLY inside this try: pages are bounded by the extractor's
      // page size, and a lazy line iterator would throw outside the guard.
      if (text.isEmpty) Iterator.empty
      else if (text.startsWith("[")) mapper.readTree(text).elements().asScala.toVector.iterator
      else if (text.startsWith("{") && !text.contains("\n")) {
        val node = mapper.readTree(text)
        if (node.has("data")) node.get("data").elements().asScala.toVector.iterator
        else Iterator.single(node)
      } else
        text.split("\n").filter(_.nonEmpty).map(mapper.readTree).toVector.iterator
    } catch {
      case _: Exception => Iterator.empty // corrupt page -> [] (reference behavior)
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!rows.hasNext) return false
    val node = rows.next()
    val values: Array[Any] = required.fieldNames.map {
      case "year" => if (part.year == null) null else UTF8String.fromString(part.year)
      case "corr" => if (part.corr == null) null else UTF8String.fromString(part.corr)
      case f =>
        val v = node.get(f)
        if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
    }
    current = InternalRow.fromSeq(values.toSeq)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
