package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
  LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, PartitionDirectory, PartitioningAwareFileIndex,
  PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import ManifestStore.Snapshot

/** Catalyst-integrated manifest scan: [[readCatalyst]] plans a
  * ManifestStore table through a custom [[FileIndex]], so an ORDINARY
  * DataFrame filter — `readCatalyst(...).where($"k" > 5)` — prunes
  * segments from the manifest's recorded min/max stats INSIDE the
  * planner, with no special readWhere call site. Spark's own vectorized
  * parquet reader, predicate pushdown, and column pruning all apply
  * unchanged; the only custom piece is file LISTING, which is where
  * manifest-level skipping belongs. `readWhere` remains for callers that
  * want explicit bounds; this is the path a SQL view over the table
  * would use.
  *
  * Pruning is CONSERVATIVE by construction, mirroring
  * [[ManifestStore.prunedEntries]]: only simple comparisons against
  * literals (`= > >= < <= IN` and conjunctions) on stats-bearing columns
  * tighten the interval; anything else contributes no bound. Because the
  * listing only ever SHRINKS the file set for predicates Spark still
  * re-evaluates row-by-row (they remain dataFilters), a missed bound
  * costs I/O, never correctness. One-sided predicates keep the other end
  * unbounded — the interval logic here is Option-ended where
  * readWhere's public API takes closed intervals.
  *
  * The index makes ZERO filesystem metadata calls for v5 manifests: each
  * segment's file names and sizes were stamped into the manifest at
  * commit time ([[ManifestStore.SegmentEntry.files]]), so constructing
  * the index and planning a query cost O(segments) in-memory work and no
  * object-store round-trips at all — the coefficient that otherwise
  * dominates planning at 10⁵ segments. Pre-v5 entries (older commits)
  * fall back to one lazy `listStatus` per segment, paid only for the
  * segments a query actually keeps after pruning.
  */
object ManifestRead {

  /** The table at its latest snapshot as a Catalyst-planned DataFrame
    * with manifest-stats file skipping. Snapshot-isolated like every
    * manifest read: the plan holds vN's file list even if vN+1 commits.
    */
  def readCatalyst(spark: SparkSession, path: String): DataFrame =
    readCatalystAt(spark, path, ManifestStore.current(spark, path).getOrElse(
      throw new IllegalStateException(s"no manifest at $path — not a ManifestStore table")))

  /** [[readCatalyst]] pinned to a specific resolvable version — planner-
    * integrated time travel.
    */
  def readCatalystVersion(spark: SparkSession, path: String, version: Long): DataFrame =
    readCatalystAt(spark, path, ManifestStore.snapshotAt(spark, path, version).getOrElse(
      throw new IllegalStateException(
        s"version $version at $path is not resolvable — never committed, or " +
          "vacuumed past the retention window")))

  /** Register the table as a temp view, so plain `spark.sql` queries get
    * the planner-integrated manifest scan (and its segment skipping).
    */
  def registerView(spark: SparkSession, path: String, viewName: String): Unit =
    readCatalyst(spark, path).createOrReplaceTempView(viewName)

  private def readCatalystAt(spark: SparkSession, path: String,
      snap: Snapshot): DataFrame = {
    // top-level nullable: segments written before a schema evolution lack
    // the evolved columns, and the vectorized reader null-fills a missing
    // column only when the data schema doesn't mark it required
    val schema = StructType(
      snap.schema.getOrElse(ManifestStore.readAt(spark, path, snap).schema)
        .fields.map(_.copy(nullable = true)))
    // a renamed table's files spell columns PHYSICALLY: plan the relation
    // under the physical schema and alias to logical at the top — Catalyst
    // pushes user filters through the alias projection into the scan (and
    // into the index's listFiles) as physical-named predicates, matching
    // the stats keys, so segment pruning survives evolution unchanged
    val mapped = ManifestStore.hasMapping(schema)
    // visible fields only: a dropped column's data stays on disk, unread
    val vis = ManifestStore.visible(schema)
    val planSchema = if (mapped) ManifestStore.physSchema(vis) else schema
    def toLogical(df: DataFrame): DataFrame =
      if (!mapped) df
      else df.select(vis.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(ManifestStore.physicalName(f))
          .as(f.name, ManifestStore.cleanMeta(f))): _*)
    def planEntries(entries: Seq[ManifestStore.SegmentEntry]): DataFrame = {
      val index = new ManifestFileIndex(spark, path,
        snap.copy(entries = entries, deletes = Nil))
      val rel = HadoopFsRelation(index, new StructType(), planSchema, None,
        new ParquetFileFormat(), Map.empty)(spark)
      spark.baseRelationToDataFrame(rel)
    }
    // deletes on an EMPTY table suppress nothing (a merge can empty every
    // segment while MOR sidecars are still published) — and the grouped
    // reduce below needs at least one group
    if (snap.deletes.isEmpty || snap.entries.isEmpty)
      return toLogical(planEntries(snap.entries))
    // outstanding merge-on-read deletes: the sequence rule says a delete
    // at seq D suppresses keys only in segments with seq < D, so segments
    // group by their position among the delete seqs and each group
    // anti-joins exactly its applicable sidecars — HERE each group is
    // still a planner-integrated relation, so ordinary where() filters
    // keep pruning segments (Catalyst pushes predicates through the union
    // and the anti-join's left side); the sidecars are O(delete batch)
    // and broadcast
    val delSeqs = snap.deletes.map(_.seq).distinct.sorted
    val root = new org.apache.hadoop.fs.Path(path)
    // sidecar columns are physical, and so is the planned relation here —
    // the anti-joins run entirely in physical space, logical aliasing last
    toLogical(snap.entries.groupBy(e => delSeqs.count(_ > e.seq)).toSeq
      .map { case (_, es) =>
        val applicable = snap.deletes.filter(d => es.head.seq < d.seq)
        applicable.groupBy(_.keyCol).foldLeft(planEntries(es)) {
          case (df, (kc, ds)) =>
            val keys = ds.map(d => spark.read
                .parquet(new org.apache.hadoop.fs.Path(root, d.name).toString)
                .select(org.apache.spark.sql.functions.col(kc)))
              .reduce(_ unionByName _).distinct()
            df.join(org.apache.spark.sql.functions.broadcast(keys),
              Seq(kc), "left_anti")
        }
      }
      .reduce(_ unionByName _))
  }

  /** The manifest index in the shape Spark's NATIVE DSv2 file scans
    * consume ([[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder]]
    * takes a `PartitioningAwareFileIndex`, not a bare `FileIndex`): a
    * catalog-table SELECT planned through this serves COLUMNAR batches
    * from Spark's vectorized parquet reader with zero InternalRow→Row
    * conversion — the native twin of [[readCatalystAt]]'s V1 relation.
    * The listing itself is delegated verbatim to [[ManifestFileIndex]],
    * so manifest-stats segment skipping applies identically (the v2 file
    * scan hands its pushed catalyst data filters to `listFiles` exactly
    * like the v1 planner does); the inherited partition machinery is
    * pinned empty (segments are not hive-style partitions — their
    * pruning structure lives in the manifest stats, not the paths).
    */
  final class ManifestPartitioningIndex(spark: SparkSession,
      tablePath: String, snap: Snapshot)
      extends PartitioningAwareFileIndex(spark, Map.empty, None) {
    private val inner = new ManifestFileIndex(spark, tablePath, snap)
    private lazy val all: Seq[FileStatus] =
      snap.entries.flatMap(inner.statusesOf)

    override def rootPaths: Seq[Path] = inner.rootPaths
    override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
    override def partitionSchema: StructType = new StructType()
    override protected def leafFiles
        : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
      all.foreach(st => m += st.getPath -> st)
      m
    }
    override protected def leafDirToChildrenFiles
        : Map[Path, Array[FileStatus]] =
      all.groupBy(_.getPath.getParent)
        .map { case (d, fs) => d -> fs.toArray }
    override def refresh(): Unit = inner.refresh()
    override def sizeInBytes: Long = inner.sizeInBytes
    override def inputFiles: Array[String] = inner.inputFiles
    // the load-bearing override: manifest-stats pruning on the pushed
    // data filters, not the inherited partition-directory walk
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      inner.listFiles(partitionFilters, dataFilters)
  }

  /** Per-column prune state, conjunction-tightened: an Option-ended
    * interval plus an optional IN-list value set (point-set pruning, the
    * readForKeys semantics inside the planner), plus the two null-shape
    * probes `IS NULL` / `IS NOT NULL` (pruned against the v5 per-column
    * null counts / all-NULL encodings).
    */
  private final case class Bound(lo: Option[Any] = None, hi: Option[Any] = None,
      in: Option[Seq[Any]] = None, isNull: Boolean = false,
      notNull: Boolean = false)

  final class ManifestFileIndex(spark: SparkSession, tablePath: String,
      snap: Snapshot) extends FileIndex {
    private val root = new Path(tablePath)
    private val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pre-v5 fallback only: entries without a recorded file list pay one
    // lazy listStatus each, and only when a query actually keeps them
    private val legacyFiles =
      scala.collection.concurrent.TrieMap.empty[String, Array[FileStatus]]
    private[ops] def statusesOf(e: ManifestStore.SegmentEntry): Array[FileStatus] =
      filesOf(e)
    private def filesOf(e: ManifestStore.SegmentEntry): Array[FileStatus] =
      if (e.files.nonEmpty) {
        val segDir = new Path(root, e.name)
        e.files.map { case (name, len) =>
          new FileStatus(len, false, 1, 128L << 20, 0L,
            hfs.makeQualified(new Path(segDir, name)))
        }.toArray
      } else legacyFiles.getOrElseUpdate(e.name,
        hfs.listStatus(new Path(root, e.name)).filter(s => s.isFile && {
          val n = s.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }))

    override def rootPaths: Seq[Path] = Seq(root)
    override def partitionSchema: StructType = new StructType()
    override def inputFiles: Array[String] =
      snap.entries.flatMap(e => filesOf(e)).map(_.getPath.toString).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long =
      snap.entries.map(e =>
        if (e.files.nonEmpty) e.files.map(_._2).sum
        else filesOf(e).map(_.getLen).sum).sum

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val bounds = scala.collection.mutable.Map.empty[String, Bound]
      dataFilters.foreach(collect(_, bounds))
      val kept =
        if (bounds.isEmpty) snap.entries
        else snap.entries.filter { e =>
          bounds.forall { case (c, b) =>
            e.stats.get(c) match {
              case None => true // no stats — cannot prune
              case Some(st) =>
                val allNull = st.min.isEmpty && st.max.isEmpty
                // value constraints (interval / IN-list): an all-NULL
                // column satisfies none of them
                val valueOk =
                  if (b.lo.isEmpty && b.hi.isEmpty && b.in.isEmpty) true
                  else if (allNull) false
                  else overlaps(st.typ, st.min, st.max, b.lo, b.hi) &&
                    b.in.forall(vs => vs.exists(v =>
                      overlaps(st.typ, st.min, st.max, Some(v), Some(v))))
                // IS NULL: a segment with a recorded null count of ZERO
                // cannot produce a row (conservative: unknown count keeps)
                val isNullOk = !b.isNull || !st.nulls.contains(0L)
                // IS NOT NULL: an all-NULL column cannot produce a row
                val notNullOk = !b.notNull || !allNull
                valueOk && isNullOk && notNullOk
            }
          }
        }
      Seq(PartitionDirectory(InternalRow.empty,
        kept.flatMap(e => filesOf(e)).toArray))
    }

    /** [lo,hi] (Option-ended) intersects the segment's recorded [mn,mx]?
      * Conversion failures (a bound value the stats type can't key) keep
      * the segment — never prune on a shaky comparison.
      */
    private def overlaps(typ: String, mn: Option[String], mx: Option[String],
        lo: Option[Any], hi: Option[Any]): Boolean =
      try {
        val loK = lo.map(v => ManifestStore.boundKey(typ, v))
        val hiK = hi.map(v => ManifestStore.boundKey(typ, v))
        hiK.forall(h => mn.forall(m => ManifestStore.leq(ManifestStore.statKey(typ, m), h))) &&
          loK.forall(l => mx.forall(m => ManifestStore.leq(l, ManifestStore.statKey(typ, m))))
      } catch { case scala.util.control.NonFatal(_) => true }

    /** Catalyst literal → the external value space [[ManifestStore.boundKey]]
      * accepts. Dates/timestamps ride as their internal integers (boundKey
      * takes Numbers for both); strings unwrap UTF8String.
      */
    private def ext(v: Any): Any = v match {
      case s: UTF8String => s.toString
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case other => other
    }

    private def tighten(bounds: scala.collection.mutable.Map[String, Bound],
        col: String, lo: Option[Any] = None, hi: Option[Any] = None,
        in: Option[Seq[Any]] = None, isNull: Boolean = false,
        notNull: Boolean = false): Unit = {
      // later conjuncts only ever NARROW: fill an unset end/list, keep the
      // existing one otherwise (comparing typed ends here would need the
      // stats type; one bound per end is enough for the common shapes)
      val b = bounds.getOrElse(col, Bound())
      bounds(col) = Bound(b.lo.orElse(lo), b.hi.orElse(hi), b.in.orElse(in),
        b.isNull || isNull, b.notNull || notNull)
    }

    private def collect(e: Expression,
        bounds: scala.collection.mutable.Map[String, Bound]): Unit = e match {
      case And(l, r) => collect(l, bounds); collect(r, bounds)
      case IsNull(a: Attribute) => tighten(bounds, a.name, isNull = true)
      case IsNotNull(a: Attribute) => tighten(bounds, a.name, notNull = true)
      case EqualTo(a: Attribute, Literal(v, _)) if v != null =>
        tighten(bounds, a.name, lo = Some(ext(v)), hi = Some(ext(v)))
      case EqualTo(Literal(v, _), a: Attribute) if v != null =>
        tighten(bounds, a.name, lo = Some(ext(v)), hi = Some(ext(v)))
      case GreaterThan(a: Attribute, Literal(v, _)) if v != null =>
        tighten(bounds, a.name, lo = Some(ext(v)))
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
        tighten(bounds, a.name, lo = Some(ext(v)))
      case LessThan(a: Attribute, Literal(v, _)) if v != null =>
        tighten(bounds, a.name, hi = Some(ext(v)))
      case LessThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
        tighten(bounds, a.name, hi = Some(ext(v)))
      case GreaterThan(Literal(v, _), a: Attribute) if v != null =>
        tighten(bounds, a.name, hi = Some(ext(v)))
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
        tighten(bounds, a.name, hi = Some(ext(v)))
      case LessThan(Literal(v, _), a: Attribute) if v != null =>
        tighten(bounds, a.name, lo = Some(ext(v)))
      case LessThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
        tighten(bounds, a.name, lo = Some(ext(v)))
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall {
        case Literal(v, _) => v != null
        case _ => false
      } =>
        // point-set pruning: keep a segment iff AT LEAST ONE value can sit
        // in its [min,max] — evaluated per segment in the stats key space
        tighten(bounds, a.name,
          in = Some(vs.collect { case Literal(v, _) => ext(v) }))
      case _ => () // no bound — the row-level filter still applies
    }
  }
}
