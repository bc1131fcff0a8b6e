package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Atomic-commit parquet table: write-new-files, then atomically publish a
  * MANIFEST listing the table's live segments; readers resolve every scan
  * through the latest manifest. This is the unification the maintenance
  * family previously approximated one-off — [[graft.gold.GoldWriter]]'s
  * check-then-append window, [[ScaleOps.compactParquet]] /
  * [[ScaleOps.deleteKeys]]' rename-aside swaps, and the advisory writer
  * lock each defended their own crash window; here ONE protocol covers all
  * of them (the mini table-format discipline of Delta/Iceberg commit logs,
  * re-derived for this engine's needs):
  *
  *  - **Crash atomicity**: data files land under fresh UUID segment
  *    directories that no manifest references yet; the commit is a single
  *    atomic RENAME of `.tmp-*` to `_manifest/v{N}.manifest`. A writer
  *    killed between data write and publish leaves only an invisible
  *    orphan segment ([[vacuum]] reclaims it) — a reader can never observe
  *    a half-written table.
  *  - **Optimistic concurrency**: version numbers are dense; rename fails
  *    if `v{N}` already exists, so exactly one of two racing committers
  *    wins vN and the loser re-reads and retries against the winner's
  *    state. [[append]] retries trivially (its segment is still valid);
  *    [[upsert]] RECOMPUTES its anti-join against the new snapshot before
  *    retrying, which closes GoldWriter's two-writers-both-observe-absent
  *    race without any advisory lock; [[rewriteAll]] (compaction/delete)
  *    aborts and retries the whole rewrite, so a concurrent append is
  *    never silently dropped.
  *  - **No list-directory consistency assumption**: readers list only the
  *    small `_manifest/` directory to find the max version; data files are
  *    addressed BY NAME from the manifest, so eventually-consistent object
  *    listings of the data tree can neither hide a committed file nor
  *    surface an uncommitted one. (The publish itself needs atomic
  *    rename-no-replace — true on local/HDFS, emulated elsewhere; stores
  *    without it need a coordinator, the same boundary GoldWriter
  *    documents.)
  *  - **Snapshot isolation for readers**: a scan planned against vN keeps
  *    reading vN's files even while vN+1 commits, because rewrites never
  *    mutate or delete referenced files — [[vacuum]] only deletes segments
  *    unreferenced by the LATEST manifest and older than a grace period
  *    (choose it to exceed any plausible query runtime).
  *
  * Scale notes: a manifest is O(segments) lines of text — compaction keeps
  * it short; the commit path adds zero Spark jobs beyond the data write
  * (one tiny filesystem rename); [[upsert]]'s conflict scan reads only the
  * key column of the manifest-resolved files (Catalyst prunes), identical
  * cost to the path-based upsert it hardens.
  */
object ManifestStore {

  private val ManifestDir = "_manifest"
  private val Header = "graft-manifest v1"
  private val MaxRetries = 50

  /** One resolved table state: dense `version` and the segment directories
    * (relative to the table root) that constitute it.
    */
  final case class Snapshot(version: Long, segments: Seq[String])

  final case class UpsertReport(inserted: Long, batchDuplicates: Long,
      existingConflicts: Long, version: Long)

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: Path, v: Long): Path =
    new Path(root, f"$ManifestDir/v$v%012d.manifest")

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      scala.util.Try(name.stripPrefix("v").stripSuffix(".manifest").toLong).toOption
    else None

  /** Latest committed snapshot, or None for an uninitialized table. Lists
    * only the `_manifest/` directory (never the data tree).
    */
  def current(spark: SparkSession, path: String): Option[Snapshot] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath.getName))
    if (versions.isEmpty) None
    else {
      val v = versions.max
      Some(Snapshot(v, readManifest(fs, manifestPath(root, v))))
    }
  }

  private def readManifest(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val lines = try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    require(lines.headOption.contains(Header),
      s"$p is not a graft manifest (header ${lines.headOption})")
    lines.tail.filter(_.nonEmpty)
  }

  /** Write the manifest body to a tmp name, then atomically rename into the
    * dense version slot. False = the slot was taken (a racer committed
    * first); the caller re-reads and retries.
    */
  private def tryPublish(fs: FileSystem, root: Path, v: Long,
      segments: Seq[String]): Boolean = {
    val target = manifestPath(root, v)
    if (fs.exists(target)) return false // cheap pre-check; rename still decides
    val tmp = new Path(root,
      s"$ManifestDir/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((Header +: segments).mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val won = try fs.rename(tmp, target)
    catch { case _: java.io.IOException => false }
    if (!won) { try fs.delete(tmp, false) catch { case _: java.io.IOException => () } }
    won
  }

  /** Write `df` into a fresh (not yet referenced) segment directory.
    * Returns the relative segment name, or None when `df` is empty — an
    * empty spark parquet write has no schema-bearing files, and an empty
    * commit would be a no-op anyway.
    */
  private def writeSegment(spark: SparkSession, root: Path, df: DataFrame): Option[String] = {
    if (df.isEmpty) return None
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    df.write.parquet(new Path(root, seg).toString)
    Some(seg)
  }

  /** Fail fast when a commit's columns diverge from the table's: a
    * multi-segment read resolves its schema from ONE segment's files, so a
    * mismatched segment would silently null-fill (or break) every column
    * the two sides don't share — the DedupStore pinned-schema posture,
    * applied at the only place new files can enter the table. Types are
    * compared by column NAME set + per-name dataType; nullability is not a
    * conflict (parquet unions it fine).
    */
  private def requireCompatible(spark: SparkSession, path: String,
      snap: Snapshot, df: DataFrame): Unit = {
    if (snap.segments.isEmpty) return
    val existing = readAt(spark, path, snap).schema
    val have = existing.fields.map(f => f.name -> f.dataType).toMap
    val incoming = df.schema.fields.map(f => f.name -> f.dataType).toMap
    require(incoming.keySet == have.keySet &&
      incoming.forall { case (n, t) => have(n) == t },
      s"ManifestStore: batch schema ${df.schema.simpleString} is incompatible " +
        s"with table $path ${existing.simpleString} — a mismatched segment " +
        "would silently null-fill columns on read. Align the batch (or " +
        "rewriteAll to migrate the table schema).")
  }

  /** Read the table at its latest snapshot (empty-schema error only for a
    * table that was never initialized with data — commit something first).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val snap = current(spark, path).getOrElse(
      throw new IllegalStateException(s"no manifest at $path — not a ManifestStore table"))
    readAt(spark, path, snap)
  }

  /** Read a SPECIFIC snapshot (time travel / in-flight consistency). */
  def readAt(spark: SparkSession, path: String, snap: Snapshot): DataFrame = {
    require(snap.segments.nonEmpty,
      s"manifest v${snap.version} at $path lists no segments (empty table has no schema)")
    val root = new Path(path)
    spark.read.parquet(snap.segments.map(s => new Path(root, s).toString): _*)
  }

  /** Append `df` as one new segment + one commit. Safe under concurrent
    * appenders: the segment list only grows, so a CAS loser just re-reads
    * the winner's list and re-publishes with its own segment added.
    */
  def append(spark: SparkSession, df: DataFrame, path: String): Snapshot = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    current(spark, path).foreach(requireCompatible(spark, path, _, df))
    writeSegment(spark, root, df) match {
      case None => current(spark, path).getOrElse(Snapshot(0L, Nil))
      case Some(seg) =>
        var attempt = 0
        while (attempt < MaxRetries) {
          val base = current(spark, path).getOrElse(Snapshot(0L, Nil))
          if (tryPublish(fs, root, base.version + 1, base.segments :+ seg))
            return Snapshot(base.version + 1, base.segments :+ seg)
          attempt += 1
        }
        throw new IllegalStateException(
          s"ManifestStore.append: lost the publish race $MaxRetries times at $path")
    }
  }

  /** First-write-wins upsert WITHOUT an advisory lock: dedup the batch
    * (deterministic keep-first), anti-join against the CURRENT snapshot,
    * append only new keys, publish. If a racer commits first, the
    * anti-join is RECOMPUTED against the racer's snapshot — the
    * observe-absent/both-insert race is structurally impossible because a
    * conflicting insert changes the version our publish is conditioned on.
    * The orphan segments a lost race leaves behind are invisible
    * ([[vacuum]] reclaims them).
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      key: String): UpsertReport = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val tiebreak = batch.columns.filter(_ != key).sorted.map(col).toSeq
    val deduped = graft.silver.Transformer
      .dedupKeepFirst(batch.where(col(key).isNotNull), key, tiebreak)
      .cache()
    try {
      current(spark, path).foreach(requireCompatible(spark, path, _, batch))
      val nBatch = deduped.count()
      // dropped = within-batch duplicate keys + null-key rows (one count)
      val nDropped = batch.count() - nBatch
      var attempt = 0
      while (attempt < MaxRetries) {
        val base = current(spark, path).getOrElse(Snapshot(0L, Nil))
        val fresh =
          if (base.segments.isEmpty) deduped
          else deduped.join(readAt(spark, path, base).select(key), Seq(key), "left_anti")
        val freshC = fresh.cache()
        try {
          val nFresh = freshC.count()
          if (nFresh == 0L)
            return UpsertReport(0L, nDropped, nBatch, base.version)
          writeSegment(spark, root, freshC) match {
            case Some(seg) if tryPublish(fs, root, base.version + 1, base.segments :+ seg) =>
              return UpsertReport(nFresh, nDropped, nBatch - nFresh, base.version + 1)
            case _ => () // lost the race: recompute against the winner
          }
        } finally freshC.unpersist()
        attempt += 1
      }
      throw new IllegalStateException(
        s"ManifestStore.upsert: lost the publish race $MaxRetries times at $path")
    } finally deduped.unpersist()
  }

  /** Full-table rewrite commit — the primitive under [[compact]] and
    * [[deleteKeys]]: publish a manifest whose segments are ONLY the newly
    * written ones. The publish is conditioned on the base version, so a
    * concurrent append can never be dropped: on CAS failure the new
    * segments are abandoned (invisible; vacuum reclaims) and the caller's
    * `make` recomputes from the fresh snapshot.
    */
  def rewriteAll(spark: SparkSession, path: String,
      make: DataFrame => DataFrame, retries: Int = 5): Snapshot = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    var attempt = 0
    while (attempt < retries) {
      val base = current(spark, path).getOrElse(
        throw new IllegalStateException(s"no manifest at $path"))
      require(base.segments.nonEmpty, s"nothing to rewrite at $path")
      val seg = writeSegment(spark, root, make(readAt(spark, path, base)))
      // an empty rewrite result (e.g. deleteKeys removed every row) commits
      // an empty segment list — readers then see an explicitly empty table
      if (tryPublish(fs, root, base.version + 1, seg.toSeq))
        return Snapshot(base.version + 1, seg.toSeq)
      attempt += 1
    }
    throw new IllegalStateException(
      s"ManifestStore.rewriteAll: lost the publish race $retries times at $path")
  }

  /** Compaction, rebased onto the manifest protocol: coalesce the table
    * into `partitions` output files and commit atomically. No rename-aside
    * swap, no window where a reader can see doubled or missing rows — the
    * old segments stay live for in-flight readers until [[vacuum]].
    */
  def compact(spark: SparkSession, path: String, partitions: Int): Snapshot =
    rewriteAll(spark, path, df => df.repartition(partitions))

  /** GDPR-style key deletion, rebased onto the manifest protocol: rewrite
    * without the matched keys, atomically. Returns (deleted, remaining).
    */
  def deleteKeys(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): (Long, Long) = {
    val before = read(spark, path).count()
    val keyVals = keys.select(col(keys.columns.head).as(keyCol)).distinct()
    rewriteAll(spark, path, df =>
      df.join(broadcast(keyVals), Seq(keyCol), "left_anti"))
    val snap = current(spark, path).get
    val after = if (snap.segments.isEmpty) 0L else readAt(spark, path, snap).count()
    (before - after, after)
  }

  /** Reclaim invisible data: segment directories not referenced by the
    * LATEST manifest (crashed or race-losing writers' orphans, superseded
    * rewrite inputs), manifest tmp files, and superseded manifest versions
    * — all only when older than `graceMs`, which must exceed any plausible
    * in-flight reader's runtime (their snapshots reference those files).
    * Returns the number of segment directories removed.
    */
  def vacuum(spark: SparkSession, path: String, graceMs: Long): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val snap = current(spark, path).getOrElse(return 0)
    val live = snap.segments.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var removed = 0
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("seg-") && !live.contains(name) &&
        st.getModificationTime < cutoff) {
        fs.delete(st.getPath, true)
        removed += 1
      }
    }
    val mdir = new Path(root, ManifestDir)
    fs.listStatus(mdir).foreach { st =>
      val name = st.getPath.getName
      val stale = versionOf(name).exists(_ < snap.version) || name.startsWith(".tmp-")
      if (stale && st.getModificationTime < cutoff) fs.delete(st.getPath, false)
    }
    removed
  }
}
