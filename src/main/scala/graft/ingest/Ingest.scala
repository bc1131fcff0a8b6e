package graft.ingest

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.JobSpec

/** The ingestion layer: job-spec interpretation and Bronze-layer IO.
  *
  * The reference's remote-source machinery (paginated HTTP scan, worker-pool
  * IN-list fan-out, page markers) collapses to Spark primitives: a paginated
  * scan is one partitioned file scan; the ID-batched enrich fetch is a
  * broadcast semi join (reference: extractor/main.go:654-683,781-910); page
  * idempotency markers are the framework's task retry + idempotent sink.
  *
  * Scale: Bronze is written `partitionBy(year, corr)` so every downstream read
  * for one run/year range is partition-pruned before any byte is read
  * (reference key layout: extractor/main.go:636-637,886-891).
  */
object Ingest {

  /** Predicate resolution with the reference's precedence — explicit `where`
    * beats `date_range` (half-open [start, end)) beats watermark beats
    * `since_days` beats the default 7-day lookback
    * (reference: extractor/main.go:202-222 buildWhere).
    *
    * `now` is injected for determinism; predicates are Column expressions so
    * Catalyst pushes them into the scan.
    */
  def buildPredicate(
      job: JobSpec,
      watermark: Option[String],
      now: java.time.LocalDate,
      dateCol: String = "crash_date"): Column = {
    job.where.map(expr).getOrElse {
      job.dateRange match {
        case Some(dr) =>
          col(dr.field) >= lit(dr.start).cast("timestamp") &&
            col(dr.field) < lit(dr.end).cast("timestamp")
        case None =>
          watermark match {
            case Some(wm) => col(dateCol) > lit(wm).cast("timestamp")
            case None =>
              val days = job.sinceDays.getOrElse(7)
              col(dateCol) >= lit(now.minusDays(days.toLong).toString).cast("timestamp")
          }
      }
    }
  }

  /** Required-column injection: prepend the join key / date column when a user
    * select list omits them (reference: extractor/main.go:409-429 ensureSelect).
    */
  def ensureSelect(selected: Seq[String], must: String*): Seq[String] =
    if (selected == Seq("*")) selected
    else must.filterNot(selected.contains) ++ selected

  /** Apply a job's projection + predicate to a Bronze DataFrame — the Spark
    * form of the source-side `$select`/`$where` pushdown (reference:
    * extractor/main.go:723-735). Catalyst prunes columns and pushes the filter
    * into the file scan.
    */
  def applyJob(
      df: DataFrame,
      job: JobSpec,
      watermark: Option[String],
      now: java.time.LocalDate): DataFrame = {
    val selected = ensureSelect(job.primarySelect, job.joinKey, "crash_date")
    val projected =
      if (selected == Seq("*")) df
      else df.select(selected.filter(df.columns.contains).map(col): _*)
    projected.where(buildPredicate(job, watermark, now))
  }

  /** Partitioned Bronze write: `base/alias/year=YYYY/corr=ID/part.json.gz`
    * (reference: extractor/main.go:615-652 year bucketing + gzip objects).
    * Year is derived from the entity's crash_date when present.
    */
  def writeBronze(df: DataFrame, base: String, alias: String, corr: String): Unit = {
    val withParts = df
      .withColumn("year", year(to_timestamp(col("crash_date"))))
      .withColumn("corr", lit(corr))
    withParts.write
      .mode("append")
      .partitionBy("year", "corr")
      .option("compression", "gzip")
      .json(s"$base/$alias")
  }

  /** Partition-pruned Bronze read for one run (reference:
    * transformer/transformer.py:185-199 key filtering — here the filter is a
    * partition predicate, so non-matching runs are never read).
    */
  def readBronze(spark: SparkSession, base: String, alias: String, corr: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "false")
      .json(s"$base/$alias")
      .where(col("corr") === corr)
      .drop("year", "corr")

  /** The enrich fetch: keep only enrich rows whose key appears in the primary
    * page — the extractor's dedup+sort+IN-list worker pool as one broadcast
    * left-semi join (reference: extractor/main.go:654-683,814-910).
    */
  def semiJoinEnrich(enrich: DataFrame, primaryIds: DataFrame, key: String): DataFrame =
    enrich.join(broadcast(primaryIds.select(key).distinct()), Seq(key), "left_semi")

  // ---- run state (driver-side, tiny) --------------------------------------

  /** Watermark store: one timestamp per pipeline, advanced monotonically and
    * only by non-backfill runs (reference: extractor/main.go:433-473,693-702).
    */
  def loadWatermark(path: String): Option[String] = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val s = new String(Files.readAllBytes(p), "UTF-8").trim
      if (s.nonEmpty) Some(s) else None
    } else None
  }

  def saveWatermark(path: String, value: String, mode: String): Unit = {
    if (mode == "backfill") return // backfill never advances the watermark
    val prev = loadWatermark(path)
    if (prev.forall(_ < value)) {
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.write(p, value.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
  }

  /** Run manifest — one lineage record per corr_id
    * (reference: extractor/main.go:923-940).
    */
  def writeManifest(base: String, corr: String, mode: String, where: String,
      started: String, finished: String): Unit = {
    val dir = Paths.get(s"$base/_runs/corr=$corr")
    Files.createDirectories(dir)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"corr_id":${q(corr)},"mode":${q(mode)},"where":${q(where)},"started":${q(started)},"finished":${q(finished)}}"""
    Files.write(dir.resolve("manifest.json"), json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
