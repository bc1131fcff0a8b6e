package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gold.{Cleaner, GoldWriter}
import graft.ingest.Ingest
import graft.model.JobSpec
import graft.silver.Transformer

/** End-to-end pipeline runner: the reference's three queue-chained containers
  * (extract -> transform -> clean; SURVEY §3) as one driver-side program over
  * a single Catalyst lineage per stage. The RabbitMQ hops disappear — stage
  * boundaries are either materialized layers (Bronze/Silver on disk, as the
  * reference does) or nothing at all when run fused.
  */
object Pipeline {

  final case class RunResult(
      corrId: String,
      silverRows: Long,
      report: GoldWriter.IntegrityReport,
      watermark: Option[String])

  /** Run extract->transform->clean for one job spec over already-landed raw
    * entity tables (the engine's boundary is the landed data, SURVEY §2.1 S1).
    *
    * @param raw       alias -> raw DataFrame (crashes/vehicles/people)
    * @param base      working directory for Bronze + Gold + state
    * @param now       injected clock for predicate determinism
    */
  def run(
      spark: SparkSession,
      job: JobSpec,
      raw: Map[String, DataFrame],
      base: String,
      corrId: String,
      now: java.time.LocalDate): RunResult = {

    val wmPath = s"$base/watermarks/last.txt"
    val watermark = if (job.mode == "streaming") Ingest.loadWatermark(wmPath) else None

    // ---- extract: pushdown-projected/filtered primary + semi-join enrich,
    //      landed partitioned by (year, corr) (S1/S4/J1).
    val primary = Ingest.applyJob(raw("crashes"), job, watermark, now)

    // Empty-page short circuit, as the reference does at every stage
    // (transformer/transformer.py:202 is_empty guards): nothing new to land.
    if (primary.isEmpty) {
      val goldPath = s"$base/gold"
      val report =
        if (GoldWriter.tableExists(spark, goldPath))
          GoldWriter.integrityCheck(spark, goldPath, job.joinKey, 0L)
        else GoldWriter.IntegrityReport(0L, 0L, 0L, 0L)
      Ingest.writeManifest(base, corrId, job.mode, "", now.toString, now.toString)
      return RunResult(corrId, 0L, report, Ingest.loadWatermark(wmPath))
    }
    Ingest.writeBronze(primary, base, "crashes", corrId)
    val ids = primary.select(job.joinKey)
    job.enrich.foreach { e =>
      val alias = e.alias.getOrElse(e.id)
      val enriched = Ingest.semiJoinEnrich(raw(alias), ids, job.joinKey)
      val selected = e.select
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .map(cols => enriched.select(cols.filter(enriched.columns.contains)
          .map(org.apache.spark.sql.functions.col): _*))
        .getOrElse(enriched)
      // Enrich entities carry no crash_date; partition them by corr only.
      selected.write.mode("append").option("compression", "gzip")
        .json(s"$base/$alias/corr=$corrId")
    }

    // ---- transform: partition-pruned read of this run, silver merge (A1-A3,
    //      J2/J3, F13). Enrich reads use the SAME alias resolution as the
    //      writes above, and tolerate an empty/absent landing dir the way the
    //      reference tolerates empty pages (transformer.py:201-252 is_empty
    //      guards): an all-filtered semi-join writes only _SUCCESS, which
    //      spark.read.json cannot infer a schema from.
    val bCrashes = Ingest.readBronze(spark, base, "crashes", corrId)
    def readEnrich(i: Int): DataFrame = {
      val alias = job.enrich.lift(i).map(e => e.alias.getOrElse(e.id))
      alias match {
        case None => spark.emptyDataFrame
        case Some(a) =>
          try spark.read.json(s"$base/$a/corr=$corrId")
          catch { case _: org.apache.spark.sql.AnalysisException => spark.emptyDataFrame }
      }
    }
    val merged = Transformer.mergeCrashVehiclesPeople(
      bCrashes, readEnrich(0), readEnrich(1), job.joinKey)
    val silver = Transformer.makeCsvSafe(merged)
    silver.write.mode("overwrite").option("header", "true")
      .csv(s"$base/silver/corr=$corrId")

    // ---- clean: rule chain + idempotent Gold upsert (P5-F10, J5, A13/A14).
    // Bucketed layout, same as the streaming path: the conflict anti-join
    // prunes to the key-hash partitions each run touches.
    val silverBack = spark.read.option("header", "true").csv(s"$base/silver/corr=$corrId")
    val cleaned = Cleaner.cleanData(silverBack)
    val gold = Cleaner.toGold(cleaned, corrId,
      java.sql.Timestamp.valueOf(now.atStartOfDay()))
    val report = GoldWriter.upsertBucketed(spark, gold, s"$base/gold")

    // ---- commit watermark (streaming only; backfill never advances — ST1/ST3).
    // Computed from the landed Bronze (partition-pruned) rather than
    // re-running the raw-source filter.
    val newWm = bCrashes
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("crash_date"))).cast("string"))
      .first().getString(0)
    Option(newWm).foreach(wm => Ingest.saveWatermark(wmPath, wm, job.mode))
    Ingest.writeManifest(base, corrId, job.mode, "", now.toString, now.toString)

    // Row count from the materialized Silver CSV — the merge plan already ran
    // for the write; counting `silver` would execute it a second time.
    RunResult(corrId, silverBack.count(), report, Ingest.loadWatermark(wmPath))
  }
}
