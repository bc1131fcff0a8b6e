package graft.gold

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.silver.Transformer

/** Gold-table sink: first-write-wins idempotent upsert + integrity checks.
  *
  * DuckDB's `INSERT ... ON CONFLICT (crash_record_id) DO NOTHING`
  * (reference: cleaner/duckdb_writer.py:141-207) has no parquet equivalent,
  * so it is expressed as dedup-within-batch + left-anti against the existing
  * keys + append — semantically identical under the reference's own
  * single-writer assumption (one cleaner consumer, prefetch 1;
  * cleaner/cleaner.py:248). Replays of the same batch are no-ops, which is
  * what makes the at-least-once delivery safe (ST4).
  *
  * Scale: the anti join ships only the key column of the existing table
  * (Catalyst prunes to one column) and the incoming batch is tiny relative to
  * the table, so AQE plans it as a broadcast of the batch keys — no full-table
  * shuffle per upsert.
  */
object GoldWriter {

  final case class IntegrityReport(
      totalRows: Long,
      duplicateKeys: Long,
      nullKeys: Long,
      insertedRows: Long)

  /** Dedup the incoming batch (deterministic keep-first by full-row order),
    * skip keys already present, append the rest.
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      key: String = "crash_record_id"): IntegrityReport = {
    val tiebreak = batch.columns.filter(_ != key).sorted.map(col).toSeq
    val deduped = Transformer.dedupKeepFirst(batch.where(col(key).isNotNull), key, tiebreak)

    val exists = new java.io.File(path).exists() &&
      new java.io.File(path).listFiles() != null &&
      new java.io.File(path).listFiles().exists(_.getName.endsWith(".parquet"))
    val toInsert =
      if (exists) {
        val existingKeys = spark.read.parquet(path).select(key)
        deduped.join(existingKeys, Seq(key), "left_anti")
      } else deduped

    // Materialize the insert count before appending (the plan reads `path`).
    val inserted = toInsert.cache()
    val nInserted = inserted.count()
    if (nInserted > 0) inserted.write.mode(SaveMode.Append).parquet(path)
    inserted.unpersist()

    integrityCheck(spark, path, key, nInserted)
  }

  /** Post-write checks mirrored from the reference: duplicate-PK grouping and
    * null-PK count (reference: cleaner/duckdb_writer.py:228-288 A13/A14).
    */
  def integrityCheck(spark: SparkSession, path: String, key: String,
      inserted: Long): IntegrityReport = {
    val gold = spark.read.parquet(path)
    val dups = gold.groupBy(key).count().where(col("count") > 1).count()
    val nulls = gold.where(col(key).isNull).count()
    IntegrityReport(gold.count(), dups, nulls, inserted)
  }
}
