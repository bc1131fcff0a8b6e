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

    val exists = tableExists(spark, path)
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

  /** Filesystem-agnostic existence probe (a java.io.File check would always
    * say "missing" on hdfs:// or s3a:// paths and silently break the
    * conflict skip).
    */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Post-write checks mirrored from the reference: duplicate-PK grouping and
    * null-PK count (reference: cleaner/duckdb_writer.py:228-288 A13/A14).
    * One aggregation pass over the key column only — this runs per
    * micro-batch in the streaming path, so it must not cost three full-table
    * scans.
    */
  def integrityCheck(spark: SparkSession, path: String, key: String,
      inserted: Long): IntegrityReport = {
    val perKey = spark.read.parquet(path)
      .select(key)
      .groupBy(key)
      .agg(count(lit(1)).as("cnt"))
    val r = perKey.agg(
      sum(col("cnt")).as("total"),
      sum(when(col("cnt") > 1, 1).otherwise(0)).as("dups"),
      sum(when(col(key).isNull, col("cnt")).otherwise(0L)).as("nulls"))
      .collect()(0)
    IntegrityReport(
      Option(r.get(0)).map(_.toString.toLong).getOrElse(0L),
      Option(r.get(1)).map(_.toString.toLong).getOrElse(0L),
      Option(r.get(2)).map(_.toString.toLong).getOrElse(0L),
      inserted)
  }
}
