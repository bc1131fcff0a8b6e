package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the LLM-pipeline extension set, §7.5)
  * is registered here as a named query over the driver's parquet star schema,
  * paired with an equivalent DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The Silver-merge analog (scan -> roll-up agg -> left join -> fill), the
    * reference pipeline's core shape (transformer/transformer.py:221-258).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("j2_enrich_left_join").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
