package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent ANSI-SQL oracle that DuckDB runs over the
  * same parquet tables for the driver's hash-compare gate.
  *
  * Determinism contract (so Spark-vs-DuckDB hashes match bit-for-bit):
  *  - every floating-point SUM/AVG goes through a DECIMAL cast (exact,
  *    addition-order-independent) and is cast back to DOUBLE at the end;
  *  - every query ends in a total ORDER BY on both sides;
  *  - every computed column carries the same alias on both sides.
  */
final case class Q(
    name: String,
    desc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  /** All registered queries, assembled from the per-area registries. */
  lazy val all: Seq[Q] =
    RelationalQueries.queries ++ ExtensionQueries.queries

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in registry")
    m
  }
}
