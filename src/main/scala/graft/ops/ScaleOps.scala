package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-management utilities for the 100 TB deployment shapes the rest of
  * the engine assumes (SCALE.md): skew salting and bucketed co-located joins.
  * These are result-transparent — each helper produces exactly the rows of
  * its naive counterpart, only the physical exchange pattern changes.
  */
object ScaleOps {

  /** Join a skew-prone large side to a small-but-not-broadcastable side with
    * key salting: the large side gets a uniform pseudo-random salt in
    * [0, salt), the small side is replicated once per salt value, and the
    * join key becomes (key, salt) — a single hot key now spreads over `salt`
    * reducers instead of one straggler task.
    *
    * The salt assignment uses a seeded `rand`, so results are identical to
    * the unsalted join regardless of which salt each row lands on (the small
    * side is present under every salt). AQE's skew-join handles moderate
    * skew on its own; salting is for the pathological single-key case AQE
    * can't split (e.g. a null-key or default-value flood).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedLarge = large.withColumn("__salt", (rand(42) * salt).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge
      .join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Write a DataFrame as a bucketed+sorted managed table: both sides of a
    * recurring join bucketed by the same key and count join with NO exchange
    * (each bucket pair joins locally) — the pre-shuffle trade the reference's
    * year-partitioned layout gestures at, done properly for join keys.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables; with matching bucket specs Catalyst plans
    * a sort-merge join with zero shuffle exchanges.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable), Seq(key))
}
