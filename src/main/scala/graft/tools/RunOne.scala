package graft.tools

import org.apache.spark.sql.SparkSession

/** Run ONE registered query standalone with full driver logs — the triage
  * tool for failures the batched Bench summarizes away (e.g. the 100x-decade
  * SHJ OOM was isolated with this). Usage:
  * `sbt "runMain graft.tools.RunOne <query_name> <sfDir>"`.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      // cached plans keep AQE re-optimization (coalescing, SMJ->BHJ): the
      // default false pins a cached join at the full shuffle-partition count
      // (merge's s2.cache() measured as 32 near-empty tasks per stage at r12)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // zstd shuffle blocks measured ~2x smaller than lz4 on the vector/
      // posting exchanges at lower cpu (r12 guide-§2.3 measurement)
      .config("spark.io.compression.codec", "zstd")
      // AQE coalescing's 1 MiB minimum partition floor under-parallelizes
      // CPU-dense work at low byte volume (r13 guide-§2.2 measurement: the
      // w14 range sort coalesced to ~6 partitions and wall rose 25% while
      // byte volume was 6.6 MB; at 256 KiB the sort spreads and both wall
      // AND cpu beat the pinned-width plan). Production-safe: at corpus
      // scale the advisory target dominates and the floor is irrelevant.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "256k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.analytics.Registry.byName(name).fn(spark, dir).count()
    println(s"RUNONE $name rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
