package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named registry queries to files — the
  * optimization-round evidence trail (plans/r12/<query>_{before,after}.txt).
  * Executes each query first so the AQE-final plan is also captured below
  * the static one.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1>[,<q2>...|ALL]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <suffix> <q1>[,...|ALL]")
    val Array(dir, outDir, suffix, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // Mirror the Bench session config exactly: the dumped plans must be the
    // plans the bench actually runs (shuffle partitions, AQE, SHJ threshold).
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      // cached plans keep AQE re-optimization (coalescing, SMJ->BHJ): the
      // default false pins a cached join at the full shuffle-partition count
      // (merge's s2.cache() measured as 32 near-empty tasks per stage at r12)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 21).toString)
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
    Files.createDirectories(Paths.get(outDir))
    val sel =
      if (names == "ALL") graft.analytics.Registry.all.map(_.name)
      else names.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    sel.foreach { n =>
      val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val q = graft.analytics.Registry.byName(n).fn(spark, dir)
      val formatted = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      q.collect() // execute so AQE finalizes shapes
      val finalPlan = q.queryExecution.executedPlan.toString
      val txt = s"== explain(formatted) ==\n$formatted\n== AQE-final executedPlan ==\n$finalPlan\n"
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"PLANDUMP $n -> $outDir/${n}_$suffix.txt")
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pinnedBefore.contains(id)) rdd.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
