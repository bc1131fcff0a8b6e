package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-STAGE cost breakdown for one registered query — [[RunOne]]'s sibling
  * for shuffle attribution. Bench aggregates shuffle/input bytes per QUERY;
  * when a decade measurement shows a query's exchange growing superlinearly
  * (SCALE.md's d2/d6 ~34x/decade reading), this tool answers "WHICH exchange"
  * by listing every completed stage with its shuffle read/write, input bytes,
  * task count and the planner's stage name (callsite), sorted by executor
  * run time. Usage: `sbt "runMain graft.tools.StageProbe <query_name> <sfDir>"`.
  */
object StageProbe {
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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJAGG_FALLBACK", (1 << 21).toString))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // zstd shuffle blocks measured ~2x smaller than lz4 on the vector/
      // posting exchanges at lower cpu (r12 guide-§2.3 measurement)
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "256k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Int, Double, Double, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        rows.synchronized {
          rows += ((si.stageId, si.name.takeWhile(_ != '\n').take(120),
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.inputMetrics.bytesRead, si.numTasks,
            m.executorRunTime / 1e3, m.executorCpuTime / 1e9,
            m.memoryBytesSpilled + m.diskBytesSpilled))
        }
      }
    })
    // SPARK_GRAFT_PROBE_RUNS=2 warms the JVM on run 1 and reports only the
    // LAST run's stages — cold-JIT cpu otherwise dominates the attribution
    // (r12: a stage reading 0.5 MB showed 13 cpu-s cold, ~2 warm).
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "1").toInt
    (1 until runs).foreach { _ =>
      val pinned = spark.sparkContext.getPersistentRDDs.keySet
      graft.analytics.Registry.byName(name).fn(spark, dir).collect()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pinned.contains(id)) rdd.unpersist(blocking = false)
      }
      Thread.sleep(1000)
      rows.synchronized(rows.clear())
    }
    val t0 = System.nanoTime()
    val df = graft.analytics.Registry.byName(name).fn(spark, dir)
    // collect (registered results are small) so the AQE-final executedPlan
    // below belongs to THIS query, not a derived count() plan
    val n = df.collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    // SPARK_GRAFT_PROBE_PLAN=1 dumps the AQE-final physical plan: stage
    // attribution needs to know which exchange is which
    if (sys.env.get("SPARK_GRAFT_PROBE_PLAN").contains("1"))
      println(df.queryExecution.executedPlan.toString)
    // listener bus is async — give it a moment to drain before reading
    Thread.sleep(2000)
    println(f"STAGEPROBE $name rows=$n sec=$sec%.2f")
    println(f"${"stage"}%6s ${"shufW_mb"}%9s ${"shufR_mb"}%9s ${"input_mb"}%9s ${"spill_mb"}%9s ${"tasks"}%6s ${"run_s"}%8s ${"cpu_s"}%8s  name")
    rows.sortBy(-_._7).foreach { case (id, nm, sw, sr, in, tk, rt, ct, sp) =>
      println(f"$id%6d ${sw / 1e6}%9.1f ${sr / 1e6}%9.1f ${in / 1e6}%9.1f ${sp / 1e6}%9.1f $tk%6d $rt%8.1f $ct%8.1f  $nm")
    }
    val (tw, tr, ti) = (rows.map(_._3).sum / 1e6, rows.map(_._4).sum / 1e6, rows.map(_._5).sum / 1e6)
    println(f"TOTAL shufW=$tw%.1f MB shufR=$tr%.1f MB input=$ti%.1f MB spill=${rows.map(_._9).sum / 1e6}%.1f MB run=${rows.map(_._7).sum}%.1f s cpu=${rows.map(_._8).sum}%.1f s stages=${rows.size}")
    spark.stop()
  }
}
