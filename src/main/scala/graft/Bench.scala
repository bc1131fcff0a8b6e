package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the machine's cores (the driver environment is local[32]);
    // SPARK_GRAFT_CPUS still overrides.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JIT/codegen and file-listing caches so the first measured
    // query doesn't absorb one-time session startup cost. Covers the major
    // physical operator families (hash agg, sort/window, exact percentile,
    // broadcast join) — each JITs its own codegen paths on first use.
    locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().collect()
      spark.sql(
        s"""SELECT l_returnflag, percentile(l_quantity, 0.5),
           |row_number() OVER (PARTITION BY l_returnflag ORDER BY l_orderkey) AS rn
           |FROM parquet.`$sfDir/lineitem.parquet`
           |GROUP BY l_returnflag, l_orderkey ORDER BY rn LIMIT 5""".stripMargin).collect()
      li.limit(1000).join(
        org.apache.spark.sql.functions.broadcast(li.limit(10).select("l_orderkey")),
        "l_orderkey").count()
    }
    // Stable name order so per-query timings are comparable across rounds
    // (Map iteration order would shuffle which query absorbs residual warmup).
    // Failures are recorded by name, never silently absorbed as a fast
    // timing: a broken query must make the bench visibly fail, not improve
    // the total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    results.foreach { case (k, _, err) =>
      err.foreach(e => System.err.println(s"BENCH FAILURE $k: $e"))
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (results.exists(_._3.isDefined)) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
