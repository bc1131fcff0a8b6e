package graft

import org.apache.spark.sql.functions._

import graft.ops.ManifestStore

/** Pure-SQL lifecycle of a manifest table through [[graft.sources.ManifestTableProvider]]:
  * CREATE TABLE / INSERT INTO / INSERT OVERWRITE / SELECT, CAS semantics
  * under racing SQL writers, and segment pruning through the catalog
  * table's scan.
  */
class ManifestSqlSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE TABLE / INSERT INTO / INSERT OVERWRITE / SELECT round-trip") {
    val dir = tmpDir("msql") + "/t"
    spark.sql("DROP TABLE IF EXISTS msql_t")
    spark.sql(s"CREATE TABLE msql_t (k BIGINT, v STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$dir', statscols 'k')")
    // a created-but-empty table SELECTs as empty, not as an error
    assert(spark.sql("SELECT * FROM msql_t").count() == 0L)
    spark.sql("INSERT INTO msql_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO msql_t SELECT 10 AS k, 'c' AS v")
    assert(spark.sql("SELECT k FROM msql_t ORDER BY k").as[Long].collect().toSeq
      == Seq(1L, 2L, 10L))
    // two INSERTs = two segments, stats recorded via the statscols option
    val snap = ManifestStore.current(spark, dir).get
    assert(snap.entries.size == 2)
    assert(snap.entries.forall(_.stats.contains("k")), "statscols option must stick")
    assert(snap.entries.forall(_.files.nonEmpty), "SQL commits stamp v5 file lists")
    // INSERT OVERWRITE = rewriteAll: one segment, only the new rows
    spark.sql("INSERT OVERWRITE msql_t VALUES (100, 'z')")
    assert(spark.sql("SELECT k, v FROM msql_t").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((100L, "z")))
    assert(ManifestStore.current(spark, dir).get.entries.size == 1)
    // the API surface sees the same table (one protocol, two front doors)
    ManifestStore.append(spark, Seq((200L, "api")).toDF("k", "v"), dir)
    assert(spark.sql("SELECT COUNT(*) FROM msql_t").head().getLong(0) == 2L)
    spark.sql("DROP TABLE msql_t")
  }

  test("SQL reads prune segments from manifest stats (untouched segments see zero FS calls)") {
    graft.tools.CountingFs.install(spark)
    val dir = "countfs:" + tmpDir("msqlPrune") + "/t"
    spark.sql("DROP TABLE IF EXISTS msql_p")
    spark.sql(s"CREATE TABLE msql_p (k BIGINT, v STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$dir', statscols 'k')")
    spark.sql("INSERT INTO msql_p SELECT id AS k, 'lo' AS v FROM range(0, 10)")
    spark.sql("INSERT INTO msql_p SELECT id AS k, 'mid' AS v FROM range(100, 110)")
    spark.sql("INSERT INTO msql_p SELECT id AS k, 'hi' AS v FROM range(200, 210)")
    // the segment holding [100,110) — the only one the filter can touch
    val keptSeg = ManifestStore.current(spark, dir).get.entries
      .find(_.stats("k").min.contains("100")).get.name
    graft.tools.CountingFs.start()
    val got = spark.sql("SELECT k FROM msql_p WHERE k >= 100 AND k <= 109")
      .as[Long].collect().sorted.toSeq
    val calls = graft.tools.CountingFs.stop()
    assert(got == (100L to 109L))
    // the V1Scan applies the pushed predicate inside the manifest read, so
    // pruned segments are never listed, statused, or opened
    val dataCalls = calls.filter(_._2.contains("/seg-"))
    assert(dataCalls.nonEmpty, "the kept segment is actually read")
    assert(dataCalls.forall(_._2.contains(keptSeg)),
      s"SQL read must prune segments — saw calls outside $keptSeg: " +
        dataCalls.filterNot(_._2.contains(keptSeg)).take(5).mkString(", "))
    spark.sql("DROP TABLE msql_p")
  }

  test("versionAsOf: a frozen read-only time-travel view through the same provider") {
    val dir = tmpDir("msqlAsOf") + "/t"
    spark.sql("DROP TABLE IF EXISTS msql_v")
    spark.sql(s"CREATE TABLE msql_v (k BIGINT, v STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    spark.sql("INSERT INTO msql_v VALUES (1, 'a')") // v1
    spark.sql("INSERT INTO msql_v VALUES (2, 'b')") // v2
    // DataFrame-reader time travel
    val asOf1 = spark.read.format("graft-manifest")
      .option("path", dir).option("versionAsOf", "1").load()
    assert(asOf1.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT COUNT(*) FROM msql_v").head().getLong(0) == 2L,
      "the live table is unaffected")
    // a frozen view refuses writes with a pointed message
    spark.sql("DROP TABLE IF EXISTS msql_v1")
    spark.sql(s"CREATE TABLE msql_v1 (k BIGINT, v STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$dir', versionAsOf '1')")
    assert(spark.sql("SELECT k FROM msql_v1").as[Long].collect().toSeq == Seq(1L))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO msql_v1 VALUES (9, 'x')")
    }
    assert(e.getMessage.contains("read-only") ||
      Option(e.getCause).exists(_.getMessage.contains("read-only")),
      s"expected the frozen-view write refusal, got: ${e.getMessage}")
    spark.sql("DROP TABLE msql_v"); spark.sql("DROP TABLE msql_v1")
  }

  test("racing SQL INSERTs: CAS serializes both, nothing lost, versions dense") {
    val dir = tmpDir("msqlRace") + "/t"
    spark.sql("DROP TABLE IF EXISTS msql_r")
    spark.sql(s"CREATE TABLE msql_r (k BIGINT, v STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futs = (0 until 4).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.await()
          spark.sql(s"INSERT INTO msql_r SELECT id AS k, 'w$i' AS v " +
            s"FROM range(${i * 10}, ${i * 10 + 10})")
        }
      })
    }
    gate.countDown()
    futs.foreach(_.get())
    pool.shutdown()
    assert(spark.sql("SELECT COUNT(*) FROM msql_r").head().getLong(0) == 40L,
      "every racing INSERT must land")
    val versions = ManifestStore.history(spark, dir)
    assert(versions == (1L to 4L), s"dense versions, got $versions")
    spark.sql("DROP TABLE msql_r")
  }
}
