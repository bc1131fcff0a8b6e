package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ops.ManifestStore
import graft.ops.Expectations.{InRange, NotNull}

/** Expectations-gated commits (round-11): a batch violating the table's
  * constraint suite must never become a table version — it lands
  * re-drivable in the quarantine dir (the withDeadLetter layout) and the
  * manifest is untouched.
  */
class ManifestGateSpec extends SparkSpec {
  import spark.implicits._

  test("appendChecked: failing batch quarantined, version unchanged, re-drivable after repair") {
    val base = tmpDir("mgate")
    val path = base + "/t"
    val qdir = base + "/quarantine"
    ManifestStore.append(spark, Seq((1L, "a")).toDF("k", "v"), path)
    val v0 = ManifestStore.current(spark, path).get.version

    // bad batch: a NULL v and an out-of-range k
    val bad = Seq((2L, Some("b")), (999L, None: Option[String])).toDF("k", "v")
    val r = ManifestStore.appendChecked(spark, bad, path,
      checks = Seq(NotNull("v"), InRange("k", 0, 100)), quarantineDir = qdir)
    assert(!r.published)
    assert(r.violations.map(_._1).sorted == Seq("in_range", "not_null"))
    assert(ManifestStore.current(spark, path).get.version == v0,
      "a failing batch must not advance the table version")
    assert(ManifestStore.read(spark, path).count() == 1L, "table content untouched")
    // no orphan segment is left in the table root (it MOVED to quarantine)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphans = fs.listStatus(new Path(path)).map(_.getPath.getName)
      .filter(_.startsWith("seg-")).toSet --
      ManifestStore.current(spark, path).get.segments.toSet
    assert(orphans.isEmpty, s"staged segment must move out of the table: $orphans")

    // the quarantined batch is re-drivable: full rows + failing-check sidecar
    val qBatch = r.quarantine.get
    assert(fs.exists(new Path(qBatch, "_expectations.txt")))
    val rows = spark.read.parquet(qBatch)
    assert(rows.count() == 2L, "quarantine holds the FULL batch")
    val repaired = rows.na.fill("repaired", Seq("v"))
      .withColumn("k", least(col("k"), lit(100L)))
    val r2 = ManifestStore.appendChecked(spark, repaired, path,
      checks = Seq(NotNull("v"), InRange("k", 0, 100)), quarantineDir = qdir)
    assert(r2.published && r2.version == v0 + 1)
    assert(ManifestStore.read(spark, path).count() == 3L)

    // an empty batch trivially passes as a no-op
    val r3 = ManifestStore.appendChecked(spark,
      Seq.empty[(Long, String)].toDF("k", "v"), path,
      checks = Seq(NotNull("v")), quarantineDir = qdir)
    assert(r3.published && r3.version == v0 + 1)
  }

  test("mergeChecked: failing source is quarantined pre-merge; passing source merges normally") {
    val base = tmpDir("mgateMerge")
    val path = base + "/t"
    val qdir = base + "/quarantine"
    ManifestStore.append(spark, Seq((1L, "one"), (2L, "two")).toDF("k", "v"), path)
    val v0 = ManifestStore.current(spark, path).get.version

    val bad = Seq((1L, null.asInstanceOf[String])).toDF("k", "v")
    val gated = ManifestStore.mergeChecked(spark, bad, path, "k",
      checks = Seq(NotNull("v")), quarantineDir = qdir)
    assert(gated.isLeft)
    assert(ManifestStore.current(spark, path).get.version == v0)
    assert(ManifestStore.read(spark, path).where(col("k") === 1L)
      .head().getString(1) == "one", "merge must not have applied")
    val fs = new Path(qdir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(gated.left.toOption.get.quarantine.get, "_expectations.txt")))

    val good = Seq((1L, "ONE"), (3L, "three")).toDF("k", "v")
    val merged = ManifestStore.mergeChecked(spark, good, path, "k",
      checks = Seq(NotNull("v")), quarantineDir = qdir)
    assert(merged.isRight)
    assert(merged.toOption.get.updated == 1L && merged.toOption.get.inserted == 1L)
    assert(ManifestStore.read(spark, path).count() == 3L)
  }
}
