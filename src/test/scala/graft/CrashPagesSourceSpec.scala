package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.CrashPagesSource

/** DSv2 connector over the reference's landed page layout: gzip JSON arrays
  * under year=/corr= keys, with filter-driven file pruning and column
  * pruning (SURVEY §4: the S1 pushdown mirrored at a real Spark source).
  */
class CrashPagesSourceSpec extends SparkSpec {

  private def gz(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  private lazy val base: String = {
    val dir = tmpDir("pages")
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    // The extractor's real format: gzip JSON arrays, one per page.
    put("year=2023/corr=run-a/offset=0_limit=2.json.gz", gz(
      """[{"crash_record_id":"a1","crash_date":"2023-05-01T10:00:00","crash_type":"X"},
        | {"crash_record_id":"a2","crash_date":"2023-06-01T11:00:00","crash_type":"Y"}]""".stripMargin))
    put("year=2024/corr=run-a/offset=0_limit=2.json.gz", gz(
      """[{"crash_record_id":"a3","crash_date":"2024-01-01T10:00:00","crash_type":"X"}]"""))
    put("year=2024/corr=run-b/offset=0_limit=2.json.gz", gz(
      """{"data":[{"crash_record_id":"b1","crash_date":"2024-02-01T10:00:00","crash_type":"Z"}]}"""))
    put("year=2024/corr=run-b/bad.json", "not json at all".getBytes("UTF-8"))
    dir
  }

  private def read() =
    spark.read.format("graft.sources.CrashPagesSource").option("path", base).load()

  test("reads gzip JSON-array pages with the Bronze schema + partition columns") {
    val df = read()
    assert(df.schema.fieldNames.contains("crash_record_id"))
    assert(df.schema.fieldNames.takeRight(2).toSeq == Seq("year", "corr"))
    val rows = df.select("crash_record_id", "year", "corr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("a1", "2023", "run-a"), ("a2", "2023", "run-a"),
      ("a3", "2024", "run-a"), ("b1", "2024", "run-b")))
  }

  test("envelope pages ({\"data\": [...]}) and corrupt pages handled like the reference") {
    // b1 came from the envelope form; bad.json contributed zero rows but no failure
    assert(read().where(col("crash_record_id") === "b1").count() == 1)
  }

  test("crash_date filter prunes year directories before reading (pushdown)") {
    val df = read().where(col("crash_date") >= "2024-01-01T00:00:00")
    assert(df.select("crash_record_id").collect().map(_.getString(0)).toSet ==
      Set("a3", "b1"))
    // The scan's description reports the year bound derived from the filter.
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("yearBounds=[2024,-]"), s"plan was:\n$scanDesc")
  }

  test("corr equality filter prunes to one run's files") {
    val df = read().where(col("corr") === "run-b")
    assert(df.select("crash_record_id").collect().map(_.getString(0)).toSet == Set("b1"))
    assert(df.queryExecution.executedPlan.toString.contains("corr=run-b"))
  }

  test("column pruning reaches the reader (required schema only)") {
    val df = read().select("crash_type")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("columns=[crash_type]"), s"plan was:\n$desc")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("X", "X", "Y", "Z"))
  }

  test("filters remain exact at row level (pruning is a superset guarantee)") {
    // Both 2023 rows are in one file; the row filter must still split them.
    val df = read().where(col("crash_date") >= "2023-06-01T00:00:00" &&
      col("crash_date") < "2024-01-01T00:00:00")
    assert(df.select("crash_record_id").collect().map(_.getString(0)).toSeq == Seq("a2"))
  }

  test("vehicles entity schema via option") {
    assert(CrashPagesSource.schemaFor("vehicles").fieldNames.contains("make"))
  }
}
