package graft

import graft.gold.GoldWriter

/** Upsert semantics pinned to cleaner/duckdb_writer.py:141-207 (ON CONFLICT
  * DO NOTHING = first-write-wins) and the integrity checks (:228-288).
  */
class GoldWriterSpec extends SparkSpec {
  import spark.implicits._

  test("upsert inserts new keys, skips existing, drops null keys, dedups within batch") {
    val path = tmpDir("gold") + "/gold"
    val b1 = Seq(("c1", 1), ("c2", 2)).toDF("crash_record_id", "v")
    val r1 = GoldWriter.upsert(spark, b1, path)
    assert(r1.insertedRows == 2 && r1.totalRows == 2)

    val b2 = Seq(("c2", 99), ("c3", 3), ("c3", 3), (null, 4))
      .toDF("crash_record_id", "v")
    val r2 = GoldWriter.upsert(spark, b2, path)
    assert(r2.insertedRows == 1, "only c3 is new; c2 conflict-skipped, dup+null dropped")
    assert(r2.totalRows == 3 && r2.duplicateKeys == 0 && r2.nullKeys == 0)

    // first-write-wins: c2 keeps its original value
    val c2 = spark.read.parquet(path).where($"crash_record_id" === "c2").collect()(0)
    assert(c2.getInt(1) == 2)
  }

  test("upsert is idempotent: replaying the same batch is a no-op (ST4 at-least-once safety)") {
    val path = tmpDir("gold2") + "/gold"
    val b = Seq(("c1", 1), ("c2", 2)).toDF("crash_record_id", "v")
    GoldWriter.upsert(spark, b, path)
    val replay = GoldWriter.upsert(spark, b, path)
    assert(replay.insertedRows == 0 && replay.totalRows == 2)
  }
}
