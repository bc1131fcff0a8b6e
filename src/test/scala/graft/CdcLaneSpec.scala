package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.ManifestStore
import graft.streaming.Incremental

/** End-to-end CDC lane integration: streaming CDC merge writes a manifest
  * table, the manifest-diff change feed streams its commits, and a
  * cursor-tracked downstream consumer reconstructs the table exactly —
  * three round-10 features composed the way a replication pipeline would
  * use them. The COW merge caveat is exercised too: a merge that REWRITES
  * a segment breaks the feed loudly and the consumer recovers by
  * full-refresh + cursor reset, the documented contract.
  */
class CdcLaneSpec extends SparkSpec {
  import spark.implicits._

  test("streamingMerge -> changes -> pollChanges reconstructs the table; rewrite recovery works") {
    val src = tmpDir("cdclane-in")
    val chk = tmpDir("cdclane-chk")
    val table = tmpDir("cdclane-t") + "/t"
    val cursor = tmpDir("cdclane-cur") + "/cursor"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("op", StringType)))
    def drain(): Unit = {
      val q = Incremental.streamingMerge(spark, src, schema, table, "id",
        deleteWhen = col("op") === "d", checkpoint = chk)
      q.awaitTermination(180000)
    }
    // downstream replica, fed only by the change feed
    val replica = scala.collection.mutable.Map.empty[Long, String]
    def sync(): Seq[Long] = ManifestStore.pollChanges(spark, table, cursor) { df =>
      df.orderBy("_commit_version").collect().foreach { r =>
        if (r.getString(3) == "insert") replica(r.getLong(0)) = r.getString(1)
        else replica.remove(r.getLong(0))
      }
    }
    def tableNow(): Map[Long, String] = ManifestStore.read(spark, table)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // wave 1: three inserts (one streaming batch = one merge = all-insert
    // commit, which the feed CAN express)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/a.json"),
      """{"id":1,"v":"a","op":"u"}""" + "\n" +
        """{"id":2,"v":"b","op":"u"}""" + "\n" +
        """{"id":3,"v":"c","op":"u"}""" + "\n")
    drain()
    assert(sync().nonEmpty && replica.toMap == tableNow())
    // wave 2: an UPDATE rewrites the touched segment — the feed must break
    // loudly, and the consumer full-refreshes then resumes
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/b.json"),
      """{"id":1,"v":"A","op":"u"}""" + "\n" + """{"id":4,"v":"d","op":"u"}""" + "\n")
    drain()
    val ex = intercept[IllegalArgumentException] { sync() }
    assert(ex.getMessage.contains("full-refresh"), s"got: ${ex.getMessage}")
    // recovery: refresh the replica from the table, reset the cursor
    replica.clear(); replica ++= tableNow()
    val fs = new org.apache.hadoop.fs.Path(cursor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = ManifestStore.current(spark, table).get.version
    val out = fs.create(new org.apache.hadoop.fs.Path(cursor), true)
    out.write(v.toString.getBytes("UTF-8")); out.close()
    // wave 3: fresh inserts again — the feed resumes past the rewrite
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/c.json"),
      """{"id":9,"v":"z","op":"u"}""" + "\n")
    drain()
    assert(sync().nonEmpty)
    assert(replica.toMap == tableNow(),
      s"replica=${replica.toMap} table=${tableNow()}")
    assert(replica(9L) == "z" && replica(1L) == "A")
  }
}
