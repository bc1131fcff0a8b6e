package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.ManifestStore
import graft.plans.ManifestDml

/** Row-level DML: the engine verbs (ManifestStore.deleteWhere/updateWhere —
  * merge's segment-granular copy-on-write applied to arbitrary predicates)
  * and the SQL surface routing DELETE FROM / UPDATE / MERGE INTO onto them
  * (plans/ManifestDmlStrategy). Pins semantics (NULL predicate = no match,
  * SET casts, matched/not-matched clause mapping), the copy-on-write
  * evidence (untouched segments republished verbatim), evolution interplay,
  * and the loud refusals for unsupported MERGE shapes.
  */
class DmlSpec extends SparkSpec {
  import spark.implicits._

  private def t(prefix: String): String = tmpDir(prefix) + "/t"

  test("deleteWhere rewrites only segments holding a match") {
    val path = t("dml-del")
    ManifestStore.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    ManifestStore.append(spark, Seq((10L, "x"), (11L, "y")).toDF("k", "v"), path,
      statsCols = Seq("k"))
    val before = ManifestStore.current(spark, path).get
    val rep = ManifestStore.deleteWhere(spark, path,
      col("k") === 10L && col("v") === "x")
    assert(rep.affected == 1 && rep.segmentsRewritten == 1 && rep.segmentsTotal == 2)
    // the untouched segment's entry is republished verbatim (same name)
    val after = ManifestStore.current(spark, path).get
    assert(after.entries.map(_.name).toSet.intersect(
      before.entries.map(_.name).toSet).size == 1)
    assert(ManifestStore.read(spark, path).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 11L))
    // no match: version unchanged, zero rewrites
    val noop = ManifestStore.deleteWhere(spark, path, col("k") === 999L)
    assert(noop.affected == 0 && noop.segmentsRewritten == 0 &&
      noop.version == after.version)
  }

  test("updateWhere edits matched rows in place, casting to column types") {
    val path = t("dml-upd")
    ManifestStore.append(spark,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "n"), path)
    val rep = ManifestStore.updateWhere(spark, path, col("k") === 2L,
      Map("v" -> lit("B"), "n" -> (col("n") + 1)))
    assert(rep.affected == 1)
    assert(ManifestStore.read(spark, path).orderBy("k").collect().toSeq ==
      Seq(Row(1L, "a", 10), Row(2L, "B", 21)))
    // NULL predicate result = no match (SQL WHERE posture)
    val n = ManifestStore.updateWhere(spark, path,
      when(col("k") === 1L, lit(null).cast("boolean")).otherwise(col("k") === 2L),
      Map("v" -> lit("C")))
    assert(n.affected == 1) // only k=2 (true); k=1's NULL doesn't match
    intercept[IllegalArgumentException] {
      ManifestStore.updateWhere(spark, path, lit(true), Map("nope" -> lit(1)))
    }
  }

  test("DML respects outstanding merge-on-read deletes") {
    val path = t("dml-mor")
    ManifestStore.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), path)
    ManifestStore.deleteKeysMergeOnRead(spark, path, "k", Seq(2L).toDF("k"))
    // k=2 is MOR-deleted: an update matching it affects nothing visible,
    // and the rewrite (from the assembled view) must not resurrect it
    val rep = ManifestStore.updateWhere(spark, path, col("k") >= 2L,
      Map("v" -> lit("Z")))
    assert(rep.affected == 1) // only k=3
    assert(ManifestStore.read(spark, path).orderBy("k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(3L, "Z")))
  }

  private def sqlSetup(name: String): String = {
    if (spark.conf.getOption("spark.sql.catalog.dml").isEmpty) {
      spark.conf.set("spark.sql.catalog.dml", "graft.sources.ManifestCatalog")
      spark.conf.set("spark.sql.catalog.dml.warehouse", tmpDir("dml-wh"))
    }
    ManifestDml.install(spark)
    spark.sql(s"DROP TABLE IF EXISTS dml.default.$name")
    spark.sql(s"CREATE TABLE dml.default.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statscols'='k')")
    spark.sql(s"INSERT INTO dml.default.$name VALUES (1,'a'),(2,'b'),(3,'c')")
    s"dml.default.$name"
  }

  test("SQL DELETE FROM routes to deleteWhere") {
    val tab = sqlSetup("d")
    spark.sql(s"DELETE FROM $tab WHERE k > 1 AND v <> 'c'")
    assert(spark.sql(s"SELECT k, v FROM $tab ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(3L, "c")))
  }

  test("SQL UPDATE routes to updateWhere, self-referencing SET included") {
    val tab = sqlSetup("u")
    spark.sql(s"UPDATE $tab SET v = concat(v, '!'), k = k + 10 WHERE k >= 2")
    assert(spark.sql(s"SELECT k, v FROM $tab ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(12L, "b!"), Row(13L, "c!")))
  }

  test("SQL MERGE: update + insert, delete clause, and gated insert") {
    val tab = sqlSetup("m")
    spark.sql(s"""MERGE INTO $tab t
      USING (SELECT col1 AS k, col2 AS v FROM VALUES
        (2L,'B'), (3L,'drop'), (9L,'i'), (10L,'skip')) s
      ON t.k = s.k
      WHEN MATCHED AND s.v = 'drop' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s.v <> 'skip' THEN INSERT *""")
    assert(spark.sql(s"SELECT k, v FROM $tab ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "B"), Row(9L, "i")))
  }

  test("SQL MERGE insert-only = first-write-wins upsert (ON CONFLICT DO NOTHING)") {
    val tab = sqlSetup("n")
    spark.sql(s"""MERGE INTO $tab t
      USING (SELECT col1 AS k, col2 AS v FROM VALUES (2L,'CLOBBER'), (7L,'g')) s
      ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    // matched k=2 untouched (DO NOTHING), unmatched k=7 inserted
    assert(spark.sql(s"SELECT k, v FROM $tab ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"), Row(7L, "g")))
  }

  test("unsupported MERGE shapes refuse loudly, and frozen views are read-only") {
    val tab = sqlSetup("x")
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $tab t USING (SELECT 1L AS k, 'z' AS v) s
        ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = 'z'""")
    }
    assert(e1.getMessage.contains("UPDATE SET *"))
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $tab t USING (SELECT 1L AS k, 'z' AS v) s
        ON t.k = s.k WHEN MATCHED THEN DELETE""")
    }
    assert(e2.getMessage.contains("fallback"))
    val e3 = intercept[Exception] {
      spark.sql(s"DELETE FROM $tab VERSION AS OF 2 WHERE k = 1")
    }
    // either our frozen-view refusal or Spark's own time-travel DML error
    assert(e3 != null)
  }

  test("SQL DML over an evolved (renamed+widened) table") {
    val tab = sqlSetup("e")
    spark.sql(s"ALTER TABLE $tab RENAME COLUMN k TO id")
    spark.sql(s"UPDATE $tab SET v = 'R' WHERE id = 2")
    spark.sql(s"DELETE FROM $tab WHERE id = 3")
    spark.sql(s"""MERGE INTO $tab t
      USING (SELECT 5L AS id, 'm' AS v) s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(s"SELECT id, v FROM $tab ORDER BY id").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "R"), Row(5L, "m")))
  }
}
