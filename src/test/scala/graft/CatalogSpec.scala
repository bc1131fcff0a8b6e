package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.ManifestStore

/** Name-based SQL DDL for manifest tables (sources/ManifestCatalog, a
  * TableCatalog + SupportsNamespaces plugin): CREATE/INSERT/SELECT/ALTER/
  * SHOW/DROP with no per-statement OPTIONS(path) plumbing, `VERSION AS OF`
  * time travel in native syntax, and schema evolution DDL routed to the
  * metadata-only ManifestStore verbs. The catalog adds NO metadata store
  * beside the table format itself — a table's schema lives in its manifest,
  * so `loadTable` is one manifest read.
  */
class CatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = tmpDir("graft-catalog-wh")
    spark.conf.set("spark.sql.catalog.cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.cat.warehouse", w)
    w
  }

  test("create/insert/select/drop lifecycle, name-based") {
    warehouse
    spark.sql("CREATE TABLE cat.default.life (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statscols'='k')")
    spark.sql("INSERT INTO cat.default.life VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO cat.default.life VALUES (3, 'c')")
    assert(spark.sql("SELECT k, v FROM cat.default.life ORDER BY k")
      .collect().toSeq == Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    // the statscols property took: both committed segments carry k stats
    val path = s"$warehouse/default/life"
    val snap = ManifestStore.current(spark, path).get
    assert(snap.entries.size == 2 && snap.entries.forall(_.stats.contains("k")))
    // SHOW TABLES sees it; DROP removes it
    assert(spark.sql("SHOW TABLES IN cat.default").collect()
      .map(_.getString(1)).contains("life"))
    spark.sql("DROP TABLE cat.default.life")
    assert(!spark.sql("SHOW TABLES IN cat.default").collect()
      .map(_.getString(1)).contains("life"))
  }

  test("CREATE TABLE initializes an EMPTY readable table (schema in manifest)") {
    warehouse
    spark.sql("CREATE TABLE cat.default.empty (a INT, b STRING)")
    val out = spark.sql("SELECT * FROM cat.default.empty")
    assert(out.columns.toSeq == Seq("a", "b") && out.count() == 0)
    spark.sql("DROP TABLE cat.default.empty")
  }

  test("INSERT OVERWRITE routes through the single-CAS overwrite verb") {
    warehouse
    spark.sql("CREATE TABLE cat.default.ow (k BIGINT)")
    spark.sql("INSERT INTO cat.default.ow VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE cat.default.ow VALUES (9)")
    assert(spark.sql("SELECT k FROM cat.default.ow").collect().toSeq ==
      Seq(Row(9L)))
    spark.sql("DROP TABLE cat.default.ow")
  }

  test("VERSION AS OF resolves a frozen snapshot in native SQL syntax") {
    warehouse
    spark.sql("CREATE TABLE cat.default.tt (k BIGINT)") // v1
    spark.sql("INSERT INTO cat.default.tt VALUES (1)") // v2
    spark.sql("INSERT INTO cat.default.tt VALUES (2)") // v3
    assert(spark.sql("SELECT k FROM cat.default.tt VERSION AS OF 2")
      .collect().toSeq == Seq(Row(1L)))
    assert(spark.sql("SELECT count(*) FROM cat.default.tt").head().getLong(0) == 2)
    spark.sql("DROP TABLE cat.default.tt")
  }

  test("ALTER TABLE routes to the metadata-only evolution verbs") {
    warehouse
    spark.sql("CREATE TABLE cat.default.evo (k INT, v STRING)")
    spark.sql("INSERT INTO cat.default.evo VALUES (1, 'a')")
    spark.sql("ALTER TABLE cat.default.evo RENAME COLUMN k TO id")
    spark.sql("ALTER TABLE cat.default.evo ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE cat.default.evo ADD COLUMNS (w DOUBLE)")
    spark.sql("INSERT INTO cat.default.evo VALUES (CAST(2 AS BIGINT), 'b', 0.5)")
    val got = spark.sql("SELECT id, v, w FROM cat.default.evo ORDER BY id")
    assert(got.schema("id").dataType.simpleString == "bigint")
    assert(got.collect().toSeq == Seq(Row(1L, "a", null), Row(2L, "b", 0.5)))
    // predicate on the renamed+widened column still answers correctly
    assert(spark.sql("SELECT v FROM cat.default.evo WHERE id > 1")
      .collect().toSeq == Seq(Row("b")))
    spark.sql("DROP TABLE cat.default.evo")
  }

  test("namespaces: create, list, drop; tables list per namespace") {
    warehouse
    spark.sql("CREATE NAMESPACE cat.gold")
    assert(spark.sql("SHOW NAMESPACES IN cat").collect()
      .map(_.getString(0)).contains("gold"))
    spark.sql("CREATE TABLE cat.gold.t1 (k INT)")
    spark.sql("CREATE TABLE cat.gold.t2 (k INT)")
    assert(spark.sql("SHOW TABLES IN cat.gold").collect()
      .map(_.getString(1)).sorted.toSeq == Seq("t1", "t2"))
    // non-cascade drop of a non-empty namespace refuses
    intercept[Exception] { spark.sql("DROP NAMESPACE cat.gold") }
    spark.sql("DROP NAMESPACE cat.gold CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN cat").collect()
      .map(_.getString(0)).contains("gold"))
  }

  test("RENAME TABLE moves the directory; CREATE on an existing name refuses") {
    warehouse
    spark.sql("CREATE TABLE cat.default.a (k INT)")
    spark.sql("INSERT INTO cat.default.a VALUES (7)")
    // both target syntaxes: catalog-qualified and bare
    spark.sql("ALTER TABLE cat.default.a RENAME TO cat.default.mid")
    spark.sql("ALTER TABLE cat.default.mid RENAME TO default.b")
    assert(spark.sql("SELECT k FROM cat.default.b").collect().toSeq == Seq(Row(7)))
    intercept[Exception] { spark.sql("CREATE TABLE cat.default.b (k INT)") }
    spark.sql("DROP TABLE cat.default.b")
  }

  test("Dashboard.catalog lists a v2-catalog namespace through the plugin API") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.dash")
    spark.sql("CREATE TABLE cat.dash.x (k BIGINT, v STRING)")
    spark.sql("CREATE TABLE cat.dash.y (a INT)")
    val listing = graft.analytics.Dashboard.catalog(spark, "cat.dash")
    assert(listing.collect().toSeq == Seq(
      Row("x", "k", "bigint"), Row("x", "v", "string"), Row("y", "a", "int")))
    spark.sql("DROP NAMESPACE cat.dash CASCADE")
  }

  test("path traversal and reserved names are rejected") {
    warehouse
    intercept[Exception] { spark.sql("CREATE TABLE cat.default.`..` (k INT)") }
    intercept[Exception] {
      spark.sql("CREATE TABLE cat.default.`_manifest` (k INT)")
    }
  }
}
