package graft

import org.apache.spark.sql.functions.col

import graft.silver.Transformer

/** Silver-merge behaviors pinned to transformer/transformer.py:201-305. */
class TransformerSpec extends SparkSpec {
  import spark.implicits._

  test("standardize lowercases/trims names and drops duplicate rows") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2))
      .toDF(" Crash_Record_ID ", "Num_Units")
    val out = Transformer.standardize(df)
    assert(out.columns.toSeq == Seq("crash_record_id", "num_units"))
    assert(out.count() == 2)
  }

  test("aggregateManyToOne: count + sorted distinct non-null lists, first <=5 string cols") {
    val df = Seq(
      ("c1", "FORD", "SUV"),
      ("c1", "audi", null),
      ("c1", "FORD", "SUV"),
      ("c2", null, "VAN"))
      .toDF("crash_record_id", "make", "unit_type")
    val out = Transformer.aggregateManyToOne(df, "crash_record_id", "veh")
    val r = out.orderBy("crash_record_id").collect()
    assert(out.columns.toSeq ==
      Seq("crash_record_id", "veh_count", "veh_make_list", "veh_unit_type_list"))
    assert(r(0).getLong(1) == 3) // c1 count, duplicates included
    assert(r(0).getSeq[String](2) == Seq("FORD", "audi")) // sorted, distinct, nulls dropped
    assert(r(1).getSeq[String](2) == Seq.empty) // all-null -> empty list
  }

  test("mergeCrashVehiclesPeople: left joins preserve crashes with no enrich rows; dedup keeps one row per key") {
    val crashes = Seq(
      ("c1", "2024-01-01T00:00:00", "X"),
      ("c1", "2024-01-01T00:00:00", "X"), // exact dup removed by standardize
      ("c2", "2024-01-02T00:00:00", "Y"))
      .toDF("Crash_Record_ID", "crash_date", "crash_type")
    val vehicles = Seq(("c1", "FORD")).toDF("crash_record_id", "make")
    val people   = Seq(("c1", "DRIVER"), ("c1", "PASSENGER")).toDF("crash_record_id", "person_type")
    val out = Transformer.mergeCrashVehiclesPeople(crashes, vehicles, people, "crash_record_id")
    assert(out.count() == 2)
    val c1 = out.where(col("crash_record_id") === "c1").collect()(0)
    assert(c1.getAs[Long]("veh_count") == 1)
    assert(c1.getAs[Long]("ppl_count") == 2)
    val c2 = out.where(col("crash_record_id") === "c2").collect()(0)
    assert(c2.isNullAt(c2.fieldIndex("veh_count"))) // 0-vehicle crash -> null roll-up
  }

  test("dedupKeepFirst is deterministic under an explicit total order") {
    val df = Seq(("k", 2, "b"), ("k", 1, "a"), ("k", 1, "z"))
      .toDF("id", "seq", "v")
    val out = Transformer.dedupKeepFirst(df, "id", Seq(col("seq"), col("v")))
    assert(out.collect()(0).getString(2) == "a")
  }

  test("makeCsvSafe serializes array columns to JSON strings with _json rename") {
    val df = Seq(("c1", Seq("A", "B"))).toDF("id", "makes")
    val out = Transformer.makeCsvSafe(df)
    assert(out.columns.toSeq == Seq("id", "makes_json"))
    assert(out.collect()(0).getString(1) == """["A","B"]""")
  }
}
