package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations
import graft.ops.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def report(checks: Seq[Check]) = {
    val df = Seq(
      (Some(1L), Some("en"), Some(10L)),
      (Some(1L), Some("en"), Some(20L)), // dup key
      (Some(2L), Some("xx"), Some(-5L)), // bad lang, out of range
      (None, None, None) // nulls everywhere
    ).toDF("id", "lang", "n")
    Expectations.run(df, checks).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
  }

  test("every check kind counts its violations; non-NotNull checks pass NULLs") {
    val rows = report(Seq(
      NotNull("id"), Unique("id"), InSet("lang", Seq("en", "fr")),
      InRange("n", 0, 100), MatchesRegex("lang", "[a-z]{2}"),
      Satisfies("n", "even", col("n") % 2 === 0)))
    val byCheck = rows.map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(rows.forall(_._3 == 4L), "total is the table row count on every report row")
    assert(byCheck(("not_null", "id")) == (1L, false))
    // 4 rows, 2 distinct non-null ids => 2 surplus (the dup AND the null row)
    assert(byCheck(("unique", "id")) == (2L, false))
    // null lang passes set/regex checks; 'xx' fails the set, passes the regex
    assert(byCheck(("in_set", "lang")) == (1L, false))
    assert(byCheck(("matches_regex", "lang")) == (0L, true))
    // null n passes the range; -5 fails it; evens: 10,20 pass, -5 odd fails
    assert(byCheck(("in_range", "n")) == (1L, false))
    assert(byCheck(("satisfies_even", "n")) == (1L, false))
  }

  test("UniqueTogether: composite-key surplus, any-null tuples count as violations") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(1L), Some("b")), // dup composite
      (Some(2L), None) // null part of key
    ).toDF("k1", "k2")
    val r = Expectations.run(df, Seq(UniqueTogether(Seq("k1", "k2")))).head()
    assert(r.getString(1) == "k1,k2")
    // 4 rows, 2 distinct fully-non-null tuples => 2 violations
    assert(r.getLong(3) == 2L && !r.getBoolean(4))
    intercept[IllegalArgumentException] { UniqueTogether(Seq("k1")) }
  }

  test("runBy: per-group verdicts split where the global aggregate would hide a bad feed") {
    val df = Seq(
      ("feedA", Some(10L)), ("feedA", Some(20L)),
      ("feedB", Some(10L)), ("feedB", None) // feedB smuggles a null
    ).toDF("src", "n")
    val rows = Expectations.runBy(df, Seq("src"),
      Seq(NotNull("n"), InRange("n", 0, 100)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      ("feedA", "in_range", 0L, true), ("feedA", "not_null", 0L, true),
      ("feedB", "in_range", 0L, true), ("feedB", "not_null", 1L, false)))
    // per-group totals are the group's own row count
    val totals = Expectations.runBy(df, Seq("src"), Seq(NotNull("n")))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(totals == Map("feedA" -> 2L, "feedB" -> 2L))
  }

  test("report is ordered, one aggregation wide; duplicate checks rejected") {
    val rows = report(Seq(Unique("id"), NotNull("id"), NotNull("lang")))
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq(("not_null", "id"), ("not_null", "lang"), ("unique", "id")))
    intercept[IllegalArgumentException] {
      report(Seq(NotNull("id"), NotNull("id")))
    }
    // the whole suite is ONE Aggregate over ONE scan: the plan contains a
    // single generator over a single-row aggregate, no join/union fan-out
    val df = Seq((1L, "a")).toDF("id", "lang")
    val plan = Expectations.run(df,
      Seq(NotNull("id"), InSet("lang", Seq("a")), Satisfies("id", "pos", col("id") > 0)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union") && !plan.contains("Join"),
      s"expected one-pass plan, got:\n$plan")
  }
}
