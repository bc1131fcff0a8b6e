package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated in ONE pass — the
  * Deequ-style generalization of the engine's fixed integrity checks
  * (GoldWriter.qualityReport's a13 duplicate-keys / a14 null-PK probes,
  * which the reference runs ad hoc in cleaner/cleaner.py's validation
  * block). A suite of N constraints over a table compiles to a SINGLE
  * aggregation: every non-uniqueness check is a conditional count in the
  * same Aggregate (map-side partial, one shuffle of one row per
  * partition), so checking 20 constraints on 100 TB costs one scan — not
  * 20. The one-row aggregate is then unpivoted driver-free into the
  * (check, column, total, violations, pass) report.
  *
  * Null posture follows Deequ/SQL CHECK semantics: `NotNull` is THE null
  * test; every other constraint passes NULL values (a null neither
  * matches nor violates a range/set/regex — pair with NotNull to forbid
  * them). `Unique` counts surplus rows (total minus distinct) via
  * count_distinct in the same Aggregate; Spark plans distinct aggregates
  * with an Expand that replicates the scan per distinct column, so a
  * suite with MANY Unique checks on different columns should split them
  * into separate suites rather than multiply the expansion.
  */
object Expectations {

  /** One declarative constraint; `violates` is the row-level predicate
    * counted against it (NULL predicate results count as pass, which
    * implements the null posture above for free — `count(when(p, 1))`
    * skips nulls).
    */
  sealed trait Check {
    def id: String
    def column: String
  }
  /** Column must have no NULLs. */
  final case class NotNull(column: String) extends Check { val id = "not_null" }
  /** Column values must be unique. Violations = total − distinct NON-NULL
    * values, so every NULL row counts as a violation — a unique key column
    * should pair this with [[NotNull]], and the two reports then separate
    * "missing" from "duplicated".
    */
  final case class Unique(column: String) extends Check { val id = "unique" }
  /** A COMPOSITE key must be unique: violations = total − distinct
    * fully-non-null tuples, so rows with a NULL in any key column count as
    * violations (pair with [[NotNull]] per column to separate "missing
    * part of key" from "duplicated key"). The report's `col_name` is the
    * comma-joined column list.
    */
  final case class UniqueTogether(columns: Seq[String]) extends Check {
    require(columns.size >= 2, "UniqueTogether needs >= 2 columns (use Unique for one)")
    val id = "unique_together"
    val column: String = columns.mkString(",")
  }
  /** Non-null values must fall in the CLOSED interval [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val id = "in_range"
  }
  /** Non-null values must be members of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val id = "in_set"
  }
  /** Non-null values must match the (Java) regex in full. */
  final case class MatchesRegex(column: String, regex: String) extends Check {
    val id = "matches_regex"
  }
  /** Non-null values must satisfy an arbitrary boolean Column predicate. */
  final case class Satisfies(column: String, name: String, pred: Column) extends Check {
    val id = s"satisfies_$name"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) => count(when(col(col0).isNull, lit(1)))
    case Unique(col0) => count(lit(1)) - count_distinct(col(col0))
    case UniqueTogether(cols0) =>
      count(lit(1)) - count_distinct(col(cols0.head), cols0.tail.map(col): _*)
    case InRange(col0, lo, hi) =>
      count(when(!col(col0).between(lit(lo), lit(hi)), lit(1)))
    case InSet(col0, vs) => count(when(!col(col0).isin(vs: _*), lit(1)))
    case MatchesRegex(col0, re) =>
      count(when(!col(col0).rlike("^(?:" + re + ")$"), lit(1)))
    case Satisfies(col0, _, p) => count(when(col(col0).isNotNull && !p, lit(1)))
  }

  /** Evaluate `checks` over `df` in one aggregation. Returns one row per
    * check: (check_id, col_name, total, violations, pass), ordered
    * (check_id, col_name) — a stable report shape for diffing across runs.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Expectations.run needs at least one check")
    val keys = checks.map(c => s"${c.id}:${c.column}")
    require(keys.distinct.size == keys.size,
      s"duplicate checks in suite: ${keys.diff(keys.distinct).mkString(", ")}")
    val aggs = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) => violations(c).as(s"__v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row: stack(n, 'id, 'col, v0, ...) — no
    // collect, the report materializes distributedly (trivially tiny)
    val stackArgs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.id), lit(c.column), col(s"__v$i"))
    }
    val unpivoted = one.select(
      stack((lit(checks.size) +: stackArgs): _*)
        .as(Seq("check_id", "col_name", "violations")),
      col("__total").as("total"))
    unpivoted
      .select(col("check_id"), col("col_name"), col("total"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy("check_id", "col_name")
  }

  /** [[run]] per group: the same one-pass compilation, but the aggregation
    * keys on `groupCols` — a per-source / per-partition / per-day quality
    * report over a 100 TB table still costs ONE scan + one
    * row-per-group-sized shuffle (partial aggregation applies to every
    * conditional count). Returns (groupCols..., check_id, col_name, total,
    * violations, pass) ordered by (groupCols..., check_id, col_name); each
    * group's `total` is ITS row count, so `pass` verdicts are per-group —
    * the shape that catches one bad upstream feed hiding inside a healthy
    * global aggregate.
    */
  def runBy(df: DataFrame, groupCols: Seq[String], checks: Seq[Check]): DataFrame = {
    require(groupCols.nonEmpty, "runBy needs at least one group column")
    require(checks.nonEmpty, "Expectations.runBy needs at least one check")
    val keys = checks.map(c => s"${c.id}:${c.column}")
    require(keys.distinct.size == keys.size,
      s"duplicate checks in suite: ${keys.diff(keys.distinct).mkString(", ")}")
    val aggs = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) => violations(c).as(s"__v$i") }
    val grouped = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.id), lit(c.column), col(s"__v$i"))
    }
    grouped
      .select(groupCols.map(col) ++ Seq(
        stack((lit(checks.size) +: stackArgs): _*)
          .as(Seq("check_id", "col_name", "violations")),
        col("__total").as("total")): _*)
      .select(groupCols.map(col) ++ Seq(col("check_id"), col("col_name"),
        col("total"), col("violations"), (col("violations") === 0L).as("pass")): _*)
      .orderBy((groupCols ++ Seq("check_id", "col_name")).map(col): _*)
  }
}
