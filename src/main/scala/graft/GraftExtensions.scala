package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ArrayDotProduct, MinHash8, Shingle3, ShingleN, Simhash32}

/** The library's `SparkSessionExtensions` injector — the idiomatic
  * installation path for a Spark-native library: a user (or cluster config)
  * sets
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session created on that context has the engine's native
  * functions analyzed, optimized and codegen'd like built-ins — no runtime
  * `register` call required, SQL and DataFrame paths both covered, and the
  * function shows up in `DESCRIBE FUNCTION`.
  *
  * (`GraftFunctions.register` remains as the session-scoped fallback for
  * driver-owned sessions the library cannot configure — e.g. the harness's
  * own Verify/Bench sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    // SQL row-level DML (DELETE/UPDATE/MERGE) over manifest tables — the
    // planner strategy claims the analyzed DML nodes when the target is a
    // ManifestTable and routes them to the engine verbs
    extensions.injectPlannerStrategy(_ => graft.plans.ManifestDmlStrategy)
    extensions.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(
        classOf[ArrayDotProduct].getName,
        null,
        "array_dot",
        "array_dot(a, b) - Codegen'd dot product of two array<double> columns.",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDotProduct(exprs(0), exprs(1))))
    extensions.injectFunction((
      new FunctionIdentifier("minhash8"),
      new ExpressionInfo(
        classOf[MinHash8].getName,
        null,
        "minhash8",
        "minhash8(sh) - All 8 MinHash slice-minima of a shingle set in one pass.",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHash8(exprs(0))))
    extensions.injectFunction((
      new FunctionIdentifier("shingle3"),
      new ExpressionInfo(
        classOf[Shingle3].getName,
        null,
        "shingle3",
        "shingle3(t) - Distinct 3-gram word shingles of a token array in one pass.",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Shingle3(exprs(0))))
    extensions.injectFunction((
      new FunctionIdentifier("shinglen"),
      new ExpressionInfo(
        classOf[ShingleN].getName,
        null,
        "shinglen",
        "shinglen(t, n) - Distinct n-gram word shingles (empty if fewer than n tokens).",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleN(exprs(0), exprs(1))))
    extensions.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(
        classOf[Simhash32].getName,
        null,
        "simhash32",
        "simhash32(toks) - 32-bit SimHash signature of a token set in one pass.",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash32(exprs(0))))
  }
}
