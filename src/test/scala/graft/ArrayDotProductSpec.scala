package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Native array_dot expression: value parity with the lambda fold it
  * replaces (bitwise), null handling, type checking.
  */
class ArrayDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot equals the aggregate/zip_with fold bit-for-bit") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.37), Seq(1e10, -1e-10, 2.5)))
      .toDF("a", "b")
    val r = df.selectExpr(
      "array_dot(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS fold")
      .collect()
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1)))
  }

  test("null input propagates to null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.selectExpr("array_dot(a, b)").collect()(0).isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    GraftFunctions.register(spark)
    val df = Seq(("x", 1)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("array_dot(a, b)").collect()
    }
  }
}
