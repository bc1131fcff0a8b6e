package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions installation path: a session created with
  * GraftExtensions resolves the native functions with no runtime register
  * call.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("array_dot resolves via spark.sql.extensions-style injection, SQL and expr paths") {
    // Force a NEW SparkSession (same SparkContext) so withExtensions applies:
    // getOrCreate returns the active session otherwise.
    spark.sparkContext // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val injected = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      assert(injected ne spark, "test requires a fresh session")
      val r = injected
        .sql("SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(r == 32.0)
      // visible as a catalog function with usage text
      val desc = injected.sql("DESCRIBE FUNCTION array_dot")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("array_dot"))
      // the dedup-family expressions inject too
      val mh = injected
        .sql("SELECT minhash8(shingle3(split('a b c d', ' '))) AS mh")
        .collect()(0).getSeq[String](0)
      assert(mh.length == 8 && mh.forall(h => h != null && h.length == 8))
      val gn = injected
        .sql("SELECT shinglen(split('a b c d', ' '), 2) AS g")
        .collect()(0).getSeq[String](0)
      assert(gn == Seq("a b", "b c", "c d"))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
