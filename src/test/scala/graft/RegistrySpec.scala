package graft

import graft.analytics.Registry

/** Registry integrity: every registered query must analyze against the
  * smallest fixture and carry an oracle — broken column references or
  * missing oracle rows surface in `sbt test`, not first at Verify time.
  */
class RegistrySpec extends SparkSpec {

  test("every registered query analyzes at sf0.001, has an oracle, names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    Registry.all.foreach { q =>
      // fn() may run driver-coordinated passes (quantile descent, CC) —
      // constructing the frame plus .schema forces full analysis
      val df = q.fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"${q.name}: empty schema")
      assert(q.oracle.exists(_.trim.nonEmpty), s"${q.name}: missing oracle SQL")
      // column names must line up with the oracle's aliases for the driver's
      // name-sorted hash compare; cheap sanity: every output column name
      // appears somewhere in the oracle text
      val sql = q.oracle.get.toLowerCase
      df.schema.fieldNames.foreach { c =>
        assert(sql.contains(c.toLowerCase),
          s"${q.name}: output column '$c' absent from oracle SQL (alias drift)")
      }
    }
  }
}
