package graft

import graft.ops.QueryMetricsListener

/** The bench's task-metrics listener: window deltas, quiesce stability,
  * per-window peak reset.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot deltas attribute tasks/input/shuffle to the window that ran them") {
    val listener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = listener.quiesce()
      listener.resetPeak()
      // a shuffling job: groupBy forces exchange write+read
      (1 to 50000).toDF("x").groupBy(($"x" % 7).as("k")).count().collect()
      val delta = listener.quiesce().diff(before)
      assert(delta.tasks > 0, "tasks completed in the window")
      assert(delta.taskTimeMs >= 0 && delta.cpuTimeMs >= 0)
      assert(delta.shuffleWriteBytes > 0, "groupBy must write shuffle data")
      assert(delta.shuffleReadBytes > 0, "final agg must read shuffle data")
      assert(delta.peakExecutionMemory >= 0)

      // an idle window reports zero work
      val idleBefore = listener.quiesce()
      val idle = listener.quiesce().diff(idleBefore)
      assert(idle.tasks == 0 && idle.shuffleReadBytes == 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("MetricsHttp serves live Prometheus counters + query-duration histogram") {
    val srv = graft.ops.MetricsHttp.start(spark)
    try {
      assert(srv.port > 0, "ephemeral bind must expose the real port")
      // run a real shuffling query THROUGH the timing hook
      val n = srv.timeQuery {
        (1 to 20000).toDF("x").groupBy(($"x" % 5).as("k")).count().count()
      }
      assert(n == 5)
      srv.observeQuery(0.002) // first bucket
      srv.observeQuery(500.0) // beyond the last bound -> +Inf only
      // a failing query still records a latency (and rethrows)
      intercept[RuntimeException] { srv.timeQuery { throw new RuntimeException("boom") } }
      Thread.sleep(300) // let the async listener bus drain task events
      def scrape(): String = {
        val conn = new java.net.URL(s"http://127.0.0.1:${srv.port}/metrics")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        assert(conn.getResponseCode == 200)
        assert(conn.getContentType.startsWith("text/plain"))
        val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
        conn.disconnect()
        body
      }
      val body = scrape()
      def value(metric: String): Double = {
        val line = body.linesIterator
          .find(l => l.startsWith(metric + " ")).getOrElse(fail(s"missing $metric:\n$body"))
        line.split(' ')(1).toDouble
      }
      assert(value("graft_tasks_total") > 0, "task counters must flow from the listener")
      assert(value("graft_shuffle_write_bytes_total") > 0)
      assert(body.contains("# TYPE graft_query_duration_seconds histogram"))
      // histogram shape: cumulative buckets, exact counts
      assert(value("graft_query_duration_seconds_bucket{le=\"0.01\"}") >= 1,
        "the 2ms observation lands in the first bucket")
      assert(value("graft_query_duration_seconds_count") == 4,
        "timed query + 2 manual observations + failing query")
      assert(value("graft_query_duration_seconds_bucket{le=\"+Inf\"}") == 4)
      assert(value("graft_query_duration_seconds_bucket{le=\"120.0\"}") == 3,
        "the 500s observation is only in +Inf")
      // counters are LIVE: another query moves the next scrape
      val before = value("graft_tasks_total")
      (1 to 1000).toDF("x").count()
      Thread.sleep(300)
      assert(value("graft_tasks_total") == before) // old scrape is a snapshot string
      assert(scrape().linesIterator.find(_.startsWith("graft_tasks_total "))
        .get.split(' ')(1).toDouble > before, "a fresh scrape sees the new tasks")
    } finally srv.stop()
  }
}
