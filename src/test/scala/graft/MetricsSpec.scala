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
}
