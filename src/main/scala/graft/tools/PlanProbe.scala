package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI plan auditor: executes named registry queries against a scale-factor
  * dir and prints the plan-shape facts SCALE.md cites (join strategies,
  * exchanges, windows, whole-stage-codegen spans) — the command-line
  * sibling of PlanAuditSpec for ad-hoc "is this still the plan I want?"
  * checks while iterating.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <query>[,<query>...]
  */
object PlanProbe {

  private val Nodes = Seq(
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "Exchange", "Window",
    "TakeOrderedAndProject", "WholeStageCodegen")

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PlanProbe <sfDir> <q1>[,<q2>...]")
    val Array(dir, names) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-plan-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // every entry-point session sets this (Tables.events relies on it for
      // legacy NANOS-layout fixtures; see GraftSession)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
        val q = graft.analytics.Registry.byName(n).fn(spark, dir)
        q.collect() // executed (not just planned): AQE finalizes the shapes
        val p = q.queryExecution.executedPlan.toString
        // word-boundary match, not raw substring: "Exchange" must not also
        // count "BroadcastExchange" (SCALE.md cites these as SHUFFLE counts)
        val counts = Nodes.map { j =>
          val m = java.util.regex.Pattern
            .compile("(?<![A-Za-z])" + java.util.regex.Pattern.quote(j)).matcher(p)
          var c = 0
          while (m.find()) c += 1
          s"$j=$c"
        }
        println(s"PLANPROBE $n: ${counts.mkString(" ")}")
      }
    } finally spark.stop()
  }
}
