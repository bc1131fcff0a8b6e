package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-engagement (DAU / WAU / MAU) library: BOTH exact forms of the
  * trailing-window distinct-user count, plus the forecast planner that
  * routes between them — the measured w16-vs-w19 bracket automated, the
  * [[graft.ext.Similarity.planBandBits]] philosophy applied to the MAU
  * family.
  *
  * The two forms (identical output, different scale behavior):
  *  - EXPLOSION (`viaExplosion`, the registered `w16_active_users` shape):
  *    each (day, user) activity pair explodes into the trailing windows it
  *    serves (win generator rows), then one distinct+count per target day.
  *    Work is O(pairs x window) but the plan is two hash aggregates — the
  *    cheap form while pairs x window is modest.
  *  - ISLAND SWEEP (`viaSweep`, the registered `w19_active_users_sweep`
  *    shape): per user, activity days merge into coverage islands (a new
  *    island starts when the gap exceeds the window), each island emits two
  *    boundary deltas, and the per-day count is the prefix sum over the day
  *    axis. Work is O(pairs) independent of window width, at the cost of
  *    two per-user window passes and a boundary aggregation per window.
  *
  * Measured crossover (SCALE.md session-9): at the 10x event decade the two
  * forms cost about the same; at 100x the sweep wins 93.8 vs 172.0 task-s.
  * [[planForm]]'s default bound puts the switch between those decades.
  */
object ActiveUsers {

  /** Distinct (day, user_id) activity pairs — the shared projection both
    * forms consume. `events` needs `ts` and `user_id` columns.
    */
  def dailyUsers(events: DataFrame): DataFrame =
    events.select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()

  /** Per-day distinct users over the (already distinct) pair projection. */
  private def dailyActive(du: DataFrame): DataFrame =
    du.groupBy("day").agg(count(lit(1)).as("dau"))

  /** Generator-explosion form: O(pairs x window) rows, two hash aggregates
    * per window. `windows` maps trailing width (days) to output column name,
    * e.g. `Seq(7 -> "wau", 30 -> "mau")`. Output: (day, dau, <names...>),
    * one row per activity day. Callers looping over the result should pass
    * a checkpointed `du` (it feeds DAU plus one explosion per window).
    */
  def viaExplosion(du: DataFrame, windows: Seq[(Int, String)]): DataFrame = {
    def rolling(win: Int, name: String) = du
      .select(explode(expr(
        s"sequence(day, day + interval ${win - 1} days, interval 1 day)")).as("tday"),
        col("user_id"))
      .distinct()
      .groupBy("tday").agg(count(lit(1)).as(name))
    windows.foldLeft(dailyActive(du)) { case (acc, (win, name)) =>
      acc.join(rolling(win, name), col("day") === col("tday")).drop("tday")
    }
  }

  /** Coverage-island sweep form: O(pairs) independent of window width.
    * Island detection is a per-user window over distinct days (calendar-
    * bounded state); boundary deltas partial-aggregate per day BEFORE the
    * shuffle, so the prefix-sum window's input is one row per distinct day —
    * calendar-bounded, never a row per user or per event. Output matches
    * [[viaExplosion]] exactly (row for row).
    */
  def viaSweep(du: DataFrame, windows: Seq[(Int, String)]): DataFrame = {
    val base = dailyActive(du)
    def sweep(win: Int, name: String) = {
      val wu = Window.partitionBy("user_id").orderBy("day")
      val isl = du
        .withColumn("brk",
          when(datediff(col("day"),
            lag("day", 1).over(wu)) <= lit(win - 1), 0).otherwise(1))
        .withColumn("grp", sum("brk").over(wu))
        .groupBy("user_id", "grp")
        .agg(min("day").as("s"),
          expr(s"max(day) + interval ${win - 1} days").as("e"))
      val bounds = isl.select(col("s").as("day"), lit(1L).as("delta"))
        .unionByName(isl.select(expr("e + interval 1 day").as("day"),
          lit(-1L).as("delta")))
        // dau days enter with delta 0 so the prefix sum has a row at every
        // day the final join needs (counts only change at island boundaries,
        // but consumers read them at activity days)
        .unionByName(base.select(col("day"), lit(0L).as("delta")))
        .groupBy("day").agg(sum("delta").as("delta"))
      val wd = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.withColumn(name, sum("delta").over(wd).cast("long"))
        .select(col("day").as("tday"), col(name))
    }
    windows.foldLeft(base) { case (acc, (win, name)) =>
      acc.join(sweep(win, name), col("day") === col("tday")).drop("tday")
    }
  }

  /** Forecast-based form choice from ONE number: the explosion emits
    * `nPairs x sum(windows)` generator rows, the sweep is O(nPairs) with a
    * higher per-stage constant — so route on the forecast explosion volume.
    * The default bound sits between the measured 10x decade (forms roughly
    * equal) and the 100x decade (sweep wins ~1.8x): explosion forecasts of
    * ~4-11M rows at 10x stay exploded, the ~40-110M forecasts at 100x
    * sweep. Driver state: the one long the caller already has.
    */
  def planForm(nPairs: Long, windows: Seq[Int],
      explosionRowBound: Long = 20000000L): String =
    if (nPairs * windows.map(_.toLong).sum > explosionRowBound) "sweep"
    else "explode"

  /** Auto-routed rolling engagement: one count on the shared distinct
    * projection picks the form — and, being the first action on the
    * lazily-marked checkpoint, it also materializes it (the one-action
    * checkpoint+count discipline of the dedup family), so the decision is
    * free. Output: (day, dau, <window names...>), one row per activity day.
    */
  def rollingActive(events: DataFrame,
      windows: Seq[(Int, String)] = Seq(7 -> "wau", 30 -> "mau"),
      explosionRowBound: Long = 20000000L): DataFrame = {
    val du = dailyUsers(events).localCheckpoint(eager = false)
    val nPairs = du.count()
    if (planForm(nPairs, windows.map(_._1), explosionRowBound) == "sweep")
      viaSweep(du, windows)
    else viaExplosion(du, windows)
  }
}
