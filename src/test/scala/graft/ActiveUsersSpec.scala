package graft

import org.apache.spark.sql.functions._

import graft.ops.ActiveUsers

/** The rolling-engagement library (w16/w19/w20's engine): both forms equal a
  * brute-force trailing-window distinct count, and the planner routes each
  * regime to the form that measured cheaper.
  */
class ActiveUsersSpec extends SparkSpec {
  import spark.implicits._

  // ~40 days of activity for 30 users with gaps (seeded): exercises island
  // merging, window edges, and days with zero activity
  private lazy val events = {
    val rnd = new scala.util.Random(7)
    (1 to 2000).map { _ =>
      val day = rnd.nextInt(40)
      val user = rnd.nextInt(30).toLong
      (java.sql.Timestamp.valueOf(f"2024-03-${day % 28 + 1}%02d ${day % 24}%02d:11:00"), user)
    }.toDF("ts", "user_id")
  }

  /** Brute force: for each activity day, count distinct users active in the
    * trailing `win` days — the semantic definition both forms must match.
    */
  private def brute(win: Int, name: String) = {
    val du = ActiveUsers.dailyUsers(events)
    du.select(col("day").as("tday")).distinct().as("t")
      .join(du.as("u"), expr(s"u.day BETWEEN t.tday - interval ${win - 1} days AND t.tday"))
      .groupBy("tday").agg(countDistinct("user_id").as(name))
  }

  test("viaExplosion and viaSweep both equal the brute-force trailing distinct count") {
    val du = ActiveUsers.dailyUsers(events).localCheckpoint(eager = false)
    val windows = Seq(7 -> "wau", 30 -> "mau")
    val want = brute(7, "wau")
      .join(brute(30, "mau"), "tday")
      .withColumnRenamed("tday", "day")
      .orderBy("day").collect().toSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("day", "wau", "mau").orderBy("day").collect().toSeq
    val explo = ActiveUsers.viaExplosion(du, windows)
    val sweep = ActiveUsers.viaSweep(du, windows)
    assert(canon(explo) == want.map(r => org.apache.spark.sql.Row(r.get(0), r.getLong(1), r.getLong(2))))
    assert(canon(sweep) == canon(explo), "the two forms must be row-identical")
  }

  test("planForm picks explosion below the forecast bound and the sweep above it") {
    // forecast = pairs x sum(windows); the bound sits between the measured
    // 10x (forms equal) and 100x (sweep wins) decades
    assert(ActiveUsers.planForm(100000L, Seq(7, 30)) == "explode")
    assert(ActiveUsers.planForm(1000000L, Seq(7, 30)) == "sweep")
    // window width moves the forecast even at fixed pairs — a 365-day
    // window explodes 10x more rows than a 30-day one
    assert(ActiveUsers.planForm(400000L, Seq(30)) == "explode")
    assert(ActiveUsers.planForm(400000L, Seq(365)) == "sweep")
  }

  test("rollingActive routes by the bound and both routes answer identically") {
    val viaExplodeRoute = ActiveUsers.rollingActive(events) // tiny corpus -> explode
    val viaSweepRoute = ActiveUsers.rollingActive(events, explosionRowBound = 0L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("day", "dau", "wau", "mau").orderBy("day").collect().toSeq
    assert(canon(viaExplodeRoute) == canon(viaSweepRoute))
  }
}
