package graft

import org.apache.spark.sql.functions._

import graft.ml.Scoring

/** ML scoring path (UD3/A17): train, score at threshold, metrics. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gold = {
    // Separable synthetic data: hit-and-run concentrates at night hours.
    val rows = (0 until 200).map { i =>
      val hitRun = if (i % 5 < 2) 1 else 0
      val hour = if (hitRun == 1) 2 + i % 4 else 12 + i % 6
      (s"c$i", hour, 1 + i % 7, if (i % 7 >= 6) 1 else 0, 2, i % 3 * 1.0,
        30 + (i % 4) * 5, 41.7 + (i % 10) * 0.01, -87.9 + (i % 10) * 0.01,
        if (hitRun == 1) "DARKNESS" else "DAYLIGHT",
        if (i % 2 == 0) "CLEAR" else "RAIN", "DRY", "TRAFFIC SIGNAL",
        "NO INJURY / DRIVE AWAY", if (hour < 7) "night" else "morning", hitRun)
    }
    rows.toDF("crash_record_id", "crash_hour", "crash_day_of_week", "is_weekend",
      "num_units", "injuries_total", "posted_speed_limit", "latitude", "longitude",
      "lighting_condition", "weather_condition", "roadway_surface_cond",
      "traffic_control_device", "crash_type", "hour_bin", "hit_and_run_i")
  }

  /** Non-separable parity fixture: label probability is an XOR of night and
    * rain (0.65 inside the interaction cells, 0.10 outside, +0.08 weekend)
    * with seeded label noise. Trees can express the interaction; a linear
    * model over one-hot marginals cannot — so GBT-vs-LR parity here carries
    * signal (on the separable fixture above both models hit F1 1.0 and the
    * comparison proved only the plumbing). Bayes-optimal F1 at these rates is
    * ~0.74, so any score >= 0.95 would indicate leakage, not skill.
    */
  private lazy val goldNoisy = {
    val rng = new scala.util.Random(7)
    val rows = (0 until 600).map { i =>
      val hour = rng.nextInt(24)
      val dow = 1 + rng.nextInt(7)
      val weekend = if (dow >= 6) 1 else 0
      val night = hour >= 20 || hour < 5
      val rain = rng.nextDouble() < 0.4
      val p = (if (night != rain) 0.65 else 0.10) + 0.08 * weekend
      val hitRun = if (rng.nextDouble() < p) 1 else 0
      (s"c$i", hour, dow, weekend, 1 + rng.nextInt(3), rng.nextInt(3).toDouble,
        20 + rng.nextInt(5) * 5, 41.7 + rng.nextInt(10) * 0.01, -87.9 + rng.nextInt(10) * 0.01,
        if (night) "DARKNESS" else "DAYLIGHT",
        if (rain) "RAIN" else "CLEAR", "DRY", "TRAFFIC SIGNAL",
        "NO INJURY / DRIVE AWAY", if (hour < 7) "night" else "morning", hitRun)
    }
    rows.toDF("crash_record_id", "crash_hour", "crash_day_of_week", "is_weekend",
      "num_units", "injuries_total", "posted_speed_limit", "latitude", "longitude",
      "lighting_condition", "weather_condition", "roadway_surface_cond",
      "traffic_control_device", "crash_type", "hour_bin", "hit_and_run_i")
  }

  test("missingFeatures flags absent columns (S12 upload validation)") {
    assert(Scoring.missingFeatures(gold).isEmpty)
    assert(Scoring.missingFeatures(gold.drop("crash_hour")) == Seq("crash_hour"))
  }

  test("train -> score -> metrics recovers the separable signal") {
    val model = Scoring.train(gold)
    val scored = Scoring.score(model, gold, threshold = 0.26)
    assert(scored.columns.contains("p1") && scored.columns.contains("pred"))
    val m = Scoring.metrics(scored)
    assert(m.tp + m.fn == 80, "positive support")
    assert(m.f1 > 0.9, s"separable fixture should score high, got $m")
  }

  test("GBT (boosted-tree, the XGBoost analog) beats LR on the noisy interaction fixture") {
    val mLr = Scoring.metrics(Scoring.score(Scoring.train(goldNoisy), goldNoisy, threshold = 0.26))
    val mGbt = Scoring.metrics(Scoring.score(Scoring.trainGbt(goldNoisy), goldNoisy, threshold = 0.26))
    info(f"GBT  f1=${mGbt.f1}%.3f precision=${mGbt.precision}%.3f recall=${mGbt.recall}%.3f")
    info(f"LR   f1=${mLr.f1}%.3f precision=${mLr.precision}%.3f recall=${mLr.recall}%.3f")
    info("reference XGBoost: f1=0.556 (artifacts/model_metadata.json)")
    // both models strictly inside (0.3, 0.95): the fixture is neither
    // degenerate nor separable, so the comparison measures model quality
    assert(mLr.f1 > 0.3 && mLr.f1 < 0.95, s"LR F1 outside the non-trivial band: $mLr")
    assert(mGbt.f1 > 0.3 && mGbt.f1 < 0.95, s"GBT F1 outside the non-trivial band: $mGbt")
    assert(mGbt.f1 >= 0.556, "at least the reference's own recorded XGBoost F1")
    assert(mGbt.f1 >= mLr.f1, s"trees must beat the linear model on the interaction: $mGbt vs $mLr")
  }

  test("probability histogram has bounded buckets summing to row count") {
    val model = Scoring.train(gold)
    val h = Scoring.probabilityHistogram(Scoring.score(model, gold)).collect()
    assert(h.map(_.getLong(1)).sum == 200)
    assert(h.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 19))
  }
}
