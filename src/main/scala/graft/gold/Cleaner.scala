package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gold cleaning chain — a pure DataFrame -> DataFrame column-expression
  * program replicating the reference's pandas rules *including* their null
  * edges (reference: cleaner/cleaning_rules.py:11-224; behavior spec
  * pinned by cleaner/testing.ipynb cells 10-26):
  *
  *  - whitelist recodes send null to 'OTHER' (pandas: NaN fails isin, row is
  *    assigned in the ~isin branch);
  *  - the bbox filter lets null coordinates through (NaN comparisons are
  *    False in pandas — replicated with an explicit COALESCE);
  *  - grid_id renders null bins as the string "nan" (pandas str(NaN));
  *  - hour_bin of a null hour is null until categorical imputation turns it
  *    into 'OTHER'.
  *
  * All rules are native Column expressions (no UDFs) — the whole chain stays
  * inside one whole-stage-codegen'd projection; the only extra job is the
  * exact-median computation for imputation.
  */
object Cleaner {

  /** The 22 retained input columns (reference: cleaner/cleaning_rules.py:31-37). */
  val reqCols: Seq[String] = Seq(
    "crash_record_id", "beat_of_occurrence", "crash_date", "crash_day_of_week",
    "crash_hour", "crash_type", "hit_and_run_i", "num_units", "injuries_total",
    "lighting_condition", "latitude", "longitude", "posted_speed_limit",
    "road_defect", "roadway_surface_cond", "street_direction", "trafficway_type",
    "weather_condition", "intersection_related_i", "traffic_control_device",
    "work_zone_i", "private_property_i")

  val boolCols: Seq[String] =
    Seq("hit_and_run_i", "intersection_related_i", "private_property_i", "work_zone_i")

  /** Y/yes/true/t/1/1.0 -> 1; everything else including null -> 0
    * (reference: cleaner/cleaning_rules.py:57-88).
    */
  def standardizeBoolean(c: Column): Column =
    when(lower(trim(c.cast("string"))).isin("y", "yes", "true", "t", "1", "1.0"), 1)
      .otherwise(0)

  /** 1=Sunday..7=Saturday Socrata convention
    * (reference: cleaner/cleaning_rules.py:92-97; day-code clash note SURVEY §7.4).
    */
  def isWeekend(dayOfWeek: Column): Column =
    when(dayOfWeek.isin(1, 7), 1).otherwise(0)

  /** <=6 night, <=12 morning, <=18 afternoon, <=23 evening, null/other -> null
    * (reference: cleaner/cleaning_rules.py:100-112; null hour falls through
    * every branch exactly like NaN comparisons in pandas).
    */
  def hourBin(hour: Column): Column =
    when(hour <= 6, "night")
      .when(hour <= 12, "morning")
      .when(hour <= 18, "afternoon")
      .when(hour <= 23, "evening")
      .otherwise(lit(null).cast("string"))

  /** Uppercase + whitelist recode; null and off-list both -> 'OTHER'
    * (reference: cleaner/cleaning_rules.py:153-181).
    */
  def whitelistRecode(c: Column, valid: Seq[String]): Column = {
    val u = upper(c.cast("string"))
    when(u.isin(valid: _*), u).otherwise("OTHER")
  }

  private val validRoadway  = Seq("DRY", "UNKNOWN", "WET", "SNOW OR SLUSH", "ICE")
  private val validLighting =
    Seq("DARKNESS, LIGHTED ROAD", "UNKNOWN", "DARKNESS", "DAWN", "DAYLIGHT", "DUSK")
  private val snowConditions =
    Seq("SNOW", "BLOWING SNOW", "SLEET/HAIL", "FREEZING RAIN/DRIZZLE")
  private val validWeather  = Seq("CLOUDY/OVERCAST", "CLEAR", "RAIN", "SNOW")
  private val validTraffic  = Seq("NO CONTROLS", "TRAFFIC SIGNAL", "STOP SIGN/FLASHER", "UNKNOWN")
  private val validCrashType = Seq("NO INJURY / DRIVE AWAY", "INJURY AND / OR TOW DUE TO CRASH")

  /** F8 weather recode including the snow consolidation pre-map; null and
    * off-list -> 'OTHER' (reference: cleaner/cleaning_rules.py:140-181).
    */
  def weatherRecode(c: Column): Column = {
    val u = upper(c.cast("string"))
    val snowMapped = when(u.isin(snowConditions: _*), "SNOW").otherwise(u)
    when(snowMapped.isin(validWeather: _*), snowMapped).otherwise("OTHER")
  }

  /** Chicago bounding box; (0,0) and out-of-range dropped, null coordinates
    * SURVIVE (reference: cleaner/cleaning_rules.py:128-143).
    */
  def validCoords(lat: Column, lng: Column): Column = {
    val invalid = (lat === 0 && lng === 0) ||
      lat < 41.6 || lat > 42.1 || lng < -88.0 || lng > -87.5
    !coalesce(invalid, lit(false))
  }

  /** Median-imputed numeric columns (reference: cleaner/cleaning_rules.py:192-202 —
    * numerics minus id/flags/injuries_total).
    */
  val medianCols: Seq[String] = Seq(
    "beat_of_occurrence", "crash_day_of_week", "crash_hour", "num_units",
    "posted_speed_limit", "latitude", "longitude", "lat_bin", "lng_bin")

  /** Categorical columns imputed with 'OTHER' (reference:
    * cleaner/cleaning_rules.py:204-212 — object dtypes minus the id; the
    * whitelist-recoded columns are already null-free by this point).
    */
  val categoricalFillCols: Seq[String] =
    Seq("hour_bin", "road_defect", "street_direction", "trafficway_type", "grid_id")

  /** The full rule chain P5 -> F2-F8 -> F9 (median/constant impute) -> F10
    * (caps), in the reference's order — order matters: is_weekend/hour_bin are
    * derived BEFORE their source columns are median-imputed.
    *
    * `passthrough` names extra columns (e.g. the Silver merge's veh_/ppl_
    * roll-up aggregates) carried through the chain untouched by any rule —
    * the streaming 3-entity path uses it so enrich columns survive into Gold.
    */
  def cleanData(silver: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    // P5: keep-list + missing-column null patch (cleaning_rules.py:31-51).
    val present = reqCols.filter(silver.columns.contains)
    val absent  = reqCols.filterNot(silver.columns.contains)
    val pass    = passthrough.filter(silver.columns.contains).filterNot(reqCols.contains)
    val kept = absent.foldLeft(silver.select((present ++ pass).map(col): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast("string"))
    }

    // Numeric casts (the pandas cleaner receives CSV-inferred numerics).
    val numericDouble = Seq(
      "beat_of_occurrence", "crash_day_of_week", "crash_hour", "num_units",
      "injuries_total", "latitude", "longitude", "posted_speed_limit")
    val typed = numericDouble.foldLeft(kept)((df, c) =>
      df.withColumn(c, col(c).cast("double")))

    val derived = typed
      // F2 booleans (+ int64 cast)
      .withColumns(boolCols.map(c => c -> standardizeBoolean(col(c))).toMap)
      // F3 is_weekend, F4 hour_bin — from pre-imputation values
      .withColumn("is_weekend", isWeekend(col("crash_day_of_week")))
      .withColumn("hour_bin", hourBin(col("crash_hour")))
      // P6 + F5: drop null dates, normalize to midnight date
      .where(col("crash_date").isNotNull)
      .withColumn("crash_date", to_date(to_timestamp(col("crash_date"))))
      .where(col("crash_date").isNotNull)
      // P7 bbox (null passthrough)
      .where(validCoords(col("latitude"), col("longitude")))
      // F6 bins + F7 grid id ("nan" replicates pandas str(NaN))
      .withColumn("lat_bin", round(col("latitude"), 2))
      .withColumn("lng_bin", round(col("longitude"), 2))
      .withColumn("grid_id", concat(
        coalesce(col("lat_bin").cast("string"), lit("nan")),
        lit("_"),
        coalesce(col("lng_bin").cast("string"), lit("nan"))))
      // F8 whitelist recodes (null -> OTHER)
      .withColumn("roadway_surface_cond", whitelistRecode(col("roadway_surface_cond"), validRoadway))
      .withColumn("lighting_condition", whitelistRecode(col("lighting_condition"), validLighting))
      .withColumn("weather_condition", weatherRecode(col("weather_condition")))
      .withColumn("traffic_control_device", whitelistRecode(col("traffic_control_device"), validTraffic))
      .withColumn("crash_type", whitelistRecode(col("crash_type"), validCrashType))
      // F9a: injuries_total -> 0
      .withColumn("injuries_total", coalesce(col("injuries_total"), lit(0.0)))

    // F9b: exact-median imputation (pandas interpolating median — SURVEY §7.4
    // warns against approxQuantile). Computed by ScaleOps.exactQuantiles:
    // all nine columns share each histogram-refinement pass, executor state
    // stays O(bins) — the scale-safe form of `percentile(c, 0.5)`, same
    // interpolation bit-for-bit. All-null columns are absent from the map and
    // left unfilled (matching percentile's null).
    val medians = graft.ops.ScaleOps.exactQuantiles(derived, medianCols, 0.5)
    val medianFilled = medianCols.foldLeft(derived) { (df, c) =>
      medians.get(c) match {
        case Some(m) => df.withColumn(c, coalesce(col(c), lit(m)))
        case None    => df
      }
    }

    // F9c: categorical fill + F10 caps.
    medianFilled
      .withColumns(categoricalFillCols.map(c =>
        c -> coalesce(col(c).cast("string"), lit("OTHER"))).toMap)
      .withColumn("num_units", least(col("num_units"), lit(10.0)))
      .withColumn("posted_speed_limit", least(col("posted_speed_limit"), lit(75.0)))
  }

  /** Cast the cleaned frame to the declared Gold column types and attach run
    * metadata (reference: cleaner/duckdb_writer.py:57-103 DDL + :119-131
    * corr_id/inserted_at/updated_at).
    */
  def toGold(cleaned: DataFrame, corrId: String, now: java.sql.Timestamp,
      passthrough: Seq[String] = Nil): DataFrame = {
    val intCols = Seq(
      "crash_day_of_week", "crash_hour", "is_weekend", "beat_of_occurrence",
      "num_units", "posted_speed_limit", "hit_and_run_i",
      "intersection_related_i", "work_zone_i", "private_property_i")
    val casted = intCols.foldLeft(cleaned)((df, c) =>
      df.withColumn(c, col(c).cast("int")))
    val withMeta = casted
      .withColumn("corr_id", lit(corrId))
      .withColumn("inserted_at", lit(now))
      .withColumn("updated_at", lit(now))
    val declared = graft.model.Schemas.gold.fieldNames.toSeq
    val extras = passthrough.filter(withMeta.columns.contains).filterNot(declared.contains)
    withMeta.select((declared ++ extras).map(col): _*)
  }
}
