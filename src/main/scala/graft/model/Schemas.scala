package graft.model

import org.apache.spark.sql.types._

/** Layer schemas for the crash pipeline (SURVEY §1).
  *
  * Bronze fields all arrive as JSON strings — the Socrata convention
  * (reference: extractor/main.go:611-613); casts happen in the Gold cleaning
  * chain. Gold mirrors the declared 30-column DDL
  * (reference: cleaner/duckdb_writer.py:57-103).
  */
object Schemas {

  /** Join key shared by all three entities (reference: streaming.json:4). */
  val JoinKey = "crash_record_id"

  /** Bronze `crashes` — the 24-column select list
    * (reference: streamlit_frontend/streamlit_frontend.py:654, backfill.json:13).
    */
  val crashColumns: Seq[String] = Seq(
    "crash_record_id", "crash_date", "crash_type", "posted_speed_limit",
    "weather_condition", "lane_cnt", "hit_and_run_i", "beat_of_occurrence",
    "num_units", "injuries_total", "crash_hour", "crash_day_of_week",
    "latitude", "longitude", "traffic_control_device", "work_zone_i",
    "work_zone_type", "private_property_i", "lighting_condition",
    "road_defect", "roadway_surface_cond", "street_direction",
    "trafficway_type", "intersection_related_i")

  /** Bronze `vehicles` — 13 columns (reference: streaming.json:17). */
  val vehicleColumns: Seq[String] = Seq(
    "crash_record_id", "unit_no", "vehicle_id", "unit_type", "make", "model",
    "vehicle_year", "travel_direction", "maneuver", "first_contact_point",
    "vehicle_defect", "vehicle_use", "towed_i")

  /** Bronze `people` — 10 columns (reference: streaming.json:22). */
  val peopleColumns: Seq[String] = Seq(
    "crash_record_id", "person_id", "person_type", "age", "sex", "seat_no",
    "injury_classification", "safety_equipment", "airbag_deployed", "ejection")

  private def allString(cols: Seq[String]): StructType =
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))

  val bronzeCrashes: StructType  = allString(crashColumns)
  val bronzeVehicles: StructType = allString(vehicleColumns)
  val bronzePeople: StructType   = allString(peopleColumns)

  /** Gold `gold.crashes` — 30 columns
    * (reference: cleaner/duckdb_writer.py:57-103; booleans stored INT 0/1).
    */
  val gold: StructType = StructType(Seq(
    StructField("crash_record_id", StringType, nullable = false),
    StructField("crash_date", DateType),
    StructField("crash_day_of_week", IntegerType),
    StructField("crash_hour", IntegerType),
    StructField("is_weekend", IntegerType),
    StructField("hour_bin", StringType),
    StructField("beat_of_occurrence", IntegerType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("lat_bin", DoubleType),
    StructField("lng_bin", DoubleType),
    StructField("grid_id", StringType),
    StructField("crash_type", StringType),
    StructField("num_units", IntegerType),
    StructField("injuries_total", DoubleType),
    StructField("lighting_condition", StringType),
    StructField("posted_speed_limit", IntegerType),
    StructField("road_defect", StringType),
    StructField("roadway_surface_cond", StringType),
    StructField("street_direction", StringType),
    StructField("trafficway_type", StringType),
    StructField("weather_condition", StringType),
    StructField("traffic_control_device", StringType),
    StructField("hit_and_run_i", IntegerType),
    StructField("intersection_related_i", IntegerType),
    StructField("work_zone_i", IntegerType),
    StructField("private_property_i", IntegerType),
    StructField("corr_id", StringType),
    StructField("inserted_at", TimestampType),
    StructField("updated_at", TimestampType)))
}
