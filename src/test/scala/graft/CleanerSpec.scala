package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.gold.Cleaner

/** Cleaning-rule behaviors pinned to cleaner/cleaning_rules.py:11-224 and the
  * notebook spec (cleaner/testing.ipynb cells 10-26), including the pandas
  * null edges (FIXTURES.md §A6).
  */
class CleanerSpec extends SparkSpec {
  import spark.implicits._

  private def silverRow(
      id: String,
      date: String = "2024-01-03T10:30:00",
      hour: String = "10",
      dow: String = "4",
      lat: String = "41.85",
      lng: String = "-87.65",
      weather: String = "CLEAR",
      speed: String = "30",
      units: String = "2",
      injuries: String = "0",
      hitRun: String = "N") =
    (id, "200", date, dow, hour, "NO INJURY / DRIVE AWAY", hitRun, units,
      injuries, "DAYLIGHT", lat, lng, speed, "NO DEFECTS", "DRY", "N",
      "NOT DIVIDED", weather, "N", "TRAFFIC SIGNAL", "N", "N")

  private val silverCols = Cleaner.reqCols

  private def toDf(rows: Seq[Product]) = {
    val schema = StructType(silverCols.map(c => StructField(c, StringType)))
    val data = rows.map(p => Row(p.productIterator.toSeq.map(_.asInstanceOf[AnyRef]): _*))
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  test("boolean standardization: Y/yes/TRUE/t/1/1.0 -> 1; N/no/0/null/junk -> 0") {
    val variants = Seq("Y", "y", "yes", "TRUE", "t", "1", "1.0", "N", "no", "0", null, "junk")
    val df = variants.zipWithIndex
      .map { case (v, i) => silverRow(s"c$i", hitRun = v) }
      .pipe(toDf)
    val out = Cleaner.cleanData(df).orderBy("crash_record_id")
    val got = out.select("crash_record_id", "hit_and_run_i").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val expected = Seq(1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
    variants.indices.foreach(i => assert(got(s"c$i") == expected(i), s"variant ${variants(i)}"))
  }

  implicit class Pipe[A](a: A) { def pipe[B](f: A => B): B = f(a) }

  test("hour_bin boundaries 6/12/18/23 and null-hour -> OTHER after imputation") {
    val df = toDf(Seq(
      silverRow("h6", hour = "6"), silverRow("h12", hour = "12"),
      silverRow("h18", hour = "18"), silverRow("h23", hour = "23"),
      silverRow("hN", hour = null)))
    val out = Cleaner.cleanData(df)
    val bins = out.select("crash_record_id", "hour_bin").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bins == Map("h6" -> "night", "h12" -> "morning",
      "h18" -> "afternoon", "h23" -> "evening", "hN" -> "OTHER"))
  }

  test("null crash_date rows are dropped; date normalized to midnight (with and without millis)") {
    val df = toDf(Seq(
      silverRow("d1", date = "2024-01-03T10:30:00"),
      silverRow("d2", date = "2024-01-04T23:59:59.997"),
      silverRow("dN", date = null)))
    val out = Cleaner.cleanData(df)
    assert(out.count() == 2)
    val dates = out.select("crash_record_id", "crash_date").collect()
      .map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(dates == Map("d1" -> "2024-01-03", "d2" -> "2024-01-04"))
  }

  test("bbox: (0,0) and out-of-range dropped; NULL coordinates survive (pandas NaN edge)") {
    val df = toDf(Seq(
      silverRow("ok"),
      silverRow("zero", lat = "0", lng = "0"),
      silverRow("north", lat = "45.0"),
      silverRow("east", lng = "-80.0"),
      silverRow("nulls", lat = null, lng = null)))
    val out = Cleaner.cleanData(df)
    assert(out.select("crash_record_id").collect().map(_.getString(0)).toSet ==
      Set("ok", "nulls"))
  }

  test("grid_id = round-2 bins joined by _; null bins median-imputed after grid (grid shows nan)") {
    val df = toDf(Seq(
      silverRow("g1", lat = "41.8567", lng = "-87.6543"),
      silverRow("g2", lat = null, lng = null)))
    val out = Cleaner.cleanData(df)
    val grids = out.select("crash_record_id", "grid_id", "lat_bin").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(grids("g1")._1 == "41.86_-87.65")
    assert(grids("g2")._1 == "nan_nan")       // pandas str(NaN) behavior
    assert(grids("g2")._2 == 41.86)           // then median-imputed from g1
  }

  test("weather: snow variants consolidated to SNOW; off-list and null -> OTHER") {
    val df = toDf(Seq(
      silverRow("w1", weather = "SLEET/HAIL"),
      silverRow("w2", weather = "Freezing Rain/Drizzle"),
      silverRow("w3", weather = "FOG/SMOKE/HAZE"),
      silverRow("w4", weather = "clear"),
      silverRow("w5", weather = null)))
    val out = Cleaner.cleanData(df)
    val w = out.select("crash_record_id", "weather_condition").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(w == Map("w1" -> "SNOW", "w2" -> "SNOW", "w3" -> "OTHER",
      "w4" -> "CLEAR", "w5" -> "OTHER"))
  }

  test("median imputation is exact-interpolating; injuries_total nulls -> 0") {
    val df = toDf(Seq(
      silverRow("m1", speed = "20", injuries = null),
      silverRow("m2", speed = "30"),
      silverRow("m3", speed = "45"),
      silverRow("m4", speed = "55"),
      silverRow("mN", speed = null)))
    val out = Cleaner.cleanData(df)
    val got = out.select("crash_record_id", "posted_speed_limit", "injuries_total")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("mN")._1 == 37.5) // interpolated median of 20,30,45,55
    assert(got("m1")._2 == 0.0)
  }

  test("outlier caps: num_units <= 10, posted_speed_limit <= 75") {
    val df = toDf(Seq(silverRow("o1", units = "14", speed = "99")))
    val out = Cleaner.cleanData(df)
    val r = out.select("num_units", "posted_speed_limit").collect()(0)
    assert(r.getDouble(0) == 10.0 && r.getDouble(1) == 75.0)
  }

  test("missing expected column is null-patched (and flags default to 0)") {
    val df = Seq(("c1", "2024-01-03T10:30:00", "10", "41.85", "-87.65"))
      .toDF("crash_record_id", "crash_date", "crash_hour", "latitude", "longitude")
    val out = Cleaner.cleanData(df)
    val r = out.collect()(0)
    assert(r.getAs[Int]("work_zone_i") == 0)
    assert(r.getAs[String]("street_direction") == "OTHER")
  }

  test("toGold produces the declared 30-column schema") {
    val df = toDf(Seq(silverRow("g1")))
    val gold = Cleaner.toGold(Cleaner.cleanData(df), "run-1",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(gold.schema.fieldNames.toSeq == graft.model.Schemas.gold.fieldNames.toSeq)
    val r = gold.collect()(0)
    assert(r.getAs[Int]("is_weekend") == 0)
    assert(r.getAs[String]("corr_id") == "run-1")
  }
}
