package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The hit-and-run classifier path (SURVEY §2.10 UD3): the reference scores a
  * joblib XGBoost pipeline over 23 raw Gold feature columns at threshold 0.26
  * (streamlit_frontend.py:2282-2287, artifacts/model_metadata.json). Re-built
  * natively as a Spark ML pipeline (indexer + one-hot + logistic regression —
  * the engine contract is the scoring/metrics surface, not the boosted-tree
  * internals), scoring distributed via `PipelineModel.transform`.
  */
object Scoring {

  val numericFeatures: Seq[String] = Seq(
    "crash_hour", "crash_day_of_week", "is_weekend", "num_units",
    "injuries_total", "posted_speed_limit", "latitude", "longitude")

  val categoricalFeatures: Seq[String] = Seq(
    "weather_condition", "lighting_condition", "roadway_surface_cond",
    "traffic_control_device", "crash_type", "hour_bin")

  val labelCol = "hit_and_run_i"

  /** Column-presence validation mirroring the CSV-upload check
    * (streamlit_frontend.py:2193-2199 S12): returns the missing features.
    */
  def missingFeatures(df: DataFrame): Seq[String] =
    (numericFeatures ++ categoricalFeatures ++ Seq(labelCol))
      .filterNot(df.columns.contains)

  /** Shared feature plumbing: index + one-hot categoricals, assemble with
    * numerics. Both classifier variants stack on these stages.
    */
  private def featureStages() = {
    val indexers = categoricalFeatures.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep"))
    val encoder = new OneHotEncoder()
      .setInputCols(categoricalFeatures.map(c => s"${c}_idx").toArray)
      .setOutputCols(categoricalFeatures.map(c => s"${c}_oh").toArray)
    val assembler = new VectorAssembler()
      .setInputCols((numericFeatures ++ categoricalFeatures.map(c => s"${c}_oh")).toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
    indexers :+ encoder :+ assembler
  }

  def buildPipeline(): Pipeline = {
    val lr = new LogisticRegression()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setMaxIter(25)
    new Pipeline().setStages((featureStages() :+ lr).toArray)
  }

  /** Boosted-tree variant — the native analog of the reference's XGBoost
    * estimator (scored at F1 0.556/threshold 0.26,
    * streamlit_frontend/artifacts/model_metadata.json:28-34). Same feature
    * plumbing and scoring surface as the LR pipeline; only the estimator
    * differs, so [[score]]/[[metrics]] work unchanged. ScoringSpec records
    * the measured quality parity (COVERAGE.md UD3 note).
    */
  def buildGbtPipeline(): Pipeline = {
    val gbt = new GBTClassifier()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setMaxIter(20)
      .setMaxDepth(5)
      .setSeed(42L)
    new Pipeline().setStages((featureStages() :+ gbt).toArray)
  }

  def train(gold: DataFrame): PipelineModel = {
    val missing = missingFeatures(gold)
    require(missing.isEmpty, s"missing feature columns: ${missing.mkString(", ")}")
    buildPipeline().fit(gold)
  }

  def trainGbt(gold: DataFrame): PipelineModel = {
    val missing = missingFeatures(gold)
    require(missing.isEmpty, s"missing feature columns: ${missing.mkString(", ")}")
    buildGbtPipeline().fit(gold)
  }

  /** Score at a probability threshold (reference threshold 0.26,
    * model_metadata.json:29): adds `p1` (positive-class probability) and
    * `pred` (0/1) columns.
    */
  def score(model: PipelineModel, df: DataFrame, threshold: Double = 0.26): DataFrame = {
    // vector_to_array is the built-in (codegen-friendly) vector accessor —
    // keeps the repo UDF-free.
    val p1 = org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1)
    model.transform(df)
      .withColumn("p1", p1)
      .withColumn("pred", when(col("p1") >= threshold, 1).otherwise(0))
  }

  final case class Metrics(
      tn: Long, fp: Long, fn: Long, tp: Long,
      precision: Double, recall: Double, f1: Double, accuracy: Double)

  /** Confusion matrix + precision/recall/F1 as one aggregation pass
    * (streamlit_frontend.py:2354-2405 A17).
    */
  def metrics(scored: DataFrame): Metrics = {
    val counts = scored
      .groupBy(labelCol, "pred")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
      .withDefaultValue(0L)
    val (tn, fp, fn, tp) =
      (counts((0, 0)), counts((0, 1)), counts((1, 0)), counts((1, 1)))
    val precision = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
    val recall = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
    val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    val acc = (tp + tn).toDouble / math.max(1L, tn + fp + fn + tp)
    Metrics(tn, fp, fn, tp, precision, recall, f1, acc)
  }

  /** Probability histogram for the scoring tab
    * (streamlit_frontend.py:2437-2462 F18): 20 fixed-width buckets.
    */
  def probabilityHistogram(scored: DataFrame): DataFrame =
    scored
      .withColumn("bucket", least(floor(col("p1") * 20), lit(19L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
}
