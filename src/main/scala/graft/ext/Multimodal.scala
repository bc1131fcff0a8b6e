package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for a training-data pipeline: image/audio/video
  * as opaque `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / resize / frame-sample as *batched partition-level*
  * transforms (`mapPartitions` — the Scala analog of `mapInPandas`: one
  * iterator per partition, amortizing per-batch decoder setup).
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — behind [[StubCodec]], a deterministic fake. Everything
  * Spark-side is real and load-bearing: the schema contract, the partition
  * batching, null/corrupt-row tolerance, and the deterministic feature
  * shapes. Swapping [[StubCodec]] for a JNI/JavaCPP codec changes no
  * plan shape.
  *
  * Scale: media blobs dominate row size, so the partitioning rule is
  * rows-per-partition (not bytes of metadata): repartition upstream by
  * content key so one partition ~ one decoder-friendly batch; never collect
  * blobs to the driver.
  */
object Multimodal {

  /** content + typed metadata: the canonical media row. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType))))))

  /** STUB codec — deterministic fakes standing in for libjpeg/ffmpeg. A real
    * deployment replaces only this object.
    */
  object StubCodec {
    /** "Decode" = byte statistics; stands in for pixel decode. */
    def decode(bytes: Array[Byte]): (Int, Double) = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      (bytes.length, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
    }

    /** "Feature-extract" = deterministic dim-d embedding from a rolling hash
      * of the content; stands in for a vision encoder forward pass.
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + (bytes(i) & 0xff)
        out(i % dim) += ((h % 1000).toFloat / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** Wrap a text/metadata table into media rows (fixture adapter: the
    * testdata has no real binaries, so content = UTF-8 bytes of a column).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(64).as("width"), lit(64).as("height"),
        lit(1000).as("duration_ms")).as("meta"))

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("mime", StringType)))

  /** Batched decode: one [[StubCodec]] "instance" per partition, corrupt/null
    * rows tolerated as nulls (PERMISSIVE-style), never a per-row setup cost.
    */
  def decodeBatched(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "content", "meta.mime").mapPartitions { it =>
      // per-partition decoder setup happens here (stub: nothing to open)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Row(id, null, null, r.getString(2))
        else {
          val (n, mean) = StubCodec.decode(bytes)
          Row(id, n, mean, r.getString(2))
        }
      }
    }(enc)
  }

  private def featureSchema(dim: Int) = StructType(Seq(
    StructField("media_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Batched feature extraction -> fixed-dim Float embedding column, the
    * input shape the similarity-search operators consume.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema(dim))
    media.select("media_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        if (r.isNullAt(1)) None
        else Some(Row(r.getLong(0), StubCodec.features(r.getAs[Array[Byte]](1), dim).toSeq))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame index at `everyMs`
    * granularity of `meta.duration_ms` — a generator (UDTF-shaped) transform.
    */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame =
    media.select(
      col("media_id"),
      // Guard zero/negative durations (stills in a mixed table): sequence
      // with start > stop throws; an empty array explodes to zero rows.
      explode(
        when(col("meta.duration_ms") > 0,
          sequence(lit(0), col("meta.duration_ms") - 1, lit(everyMs)))
          .otherwise(array().cast("array<int>")))
        .as("frame_ms"))

  /** Resize = metadata rewrite + (stub) content passthrough: the plan-side
    * contract of an image resize (dims change, payload re-encoded).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(
        col("meta.mime").as("mime"),
        lit(w).as("width"), lit(h).as("height"),
        col("meta.duration_ms").as("duration_ms")))
}
