package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Multimodal plumbing: schema contract, batched decode, feature shape,
  * frame generation (decode itself is the documented stub).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "spark"), (3L, null.asInstanceOf[String]))
      .toDF("id", "payload"),
    "id", "payload")

  test("asMedia produces the canonical binary+metadata schema") {
    assert(media.schema("content").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "width", "height", "duration_ms"))
  }

  test("decodeBatched runs per-partition, tolerates null payloads as null rows") {
    val out = Multimodal.decodeBatched(media).orderBy("media_id").collect()
    assert(out(0).getInt(1) == 11 && out(0).getDouble(2) > 0) // "hello world"
    assert(out(2).isNullAt(1), "null payload -> null decode, row preserved")
  }

  test("extractFeatures emits fixed-dim float embeddings, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, dim = 8).orderBy("media_id").collect()
    assert(f1.length == 2, "null-payload row dropped from features")
    assert(f1(0).getSeq[Float](1).length == 8)
    assert(f1(0).getSeq[Float](1) == f2(0).getSeq[Float](1))
  }

  test("sampleFrames generates one row per frame step (UDTF shape)") {
    val frames = Multimodal.sampleFrames(media, everyMs = 250)
    assert(frames.count() == 12) // 3 rows x 4 frames (0,250,500,750) of 1000ms
    assert(frames.where($"media_id" === 1).count() == 4)
  }

  test("resize rewrites metadata dims, preserves payload") {
    val r = Multimodal.resize(media, 32, 32).select("meta.width", "meta.height").collect()
    assert(r.forall(x => x.getInt(0) == 32 && x.getInt(1) == 32))
  }

  test("media -> embedding -> ANN top-k end to end over a true binary parquet fixture") {
    // Genuine binary payloads (seeded random bytes, NOT UTF-8-cast text),
    // round-tripped through parquet so the corpus scan reads a real
    // BinaryType column; a planted byte-identical payload of media 0 at
    // id 99 must surface as its top neighbor after feature extraction.
    val rnd = new scala.util.Random(3)
    val rows: Seq[(Long, Array[Byte])] = (0L until 40L).map { i =>
      val b = new Array[Byte](256 + rnd.nextInt(64)); rnd.nextBytes(b); (i, b)
    }
    val planted = rows :+ ((99L, rows.head._2.clone()))
    val path = tmpDir("media-ann") + "/media"
    Multimodal.asMedia(planted.toDF("id", "payload"), "id", "payload")
      .write.parquet(path)

    val mediaPq = spark.read.parquet(path)
    assert(mediaPq.schema("content").dataType.typeName == "binary")
    val emb = Multimodal.extractFeatures(mediaPq, dim = 16)
    val prepared = graft.ext.Similarity.prepare(emb, "media_id", "embedding")
    val out = graft.ext.Similarity
      .bruteForceTopK(prepared, prepared.where(col("id") === 0), k = 3)
      .collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("id") == 99, "byte-identical payload must be the top hit")
    assert(out(0).getAs[Double]("score") > 0.9999)
    assert(out(1).getAs[Double]("score") < 0.99, "random payloads stay clearly below the dup")
  }
}
