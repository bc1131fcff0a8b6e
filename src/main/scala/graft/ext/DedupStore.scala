package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup deduplication against a persistent signature store —
  * the streaming form of the d2/d6 batch dedup: as document batches arrive,
  * each is (1) collapsed within itself (connected-components keep-first over
  * its own verified pairs), (2) probed against the signatures of everything
  * accepted so far, and (3) its survivors' signatures appended. A corpus
  * ingested batch-by-batch ends up deduplicated exactly as if d2/d6 had run
  * over the union, without ever rescanning accepted documents' text.
  *
  * Store layout (under `path`):
  *  - `bands/` — (doc_id, band, bkey) parquet, partitioned by `band`: a probe
  *    joins only on band keys, and partition pruning keeps each probe to the
  *    4 band directories;
  *  - `shingles/` — (doc_id, sh) parquet: the shingle sets needed to verify
  *    candidate pairs exactly (only candidates are ever read — column-pruned,
  *    bucket-capped join, never a corpus scan).
  *
  * Scale: probe cost is O(new-batch signatures + band collisions); the store
  * grows by accepted docs only. The bucket cap bounds degenerate band keys
  * exactly as in the batch path.
  */
object DedupStore {

  final case class IngestReport(accepted: Long, withinBatchDups: Long, storeDups: Long)

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append a batch's signatures (callers pass only docs accepted as novel). */
  def append(sigs: DataFrame, path: String): Unit = {
    MinHash.bands(sigs)
      .write.mode(SaveMode.Append).partitionBy("band").parquet(s"$path/bands")
    sigs.select("doc_id", "sh")
      .write.mode(SaveMode.Append).parquet(s"$path/shingles")
  }

  /** Map each incoming doc to the accepted doc it duplicates:
    * (doc_id, dup_of) — only rows with a verified store duplicate appear.
    * An id re-ingested after acceptance maps to itself, which is what makes
    * replays no-ops.
    */
  def probe(spark: SparkSession, sigs: DataFrame, path: String,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    if (!exists(spark, s"$path/bands"))
      return sigs.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(null).cast("long"))
        .withColumn("dup_of", lit(null).cast("long"))
    val newBands = MinHash.bands(sigs)
    val storeBands = Similarity.capBuckets(
      spark.read.parquet(s"$path/bands"), Seq("band", "bkey"), maxBucket)
    val cands = newBands.as("n")
      .join(storeBands.as("o"), expr("n.band = o.band AND n.bkey = o.bkey"))
      .select(col("n.doc_id").as("id"), col("o.doc_id").as("old_id"))
      .distinct()
    val storeShingles = spark.read.parquet(s"$path/shingles")
      .select(col("doc_id").as("old_id"), col("sh").as("osh"))
    cands
      .join(sigs.select(col("doc_id").as("id"), col("sh")), Seq("id"))
      .join(storeShingles, Seq("old_id"))
      .where(expr(s"${MinHash.jaccardExpr("sh", "osh")} >= $threshold"))
      .groupBy(col("id").as("doc_id"))
      .agg(min("old_id").as("dup_of"))
  }

  /** One incremental ingest step: within-batch collapse -> store probe ->
    * append survivors. Returns the acceptance accounting.
    */
  def ingestBatch(spark: SparkSession, docs: DataFrame, path: String,
      threshold: Double = 0.8, maxBucket: Int = 1000): IngestReport = {
    val sigs = MinHash.signatures(docs, Seq("doc_id"))
      .localCheckpoint(eager = false)

    // (1) within-batch: verified pairs -> CC families -> keep the min id
    val bands = Similarity.capBuckets(MinHash.bands(sigs), Seq("band", "bkey"), maxBucket)
    val pairs = bands.as("x")
      .join(bands.as("y"), expr("x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .join(sigs.select(col("doc_id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
      .where(expr(s"${MinHash.jaccardExpr("sha", "shb")} >= $threshold"))
      .select("id_a", "id_b")
    val labels = graft.ops.GraphOps.connectedComponents(pairs, "id_a", "id_b")
    val withinDups = labels.where(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val batchSurvivors = sigs.join(withinDups, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)

    // (2) probe survivors against the store
    val storeDups = probe(spark, batchSurvivors, path, threshold, maxBucket)
      .select("doc_id")
      .localCheckpoint(eager = false)

    // (3) append novel survivors
    val novel = batchSurvivors.join(storeDups, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)
    val nNovel = novel.count()
    if (nNovel > 0) append(novel, path)

    IngestReport(nNovel, withinDups.count(), storeDups.count())
  }
}
