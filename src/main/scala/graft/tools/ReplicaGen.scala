package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-probe dataset builder: replicates a driver testdata dir's
  * `documents`/`embeddings` tables by an integer factor with CONTENT-DISJOINT
  * replicas, giving SCALE.md a third measured decade beyond the largest
  * driver-generated SF. Measurement-only — replica dirs never feed the
  * correctness oracles (the driver's own parquet stays the only oracle
  * input).
  *
  * Why not plain row duplication: exact copies would put every document in a
  * `factor`-sized near-dup family, inflating pair counts ~quadratically in
  * `factor` — the opposite of how a larger real corpus behaves. Instead each
  * replica k:
  *  - documents: every whitespace token gets a replica suffix, so replicas
  *    are disjoint in shingle/gram space while INTRA-replica near-dup
  *    structure (the thing dedup cost scales with) is preserved exactly;
  *    lang/source skew is untouched; ids offset by k*10^7.
  *  - embeddings: replica k sign-flips dims {k-1, k+3, k+7, k+11} — an
  *    orthogonal transform (norms and intra-replica geometry exactly
  *    preserved) that flips ONE dim inside each of the four 4-bit sign-LSH
  *    bands over dims 0..15, so every replica group of a cluster lands in a
  *    band bucket disjoint from every other replica's: bucket width stays
  *    the real cluster width and candidate pairs scale linearly, as a
  *    genuinely larger corpus's would. (A circular dim shift — the first
  *    attempt — let shifted cluster sign-blocks COLLIDE across replicas,
  *    quadratically inflating bucket pairs: an artifact of the synthetic
  *    data, not a property of the engine.)
  *
  * Usage: ReplicaGen <sfDir> <outDir> <docFactor> <vecFactor>. Every other
  * `*.parquet` table in `sfDir` is copied VERBATIM so the full 91-query
  * battery runs against the replica dir: the document/embedding axis is the
  * scaling probe (it feeds the dedup/ANN/text families, the battery's heavy
  * tail); the relational decades are already measured across the
  * driver-generated SFs themselves.
  */
object ReplicaGen {

  /** `factor` content-disjoint document replicas: replica k suffixes every
    * whitespace token with `qk` and offsets ids by k*10^7 (k = 0 is the
    * original rows, untouched).
    */
  def replicateDocs(docs: org.apache.spark.sql.DataFrame, factor: Int):
      org.apache.spark.sql.DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    (0 until factor).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", expr(s"doc_id + ${k}L * 10000000"))
        .withColumn("text",
          expr(s"array_join(transform(split(text, ' '), w -> concat(w, 'q$k')), ' ')"))
        .withColumn("n_chars", expr("CAST(length(text) AS BIGINT)"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.reduce(_ unionByName _)
  }

  /** `factor` embedding replicas: replica k sign-flips dims
    * {k-1, k+3, k+7, k+11} (orthogonal — norms/intra-replica cosines exact;
    * one flipped dim inside each default 4-bit sign-LSH band).
    */
  def replicateEmbeddings(emb: org.apache.spark.sql.DataFrame, factor: Int):
      org.apache.spark.sql.DataFrame = {
    // k-1 must stay inside band 0 (dims 0..3) for the flips to hit one dim
    // in EVERY 4-bit band and stay pairwise-distinct per band — beyond
    // factor 5 replicas would silently share band keys and re-inflate
    // bucket pairs (the artifact this scheme exists to prevent)
    require(factor >= 1 && factor <= 5,
      s"embedding replica factor must be in [1, 5], got $factor")
    (0 until factor).map { k =>
      if (k == 0) emb
      else {
        val flips = Seq(k - 1, k + 3, k + 7, k + 11)
        emb
          .withColumn("vec_id", expr(s"vec_id + ${k}L * 10000000"))
          .withColumn("embedding", expr(
            s"transform(embedding, (x, i) -> IF(${flips.map(f => s"i = $f").mkString(" OR ")}, -x, x))"))
          .select("vec_id", "embedding", "label")
      }
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, fdS, fvS) = args
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    replicateDocs(spark.read.parquet(s"$sfDir/documents.parquet"), fdS.toInt)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    replicateEmbeddings(spark.read.parquet(s"$sfDir/embeddings.parquet"), fvS.toInt)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val src = java.nio.file.Paths.get(sfDir)
    java.nio.file.Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") &&
          name != "documents.parquet" && name != "embeddings.parquet")
        java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(s"$outDir/$name"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    spark.stop()
  }
}
