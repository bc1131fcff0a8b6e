package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer: the vocabulary-construction step behind
  * t10's coverage analysis and the token-count contract of every LLM data
  * pipeline (reference surface: the pipeline counts whitespace/regex tokens
  * — streamlit_frontend/streamlit_frontend.py word statistics; BPE is the
  * production upgrade the extension contract asks for).
  *
  * Training follows the [[Pq]] discipline: merge ranks are learned on a
  * BOUNDED word-frequency table (vocab-sized, not corpus-sized, but an
  * open-domain corpus can still have an unbounded vocab — `maxVocab`
  * hard-caps driver memory, and the cut keeps the most frequent word types
  * under a total order, so the training set is layout-independent and holds
  * the frequency mass that determines merges). Encoding is a distributed `mapPartitions` scan with
  * the ranked merges broadcast in the closure and a per-partition word memo
  * (Zipf: a few thousand distinct words dominate any shard).
  *
  * Merge application is the standard greedy form: per word, chars ->
  * merges in RANK ORDER, each applied leftmost non-overlapping — exactly
  * `replace(space-joined, "x y", "xy")` per merge, which is how the
  * registered query's DuckDB oracle mirrors it bitwise.
  */
object Bpe {

  /** Ranked merge table; rank = position. */
  final case class Model(merges: Seq[(String, String)]) extends Serializable

  /** Learn `numMerges` merges from a bounded word-frequency table.
    * Deterministic: ties in pair frequency break lexicographically, and the
    * `maxVocab` cut keeps the MOST FREQUENT word types (count desc, word asc
    * — a total order, so the training set is identical across partition
    * layouts AND holds the frequency mass that actually determines merge
    * ranks; a random cut would learn merges from the rare-word tail).
    */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 65536): Model = {
    val vc = col(textCol)
    val words = corpus.where(vc.isNotNull)
      .select(explode(split(lower(vc), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(words.nonEmpty, "BPE training sample is empty")
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (toks, c) =>
        var j = 0
        while (j < toks.length - 1) {
          val p = (toks(j), toks(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.map { case (toks, c) => (mergePair(toks, best), c) }
        i += 1
      }
    }
    Model(merges.toVector)
  }

  /** One merge applied leftmost, non-overlapping. */
  private def mergePair(toks: Array[String], p: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == p._1 && toks(j + 1) == p._2) {
        out += p._1 + p._2
        j += 2
      } else {
        out += toks(j)
        j += 1
      }
    }
    out.toArray
  }

  /** Tokenize one (lowercased) word: chars, then every merge in rank order. */
  def encodeWord(w: String, model: Model): Array[String] = {
    var toks = w.map(_.toString).toArray
    model.merges.foreach(p => toks = mergePair(toks, p))
    toks
  }

  private val encodedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("tokens", ArrayType(StringType, containsNull = false))))

  /** Distributed encode: (id, tokens). Null text rows are skipped (the
    * PERMISSIVE posture shared with [[Pq.encode]]); empty/whitespace text
    * yields an empty token array, not a missing row.
    */
  def encode(df: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val enc = RowEncoder.encoderFor(encodedSchema)
    df.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), lower(col(textCol)))
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { r =>
          val toks = r.getString(1).split(' ').iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, model)))
            .toSeq
          Row(r.getLong(0), toks)
        }
      }(enc)
  }
}
