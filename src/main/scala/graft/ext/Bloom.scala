package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter for membership prefilters — the 100 TB shape for
  * "is this corpus item in the (small) reference set?" checks such as
  * benchmark decontamination (the scan-local sibling of d7's inverted
  * 13-gram join, SURVEY.md §7.5 — the reference pipeline has no
  * decontamination stage; this is training-data-pipeline surface).
  *
  * Why this exists: the exact inverted-join form (d7) shuffles EVERY corpus
  * n-gram to co-locate it with the benchmark grams — at 100 TB that shuffle
  * carries the whole corpus's gram stream even though ~all of it misses. A
  * Bloom of the benchmark set is a few MB no matter the corpus size; probing
  * it scan-side drops the non-matching grams before the exchange, so the
  * shuffle carries only true hits + an fpp-sized trickle of false positives,
  * and the exact verify join that follows restores *bitwise-identical*
  * results (a Bloom has no false negatives).
  *
  * Both the build and the probe consume Spark's own `xxhash64` column values
  * (Kirsch–Mitzenmacher double hashing: pos_i = (h1 + i·h2) mod m), so there
  * is no cross-implementation hash-consistency risk: the bit the builder sets
  * and the bit the probe tests are derived from the same column expressions.
  * The probe is pure built-in Columns (literal word array + element_at +
  * shiftright), so it stays inside whole-stage codegen — no UDF.
  */
object Bloom {

  /** Mixes the second, independent hash: `xxhash64(c, lit(SeedB))` differs
    * from `xxhash64(c)` by folding an extra column into the stream.
    */
  val SeedB: Long = 1299709L // prime; arbitrary but fixed for reproducibility

  /** (h1, h2) probe hashes for a value column — shared by build and probe. */
  def hashes(c: Column): (Column, Column) = (xxhash64(c), xxhash64(c, lit(SeedB)))

  /** Standard sizing: m = ceil(-n ln p / ln²2) bits, k = round(m/n · ln 2),
    * clamped to [1, 8] probes and at least one 64-bit word.
    */
  final case class Params(words: Int, k: Int) {
    def bits: Long = words.toLong * 64L
  }
  def params(expected: Long, fpp: Double): Params = {
    require(expected >= 0, s"expected must be >= 0, got $expected")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(1L, expected)
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = math.max(1L, (m + 63L) / 64L)
    require(words <= Int.MaxValue / 64, s"bloom too large: $words words")
    val k = math.max(1, math.min(8, math.round(m.toDouble / n * math.log(2)).toInt))
    Params(words.toInt, k)
  }

  /** Nonnegative remainder, matching Spark SQL's `pmod`. */
  private def pm(h: Long, m: Long): Long = { val r = h % m; if (r < 0) r + m else r }

  /** Bit-OR Aggregator over (h1, h2) rows: each input sets its k probe bits,
    * merge ORs the word arrays — fully distributed build, the driver only
    * ever sees the final `words * 8` bytes (bounded by the bloom's size, not
    * the data's).
    */
  final class BuildAgg(words: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    private val m = words.toLong * 64L
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val a = pm(in._1, m)
      val b = pm(in._2, m)
      var i = 0
      while (i < k) {
        val pos = (a + i.toLong * b) % m
        buf((pos >>> 6).toInt) |= 1L << (pos & 63L)
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Builds the filter from a column of `df` (typically a distinct reference
    * set — small by definition; the corpus NEVER flows through this).
    */
  def build(df: DataFrame, valueCol: String, p: Params): Array[Long] = {
    val (h1, h2) = hashes(col(valueCol))
    implicit val enc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    df.select(h1.as("h1"), h2.as("h2"))
      .as[(Long, Long)]
      .select(new BuildAgg(p.words, p.k).toColumn)
      .head()
  }

  /** Membership probe as a pure built-in Column predicate over `valueCol`:
    * true iff all k probe bits are set. False positives at ~the build fpp;
    * false negatives never — PROVIDED `k` is at most the k the filter was
    * built with (the same `Params` the builder used; a LARGER probe k tests
    * bits the builder never set and silently introduces false negatives,
    * which would change query results, not just performance). The filter
    * ships inside the plan as a literal long array (broadcast with the task
    * binary — no extra job), and every piece (xxhash64, pmod, element_at,
    * shiftright, bitwise AND) is codegen'd, so the probe rides the scan.
    */
  def mightContain(valueCol: Column, bloom: Array[Long], k: Int): Column = {
    require(bloom.nonEmpty && k >= 1, "empty bloom or k < 1")
    val m = bloom.length.toLong * 64L
    val (h1, h2) = hashes(valueCol)
    val arr = typedLit(bloom.toSeq)
    val a = pmod(h1, lit(m))
    val b = pmod(h2, lit(m))
    (0 until k).map { i =>
      // a + i*b <= (m-1) + 7*(m-1): no 64-bit overflow for any sane m
      val pos = (a + lit(i.toLong) * b) % lit(m)
      val word = element_at(arr, (pos / lit(64L)).cast("int") + lit(1))
      val bit = (pos % lit(64L)).cast("int")
      // functions.shiftright only takes a literal shift; the SQL builtin
      // accepts a column — call it directly to keep the probe codegen'd
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
