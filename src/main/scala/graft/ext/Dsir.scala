package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"),
  * re-expressed so the whole weight computation is exact integer
  * arithmetic: score every document in a raw pool by how much its hashed
  * n-gram distribution looks like a small TARGET-domain sample, then keep
  * the top slice of the pool. This is the domain-selection step
  * CCNet/Pile-style curation runs before training, complementing the
  * quality lanes (t13 funnel, t20 LM perplexity): those ask "is this
  * document good", DSIR asks "is this document ON-DISTRIBUTION for the
  * domain I care about".
  *
  * The reference pipeline has no selection operator (its filters are
  * rule-based, `cleaner/cleaning_rules.py:11-223`); this is §7.5 extension
  * surface.
  *
  * Model: hashed n-gram bag-of-features (unigrams + adjacent bigrams, the
  * paper's features) bucketed to [[Buckets]] cells by md5 — content-stable
  * and engine-portable (the p13 hex-digit idiom), so an oracle engine
  * computes the identical bucket for the identical token. Per-feature
  * log-likelihood ratio log2(p_b/q_b) is quantized to whole bits with the
  * integer bit-length trick (`bitlen(x) = length(bin(x)) = floor(log2 x)+1`,
  * exact in any engine with a binary formatter; rationale in
  * [[LangModel]]'s scaladoc):
  *
  *   s(b) = [bitlen(ct_b + 1) - bitlen(Tt + 1)] - [bitlen(cr_b + 1) - bitlen(Tr + 1)]
  *
  * with add-one smoothing (ct/cr = target/raw bucket counts, Tt/Tr =
  * totals). A document's importance weight is the BIGINT sum of s(b) over
  * its feature occurrences — order-independent, bitwise-oracle-able.
  * Ranking fidelity survives the whole-bit quantization for the same
  * reason it does in the LM filter: selection consumes weights only
  * through a coarse top-fraction cut.
  *
  * Scale shape: the trained model is a [[Buckets]]-entry integer lookup
  * table plus one scalar bias — O(Buckets) driver state regardless of
  * corpus size — inlined into the scoring scan as a literal array, so
  * scoring is ZERO joins: one codegen'd explode → element_at(lut) →
  * per-doc aggregation (a single shuffle, partial-aggregated). Training
  * is two explode→groupBy passes each returning ≤ Buckets rows. Contrast
  * with the LM filter whose model is data-sized count TABLES: a hashed
  * low-resolution distribution fits scan-side, and that is the point of
  * DSIR's hashing at 100 TB.
  */
object Dsir {

  /** Feature-hash resolution. 256 keeps the lookup table a readable
    * two-hex-digit literal; the paper uses 10k — at any size the table
    * stays O(Buckets) driver state, and 256 is already enough to separate
    * the fixture's languages (DsirSpec pins the behavior).
    */
  val Buckets = 256

  /** md5-hex → bucket 0..255, identical text in Spark SQL and DuckDB. */
  def bucketExpr(e: String): String =
    s"(instr('0123456789abcdef', substring(md5($e), 1, 1)) - 1) * 16 + " +
      s"instr('0123456789abcdef', substring(md5($e), 2, 1)) - 1"

  /** Unigrams + adjacent space-joined bigrams from a token-array column —
    * one array concat so scoring explodes ONCE. The size guard matches
    * LangModel.train's: under ANSI mode `sequence(1, 0)` is descending and
    * `element_at(t, 0)` throws, so single-token docs must contribute an
    * empty bigram array.
    */
  def featuresExpr(t: String): String =
    s"concat($t, CASE WHEN size($t) >= 2 THEN " +
      s"transform(sequence(1, size($t) - 1), i -> " +
      s"concat(element_at($t, i), ' ', element_at($t, i + 1))) " +
      "ELSE array() END)"

  /** Trained importance model: `diffBits(b)` = bitlen(ct_b+1) - bitlen(cr_b+1)
    * and the per-feature bias bitlen(Tr+1) - bitlen(Tt+1), so a feature in
    * bucket b scores `diffBits(b) + bias`.
    */
  final case class Model(diffBits: Array[Int], bias: Int) {
    require(diffBits.length == Buckets, s"expected $Buckets buckets")
    /** The per-feature score LUT as a literal SQL array expression. */
    def lutExpr: String =
      diffBits.map(_ + bias).mkString("array(", ", ", ")")
  }

  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  private def bucketCounts(tokenized: DataFrame, tokensCol: String): Array[Long] = {
    val rows = tokenized
      .selectExpr(s"explode(${featuresExpr(tokensCol)}) AS f")
      .selectExpr(s"${bucketExpr("f")} AS b")
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect() // ≤ Buckets rows by construction
    val arr = Array.fill(Buckets)(0L)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Train on pre-tokenized target-domain and raw-pool frames (`tokensCol`:
    * array&lt;string&gt;). Two partial-aggregating passes; only 2×Buckets
    * counts ever reach the driver.
    */
  def train(target: DataFrame, raw: DataFrame, tokensCol: String = "t"): Model = {
    val ct = bucketCounts(target, tokensCol)
    val cr = bucketCounts(raw, tokensCol)
    val (tt, tr) = (ct.sum, cr.sum)
    require(tt > 0L, "Dsir.train: empty target slice (no features)")
    require(tr > 0L, "Dsir.train: empty raw pool (no features)")
    Model(
      Array.tabulate(Buckets)(b => bitlen(ct(b) + 1) - bitlen(cr(b) + 1)),
      bitlen(tr + 1) - bitlen(tt + 1))
  }

  /** Score pre-tokenized docs: one row per `keyCols` group with `n_feats`
    * and the exact integer importance weight `w_bits` (sum of per-feature
    * scores, bias included). Zero joins — the LUT rides the scan.
    * Docs with no features (empty token array) produce no row.
    */
  def score(tokenized: DataFrame, m: Model, keyCols: Seq[String],
      tokensCol: String = "t"): DataFrame =
    tokenized
      .selectExpr(keyCols ++ Seq(s"explode(${featuresExpr(tokensCol)}) AS f"): _*)
      .selectExpr(keyCols ++ Seq(
        s"element_at(${m.lutExpr}, (${bucketExpr("f")}) + 1) AS s"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("s")).cast("long").as("w_bits"))
}
