package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language model with stupid backoff, quantized to
  * INTEGER log2 surprisal — the CCNet-style LM quality filter (Wenzek et
  * al. 2020: score documents by LM perplexity on a clean reference slice,
  * keep/bucket by perplexity tranche) re-expressed so the whole scoring
  * pipeline is exact integer arithmetic.
  *
  * The reference pipeline has no LM filter (its quality gates are the
  * rule-based cleaning chain, `cleaner/cleaning_rules.py:11-223`); this is
  * part of the §7.5 LLM-corpus extension surface beside the Gopher funnel
  * (t13) and repetition filters (t10).
  *
  * Why integer bits instead of float log-probs: a float `ln` is not
  * IEEE-correctly-rounded, so Spark and an oracle engine can disagree by an
  * ulp and flip a rounding boundary, and float SUM is addition-order
  * dependent. Quantizing each token's surprisal to whole bits via integer
  * bit-length — `bitlen(x) = length(bin(x)) = floor(log2 x) + 1`, exact in
  * any engine with a binary formatter — keeps per-token scores within 1 bit
  * of the real log2 and makes document scores exact BIGINTs: sums are
  * order-independent, oracles are bitwise. Ranking fidelity survives the
  * quantization because CCNet-style filtering only consumes perplexity
  * through coarse tranche cuts (head/middle/tail), not raw values.
  *
  * Scoring rule per token position i (1-based), with train-slice unigram
  * counts C(w), bigram counts C(c,w), context counts C(c), total T:
  *  - i = 1 (no context): unigram surprisal `bitlen(T) - bitlen(C(w))`,
  *    or OOV `bitlen(T) + 8` (an unseen word is ~2^-8/T likely);
  *  - bigram hit: `bitlen(C(c)) - bitlen(C(c,w))` (≈ log2 C(c)/C(c,w));
  *  - unigram backoff: `2 + bitlen(T) - bitlen(C(w))` — the stupid-backoff
  *    α=0.4 of Brants et al. 2007 rounded to a whole-bit penalty (2 bits
  *    ≈ α=0.25; integer so the oracle stays exact);
  *  - OOV: `2 + bitlen(T) + 8`.
  * All four branches are non-negative: C(c,w) ≤ C(c) and C(w) ≤ T.
  *
  * Scale shape: the model is two count TABLES (unigram vocabulary-sized,
  * bigram data-sized), never driver state — only the scalar total token
  * count crosses to the driver. Training is two partial-aggregating
  * explode→groupBy passes; scoring is one posexplode plus two merge-hinted
  * left joins against the count tables (spill-safe at any vocabulary size;
  * AQE takes the hash fast path when a side fits), then a per-doc
  * aggregation. No window, no broadcast of anything data-sized.
  */
object LangModel {

  /** Trained model: `unigrams(w, cw)`, `bigrams(c1, w2, cb, cc)` with the
    * context count cc = C(c1) pre-joined at train time (one vocabulary-sized
    * join HERE instead of a third join in every scoring pass), and the
    * scalar total train-token count.
    */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame, totalTokens: Long) {
    /** bitlen(totalTokens) — a driver-side constant folded into scoring. */
    def totalBits: Int = 64 - java.lang.Long.numberOfLeadingZeros(totalTokens)
  }

  /** Train on pre-tokenized docs (`tokensCol`: array<string>). */
  def train(tokenized: DataFrame, tokensCol: String = "t"): Model = {
    val uni = tokenized.select(explode(col(tokensCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .localCheckpoint(eager = false) // feeds total + context join + scoring
    val totalRow = uni.agg(sum("cw")).collect()(0)
    require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0L,
      "LangModel.train: empty training slice (no tokens)")
    // adjacent-pair bigrams; the explicit size guard matches t19's: under
    // ANSI mode sequence(1, 0) is DESCENDING ([1, 0]) and element_at(t, 0)
    // throws, so a single-token doc must emit an empty pair array
    val pairs = tokenized.selectExpr(
      s"explode(CASE WHEN size($tokensCol) >= 2 THEN " +
        s"transform(sequence(1, size($tokensCol) - 1), i -> " +
        s"struct(element_at($tokensCol, i) AS c1, element_at($tokensCol, i + 1) AS w2)) " +
        "ELSE array() END) AS z")
      .selectExpr("z.c1 AS c1", "z.w2 AS w2")
    val big = pairs.groupBy("c1", "w2").agg(count(lit(1)).as("cb"))
      .join(uni.selectExpr("w AS c1", "cw AS cc").hint("merge"), Seq("c1"))
    Model(uni, big, totalRow.getLong(0))
  }

  /** Score pre-tokenized docs: one row per `keyCols` group with `n_tokens`
    * and the exact integer surprisal sum `bits`. Perplexity-per-token is
    * `bits / n_tokens` (in log2 space; consumers divide where needed so the
    * stored score stays exact).
    */
  def scoreDocs(tokenized: DataFrame, m: Model, keyCols: Seq[String],
      tokensCol: String = "t"): DataFrame = {
    val tb = m.totalBits
    val post = tokenized
      .selectExpr(keyCols ++ Seq(s"$tokensCol AS __t"): _*)
      .selectExpr(keyCols ++ Seq("__t", "posexplode(__t)"): _*)
      // pos is 0-based; element_at is 1-based, so element_at(__t, pos) is
      // exactly the PREVIOUS token of the current one
      .selectExpr(keyCols ++ Seq("pos + 1 AS i", "col AS w",
        "CASE WHEN pos >= 1 THEN element_at(__t, pos) END AS c"): _*)
    val bg = m.bigrams
      .withColumnRenamed("c1", "c").withColumnRenamed("w2", "w")
    val scored = post
      .join(bg.hint("merge"), Seq("c", "w"), "left")
      .join(m.unigrams.hint("merge"), Seq("w"), "left")
    val bits = when(col("i") === 1,
        when(col("cw").isNotNull, lit(tb) - length(bin(col("cw"))))
          .otherwise(lit(tb + 8)))
      .when(col("cb").isNotNull, length(bin(col("cc"))) - length(bin(col("cb"))))
      .when(col("cw").isNotNull, lit(2 + tb) - length(bin(col("cw"))))
      .otherwise(lit(2 + tb + 8))
    scored.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(bits).cast("long").as("bits"))
  }
}
