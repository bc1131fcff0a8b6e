package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch: per-group token frequencies in ONE
  * bounded-state aggregation pass.
  *
  * Why it exists next to the exact path (t5's hash-agg + `TopKTerms`): exact
  * counting shuffles one `(group, token, count)` row per distinct token —
  * fine when the vocabulary fits a shuffle, linear in dictionary size when
  * it doesn't. The sketch's partial state is AT MOST `c` counters per group
  * per partition no matter how many distinct tokens stream through, so the
  * exchange is tasks x c entries — independent of vocabulary size. That is
  * the only shape that survives a 100 TB corpus whose token dictionary
  * (URLs, code identifiers, typo space) is itself too large to shuffle.
  *
  * Guarantees (classic Misra–Gries, plus the mergeable-summaries merge of
  * Agarwal et al., PODS'12):
  *  - estimate <= true frequency (counts only ever shed mass);
  *  - true - estimate <= N/(c+1) where N is the group's total token count —
  *    so every token with frequency > N/(c+1) is guaranteed PRESENT;
  *  - when a group's distinct-token count is <= c, no counter is ever
  *    evicted on any partitioning, so the sketch is EXACT and deterministic
  *    (the regime the DuckDB oracle gates; FreqSketchSpec pins the bounds in
  *    the approximate regime, where estimates are partitioning-dependent).
  */
object FreqSketch {

  /** One reported counter; `n` is the MG estimate (a lower bound). */
  final case class KeyCount(token: String, n: Long)

  final class MisraGries(c: Int)
      extends Aggregator[String, Map[String, Long], List[KeyCount]] {
    require(c >= 1, s"capacity must be >= 1, got $c")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
      buf.get(tok) match {
        case Some(n) => buf.updated(tok, n + 1L)
        case None if buf.size < c => buf.updated(tok, 1L)
        // full and unseen: the classic decrement-all step (the arriving
        // token is consumed by the decrement, not inserted)
        case None => buf.collect { case (k, n) if n > 1L => k -> (n - 1L) }
      }

    /** Pointwise sum, then — if over capacity — subtract the (c+1)-th
      * largest count from every counter and drop the non-positive ones.
      * Preserves the N/(c+1) deficit bound (Agarwal et al. 2012, thm 1).
      */
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (k, n)) => m.updated(k, m.getOrElse(k, 0L) + n) }
      if (sum.size <= c) sum
      else {
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(c)
        sum.collect { case (k, n) if n > cut => k -> (n - cut) }
      }
    }

    /** Deterministic presentation: estimate desc, token asc. */
    override def finish(buf: Map[String, Long]): List[KeyCount] =
      buf.iterator.map { case (k, n) => KeyCount(k, n) }
        .toList.sortBy(e => (-e.n, e.token))

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[List[KeyCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[KeyCount]]()
  }

  /** Per-key heavy hitters over `(key, token)` rows: MG(c) sketch per key,
    * report the top `k` (estimate desc, token asc). Output:
    * (key, rank, token, n), ordered — the `topTermsByKey` surface with
    * sketched instead of exact counts.
    */
  def heavyHittersByKey(df: DataFrame, c: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= c, s"report size k=$k must be in [1, c=$c]")
    val spark = df.sparkSession
    import spark.implicits._
    val mg = new MisraGries(c).toColumn
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(token AS STRING) AS token")
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(mg.name("hh"))
      .toDF("key", "hh")
      .selectExpr("key", s"posexplode(slice(hh, 1, $k)) AS (pos, hit)")
      .selectExpr(
        "key", "CAST(pos + 1 AS BIGINT) AS rank",
        "hit.token AS token", "hit.n AS n")
      .orderBy("key", "rank")
  }
}
