package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

/** Sequence packing for LLM pretraining batches: CONCAT-AND-CHUNK — the
  * GPT-style recipe where documents concatenate in a deterministic global
  * order and the token stream chunks into fixed-`capacity` context windows.
  * Unlike bin-packing variants (first-fit etc., which are inherently
  * sequential), concat-and-chunk is PURE ARITHMETIC over each document's
  * exclusive running token offset: pack id = start div capacity, and a
  * document crosses a window boundary iff its span ends in a later pack.
  * Fill is 100% by construction (no padding waste); the boundary-crossing
  * count is the attention-contamination metric packing dashboards watch.
  *
  * 100 TB shape: the only global state is the prefix sum, which
  * [[ScaleOps.globalRunningTotal]] supplies with range partitioning +
  * O(partitions) driver offsets — no corpus-global window, no sequential
  * pass. Everything after the offset is embarrassingly parallel arithmetic.
  */
object Packing {

  /** Per-document pack assignment: (doc_id, toks, start, pack_id, crosses).
    * `tokenExpr` defaults to the whitespace token count the text family
    * uses (t3/t12's convention); null-text documents are excluded (they
    * contribute no tokens to the stream). `orderCols` must totally order
    * documents — the concatenation order is part of the packing's identity,
    * so it must be deterministic and engine-independent.
    */
  def concatChunkAssignments(docs: DataFrame, capacity: Long,
      tokenExpr: String = "size(split(text, ' '))",
      orderCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val t = docs.where(col("text").isNotNull)
      .selectExpr(orderCols :+ s"CAST(($tokenExpr) AS BIGINT) AS toks": _*)
    ScaleOps.globalRunningTotal(t, orderCols, "toks")
      .withColumn("pack_id", expr(s"start div $capacity"))
      .withColumn("crosses",
        expr(s"toks > 0 AND (start + toks - 1) div $capacity > pack_id"))
  }

  /** Per-pack rollup — the packing dashboard: documents STARTING in each
    * window, their token mass, and how many cross into the next window.
    * Output: (pack_id, docs, tokens, crossers), ordered.
    */
  def packStats(docs: DataFrame, capacity: Long): DataFrame =
    concatChunkAssignments(docs, capacity)
      .groupBy("pack_id")
      .agg(
        count(lit(1)).as("docs"),
        sum("toks").cast("long").as("tokens"),
        sum(when(col("crosses"), 1L).otherwise(0L)).cast("long").as("crossers"))
      .orderBy("pack_id")
}
