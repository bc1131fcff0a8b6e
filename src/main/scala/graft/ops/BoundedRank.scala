package graft.ops

import org.apache.spark.sql.expressions.Aggregator

/** The shared k-bounded ranking Aggregator behind every bounded top-k /
  * bottom-k path in the library (`Similarity.TopK` / `TopKTerms`,
  * `ScaleOps.BottomK`): the buffer is a list sorted under `beats` (strict
  * "ranks ahead of" — a strict total order), capped at `k` and merged
  * associatively, so partial aggregation ships at most k elements per
  * group per partition — the property that replaces corpus-sized
  * `row_number` windows throughout the engine.
  *
  * Buffer invariant: sorted best-first under `beats`, length <= k. Insert
  * is the hot loop of the ANN/ranking family: once the buffer is full, the
  * overwhelming majority of candidates lose to the current worst and cost
  * ONE comparison (the O(1) reject fast path); a winner pays O(position)
  * list surgery, never a re-sort. Merge is a linear truncated merge of two
  * valid buffers. PropertiesSpec pins the algebra (partial merge ==
  * sequential fold == sort-and-take) per concrete ordering.
  *
  * Concrete subclasses provide `beats` and the encoders (encoders stay
  * monomorphic so no TypeTag is captured into task closures).
  */
abstract class BoundedRank[T](k: Int) extends Aggregator[T, List[T], List[T]] {

  /** Strict "a ranks ahead of b". Must be a strict total order over the
    * values actually aggregated (break ties on a unique field) — equal
    * elements are kept input-order-stably but make rank boundaries
    * engine-dependent.
    */
  protected def beats(a: T, b: T): Boolean

  final override def zero: List[T] = Nil

  private def insert(buf: List[T], s: T): List[T] = {
    // nonEmpty first: k <= 0 must yield Nil, not an exception on Nil.last
    if (buf.nonEmpty && buf.lengthCompare(k) >= 0 && !beats(s, buf.last)) return buf
    val (hi, lo) = buf.span(x => !beats(s, x))
    val merged = hi ::: s :: lo
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  final override def reduce(buf: List[T], in: T): List[T] = insert(buf, in)

  // both sides hold the invariant — linear merge, truncated at k
  final override def merge(a: List[T], b: List[T]): List[T] = {
    val out = List.newBuilder[T]
    var x = a
    var y = b
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && !beats(y.head, x.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  final override def finish(buf: List[T]): List[T] = buf
}
