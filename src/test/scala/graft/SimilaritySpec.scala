package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Similarity library: TopK aggregator bounds + correctness, brute-force vs
  * LSH agreement on planted neighbors.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 20 corpus vectors in 16 dims: vec i = one-hot(i % 16) + small tail, plus
  // a planted near-duplicate of vector 0 at id 19.
  private lazy val vecs = {
    val rows = (0L until 19L).map { i =>
      val v = Array.tabulate(16)(j => if (j == (i % 16).toInt) 1.0f else 0.01f * ((i + j) % 3))
      (i, v.toSeq)
    } :+ (19L, Array.tabulate(16)(j => if (j == 0) 0.98f else 0.012f).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  private lazy val prepared = Similarity.prepare(vecs, "vec_id", "embedding")

  test("TopK aggregator keeps k best with deterministic tiebreaks and bounded buffer") {
    val agg = new Similarity.TopK(3)
    val items = Seq(
      Similarity.Scored(0.5, 7), Similarity.Scored(0.9, 2), Similarity.Scored(0.9, 1),
      Similarity.Scored(0.1, 9), Similarity.Scored(0.7, 4))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3)
    assert(buf.map(_.id) == List(1, 2, 4)) // 0.9 tie -> lower id first
    // merge is associative-ish: merging partials == reducing everything
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == buf)
  }

  test("bruteForceTopK finds the planted near-duplicate as top hit") {
    val queries = prepared.where(col("id") === 0)
    val out = Similarity.bruteForceTopK(prepared, queries, k = 3).collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("id") == 19, "planted dup of vec 0 must rank first")
    assert(out(0).getAs[Double]("score") > 0.99)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("lshTopK agrees with brute force on the planted neighbor (recall on strong pairs)") {
    val queries = prepared.where(col("id") === 0)
    val lsh = Similarity.lshTopK(prepared, queries, k = 3)
    val top = lsh.collect().headOption
    assert(top.nonEmpty, "sign bands must collide for a near-identical vector")
    assert(top.get.getAs[Long]("id") == 19)
  }

  test("bruteForceTopK handles k larger than the corpus") {
    val queries = prepared.where(col("id") === 5)
    val out = Similarity.bruteForceTopK(prepared, queries, k = 100).collect()
    assert(out.length == 19) // whole corpus minus the query itself
  }
}
