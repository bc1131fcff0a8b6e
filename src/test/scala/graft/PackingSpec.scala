package graft

import org.apache.spark.sql.functions._

import graft.ext.Packing

/** Concat-and-chunk sequence packing: the offset stream is a disjoint,
  * contiguous partition of the token axis, pack arithmetic matches the
  * definition on crafted boundaries, and the rollup conserves token mass.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("assignments form a contiguous disjoint token stream in doc_id order") {
    val docs = (1 to 200).map(i => (i.toLong, "en", ("w " * (i % 37 + 1)).trim))
      .toDF("doc_id", "lang", "text")
    val a = Packing.concatChunkAssignments(docs, 64L)
      .orderBy("doc_id").collect()
    var expectedStart = 0L
    a.foreach { r =>
      assert(r.getAs[Long]("start") == expectedStart,
        s"doc ${r.getAs[Long]("doc_id")}: starts must tile the stream")
      expectedStart += r.getAs[Long]("toks")
      val pack = r.getAs[Long]("pack_id")
      assert(pack == r.getAs[Long]("start") / 64L)
      val endPack = (r.getAs[Long]("start") + r.getAs[Long]("toks") - 1) / 64L
      assert(r.getAs[Boolean]("crosses") == (endPack > pack))
    }
  }

  test("pack boundaries on crafted sizes: exact fits never cross, spanners do") {
    // capacity 10: doc a fills [0,10) exactly (no cross), b spans [10,25)
    // across two boundaries (cross), c sits inside [25,27)
    val docs = Seq(
      (1L, "en", ("x " * 10).trim),  // 10 tokens
      (2L, "en", ("y " * 15).trim),  // 15 tokens
      (3L, "en", ("z " * 2).trim))   // 2 tokens
      .toDF("doc_id", "lang", "text")
    val a = Packing.concatChunkAssignments(docs, 10L)
      .orderBy("doc_id").collect()
    assert(a.map(_.getAs[Long]("pack_id")).toSeq == Seq(0L, 1L, 2L))
    assert(a.map(_.getAs[Boolean]("crosses")).toSeq == Seq(false, true, false))
  }

  test("packStats conserves token mass and counts crossers; null text is excluded") {
    val docs = Seq(
      (1L, "en", ("a " * 5).trim), (2L, "en", null.asInstanceOf[String]),
      (3L, "en", ("b " * 8).trim), (4L, "en", ("c " * 3).trim))
      .toDF("doc_id", "lang", "text")
    val stats = Packing.packStats(docs, 6L).collect()
    assert(stats.map(_.getAs[Long]("docs")).sum == 3L, "null-text doc excluded")
    assert(stats.map(_.getAs[Long]("tokens")).sum == 16L, "token mass conserved")
    // stream: d1 [0,5) pack0; d3 [5,13) pack0 crossing; d4 [13,16) pack2
    assert(stats.map(r => (r.getAs[Long]("pack_id"), r.getAs[Long]("docs"),
      r.getAs[Long]("crossers"))).toSeq == Seq((0L, 2L, 1L), (2L, 1L, 0L)))
  }
}
