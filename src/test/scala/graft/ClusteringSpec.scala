package graft

import org.apache.spark.sql.functions._

import graft.ext.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Long])]) = rows.toDF("id", "q")

  test("assignCells: exact integer distances, ties to the lowest cell index") {
    val cents = Array(Array(0L, 0L), Array(10L, 0L), Array(5L, 5L))
    val got = Clustering.assignCells(
      df(Seq((1L, Seq(1L, 0L)), (2L, Seq(5L, 0L)), (3L, Seq(9L, 1L)), (4L, Seq(5L, 5L)))),
      "q", cents)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("cell"), r.getAs[Long]("dist")))).toMap
    assert(got(1L) == (0, 1L))   // d=(1, 81, 41)
    assert(got(2L) == (0, 25L))  // d=(25, 25, 25): three-way tie -> cell 0
    assert(got(3L) == (1, 2L))   // d=(82, 2, 32)
    assert(got(4L) == (2, 0L))   // exact centroid hit
  }

  test("lloydInt == driver-side reference on random data; empty cells keep centroids") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map { i =>
      // three planted blobs + negative coordinates (division-rule coverage)
      val c = i % 3
      val base = Seq(Seq(-50L, -50L), Seq(0L, 60L), Seq(70L, -10L))(c)
      (i.toLong, base.map(_ + rnd.nextInt(21) - 10))
    }
    // 4th centroid planted far away: it must capture nothing and SURVIVE
    val init = Array(Array(-50L, -50L), Array(0L, 60L), Array(70L, -10L),
      Array(100000L, 100000L))
    val (cents, assigned) = Clustering.lloydInt(df(pts), "q", init, iters = 2)

    // driver reference: same quantized rule, truncating division
    var ref = init.map(_.clone())
    def refAssign(c: Array[Array[Long]]) = pts.map { case (id, q) =>
      id -> c.indices.map(k =>
        (q.zip(c(k)).map { case (x, y) => (x - y) * (x - y) }.sum, k)).min
    }.toMap
    (1 to 2).foreach { _ =>
      val a = refAssign(ref)
      ref = ref.indices.map { k =>
        val members = pts.filter(p => a(p._1)._2 == k)
        if (members.isEmpty) ref(k)
        else members.head._2.indices.map(d =>
          members.map(_._2(d)).sum / members.size).toArray
      }.toArray
    }
    assert(cents.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq,
      s"centroids diverged: ${cents.map(_.mkString(",")).mkString(" | ")} vs " +
        ref.map(_.mkString(",")).mkString(" | "))
    assert(cents(3).toSeq == Seq(100000L, 100000L), "empty cell keeps its centroid")
    val a = refAssign(ref)
    val gotAssign = assigned.collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("dist"), r.getAs[Int]("cell")))).toMap
    assert(gotAssign == a, "final assignment must match the reference")
    // iters = 0 is the pure assignment against init
    val (c0, _) = Clustering.lloydInt(df(pts), "q", init, iters = 0)
    assert(c0.map(_.toSeq).toSeq == init.map(_.toSeq).toSeq)
  }

  test("assignment plan: no window, no join — scan-side codegen arithmetic") {
    val cents = Array.tabulate(4)(i => Array(i * 10L, i * 5L))
    val plan = Clustering.assignCells(
      df((1 to 50).map(i => (i.toLong, Seq(i.toLong, 2L * i)))), "q", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"assignment must be pure column arithmetic:\n${plan.take(2000)}")
  }
}
