package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over integer-quantized embeddings — the
  * per-corpus clustering pass the embedding family has so far stood in for
  * with FIXED centroids (d9's SemDeDup cells, n3's IVF coarse quantizer
  * note both say "k-means in the real deployment"). This is that k-means,
  * in the engine's exactness discipline so the oracle gates it bitwise:
  *
  *  - vectors quantize to exact integers once (`floor(x * 1e4)` — the
  *    e3/e5 recipe), so every distance is an exact BIGINT
  *    sum-of-squared-diffs and every per-cell dimension sum is exact;
  *  - assignment is scan-side codegen'd column arithmetic: per-centroid
  *    distances via `zip_with`/`aggregate` folds with the centroids
  *    INLINED as literals, argmin as a `<=` CASE chain (ties break to the
  *    lowest cell index — the same (dist, cell) order on any engine). No
  *    window, no join, no shuffle in the assignment;
  *  - the centroid update collects k x dim exact sums + k counts to the
  *    driver (BOUNDED state — the shape every production k-means uses) and
  *    recomputes centroids with TRUNCATING integer division (Scala `/`):
  *    DuckDB's `//` and Spark SQL's `div` both truncate toward zero
  *    (measured: `-7 // 2 = -3`, not floor's -4), so truncation is the
  *    portable rule — `Math.floorDiv` would silently diverge on any
  *    negative dimension sum. An empty cell keeps its previous centroid.
  *
  * Scale: per iteration, one scan for assignment + one partial-aggregating
  * (cell, dim) sum whose exchange is k x dim rows. Driver state is k x dim
  * longs. Iteration count is FIXED by the caller — a convergence test
  * would make the number of Spark jobs data-dependent (the e5 discipline).
  */
object Clustering {

  /** Per-row cell assignment against literal centroids: distance columns
    * `d0..d{k-1}` (exact BIGINT), `cell`, and `dist` (the winning
    * distance).
    */
  def assignCells(vecs: DataFrame, qCol: String,
      centroids: Array[Array[Long]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val k = centroids.length
    val distCols = centroids.zipWithIndex.map { case (c, i) =>
      expr(s"aggregate(zip_with($qCol, array(${c.mkString("L, ")}L), " +
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)").as(s"__d$i")
    }
    val withD = vecs.select(col("*") +: distCols: _*)
    // argmin, ties to the LOWEST index: branch i fires when d_i <= every
    // LATER distance and no earlier branch fired (an earlier tie wins there)
    val cell = (0 until k - 1).foldLeft(Option.empty[Column]) { (acc, i) =>
      val cond = (i + 1 until k).map(j => col(s"__d$i") <= col(s"__d$j")).reduce(_ && _)
      Some(acc.fold(when(cond, lit(i)))(_.when(cond, lit(i))))
    }.fold(lit(0))(_.otherwise(lit(k - 1)))
    val dist = if (k == 1) col("__d0")
      else least((0 until k).map(i => col(s"__d$i")): _*)
    withD.withColumn("cell", cell).withColumn("dist", dist)
      .drop((0 until k).map(i => s"__d$i"): _*)
  }

  /** `iters` Lloyd rounds from `init`; returns the final centroids and the
    * final assignment (input columns + `cell` + `dist`).
    */
  def lloydInt(vecs: DataFrame, qCol: String, init: Array[Array[Long]],
      iters: Int): (Array[Array[Long]], DataFrame) = {
    require(iters >= 0, "iters must be >= 0")
    var cents = init
    val k = init.length
    var it = 0
    while (it < iters) {
      val assigned = assignCells(vecs, qCol, cents)
      // exact per-(cell, dim) sums + per-cell counts: k x dim driver rows
      val sums = assigned
        .select(col("cell"), posexplode(col(qCol)).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("d")) ->
          (r.getAs[Long]("s"), r.getAs[Long]("n")))
        .toMap
      cents = Array.tabulate(k) { c =>
        val dims = cents(c).indices
        if (dims.exists(d => sums.contains((c, d))))
          dims.map { d =>
            val (s, n) = sums((c, d))
            s / n // truncation toward zero — DuckDB `//` / Spark `div` semantics
          }.toArray
        else cents(c) // empty cell: keep the previous centroid
      }
      it += 1
    }
    (cents, assignCells(vecs, qCol, cents))
  }
}
