package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components — the missing last step of a dedup
  * pipeline: verified near-dup PAIRS must become CLUSTERS before a canonical
  * representative per cluster can be kept (a transitively-linked group
  * a~b~c is one duplicate family even though (a,c) was never emitted as a
  * pair).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts labeled
  * with itself; each round every vertex takes the minimum label among itself
  * and its neighbors; fixpoint = per-component minimum vertex id. Each round
  * is one shuffle-on-vertex-id join + partial-aggregating min — no driver
  * graph state, so it scales with the edge list. Each round also pointer-jumps
  * (label := label of label), so rounds-to-fixpoint is O(log diameter) — the
  * shortcutting idea of large-star/small-star CC (Kiveris et al.); near-dup
  * families (diameter 2-3) converge in 2 passes, an adversarial million-link
  * chain in ~20. Hitting maxIter without a fixpoint throws rather than
  * returning silently-unconverged labels.
  *
  * Lineage is cut per round (`localCheckpoint`) — an iterative DataFrame
  * loop otherwise compounds the plan each pass.
  */
object GraphOps {

  /** Labels every vertex of the undirected edge list with its component's
    * minimum vertex id. Output: (id, label). Vertices are whatever orderable
    * type the edge columns carry (Comparable under the hood). Isolated
    * vertices don't appear (an edge list has no singletons); union the full
    * vertex set afterwards if singleton components matter.
    *
    * Hybrid execution: small graphs fit trivially in driver memory, and a
    * union-find there costs one collect instead of 3 jobs x diameter rounds
    * of fixed scheduling overhead (measured: the distributed loop spent
    * ~2.5s of pure job latency on an 8-edge fixture). The gate is LAZY — a
    * short-circuiting `limit(driverThreshold/2 + 1).count()` over the RAW
    * edge list (<= driverThreshold/2 raw rows bounds the distinct
    * undirected list at driverThreshold), never a full count of the
    * distinct-union: the eager `und.count()` it replaces ran a whole extra
    * shuffle job per clustering call just to decide the route (the
    * round-6 -> round-5 d6/d8 bench regression). A duplicate-heavy edge
    * list above the raw bound takes the distributed path even when its
    * distinct form is small — a conservative miss, never a wrong result;
    * both paths produce identical labels (spec-pinned).
    */
  def connectedComponents(
      edges: DataFrame,
      src: String = "a",
      dst: String = "b",
      maxIter: Int = 20,
      driverThreshold: Long = 100000): DataFrame = {
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .localCheckpoint(eager = false)

    val rawBound = math.min(driverThreshold / 2 + 1, Int.MaxValue.toLong)
    if (edges.limit(rawBound.toInt).count() < rawBound) return unionFindOnDriver(und)

    // A localCheckpointed Dataset's plan is a LogicalRDD wrapping exactly the
    // persisted RDD — extract it so each round can unpersist the previous
    // round's blocks (otherwise up to maxIter cached block sets accumulate
    // for the life of the job). Direct extraction, not a persistent-RDD-map
    // delta: a concurrent job persisting its own RDDs between snapshots must
    // never have ITS blocks freed by this loop.
    def checkpointOwning(df: DataFrame, eager: Boolean)
        : (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint(eager)
      val rdd = out.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
      (out, rdd)
    }
    var (labels, prevRoundRdd) = checkpointOwning(
      und.select(col("a").as("id")).distinct().withColumn("label", col("id")),
      eager = false)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      iter += 1
      val nbrMin = und
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy("a")
        .agg(min("label").as("nbl"))
        .withColumnRenamed("a", "id")
      // Checkpoint the propagation result BEFORE the pointer-jump self-join:
      // the self-join references it twice, and without a materialization
      // barrier the neighbor-min join + aggregate above (the expensive
      // per-round shuffle) would be recomputed once per join side.
      val (propagated, propRdd) = checkpointOwning(
        labels
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbl"), col("label"))).as("label")),
        eager = false)
      // Pointer jumping (label := label of label): labels chase two hops per
      // round, so rounds-to-fixpoint is O(log diameter), not O(diameter) —
      // an adversarial long chain converges well inside maxIter instead of
      // silently exhausting it.
      val (next, nextRdd) = checkpointOwning(
        propagated.as("x")
          .join(propagated.select(col("id").as("label"), col("label").as("ll")).as("y"),
            Seq("label"), "left")
          .select(col("x.id"), coalesce(col("ll"), col("label")).as("label")),
        eager = true)
      val changed = next
        .join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .where(col("label") =!= col("old"))
        .limit(1)
        .count() > 0
      prevRoundRdd.foreach(_.unpersist(false))
      // `next` is eagerly materialized above, so the jump input is dead here
      propRdd.foreach(_.unpersist(false))
      prevRoundRdd = nextRdd
      labels = next
      converged = !changed
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; with pointer " +
          s"jumping that needs component diameter > 2^$maxIter — raise maxIter only " +
          "if the graph genuinely has such chains")
    labels
  }

  /** Bounded-iteration PageRank in EXACT integer arithmetic — graph
    * centrality for corpus curation (crawl prioritization, spam/user
    * influence scoring, kNN-graph cluster importance) with cross-engine
    * determinism: ranks live in integer micro-units (1.0 == 1,000,000), a
    * vertex's per-edge contribution is `pr div out_degree` (integer
    * division), and the damped update is
    * `(100-dampingPct)*10^4 + (dampingPct * sum(contrib)) div 100` — every
    * step is an order-independent integer op, so any engine (and any
    * partitioning) produces bit-identical ranks, where a double-summed
    * PageRank diverges ulp-by-ulp under reassociation.
    *
    * `edges` is a DIRECTED (src, dst) edge list (pass both directions for
    * an undirected graph); parallel edges should be pre-deduped — each
    * (src, dst) row carries one contribution per iteration. Only vertices
    * with at least one out-edge hold rank (isolated vertices have nothing
    * to propagate and receive the base term trivially; callers wanting
    * them in the output can union them in at the damping floor).
    *
    * Scale shape: each iteration is ONE shuffle — contributions equi-join
    * rank onto the degree-annotated edge list's src (both sides
    * hash-partition on src; the out-degree was joined onto the edge
    * checkpoint ONCE up front, not re-aggregated per round), the receive
    * side partial-aggregates `sum(contrib)` on dst before its exchange.
    * Iterations are a bounded driver loop (the Pregel shape); lineage is
    * cut per round like [[connectedComponents]].
    */
  def pageRankInt(
      edges: DataFrame,
      iterations: Int,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val base = (100L - dampingPct) * 10000L
    // materialize the edge list once: every iteration (and the degree pass)
    // re-reads it, and edge DERIVATION is often the expensive part (a
    // co-occurrence self-join, an LSH candidate pipeline) — without the cut,
    // each of the `iterations` plans would recompute it from scratch
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    // r13 (guide §2.4): the out-degree rides each edge row of the working
    // checkpoint and the vertex table is its own small cut — the old loop
    // recomputed `deg` from the raw edge blocks inside EVERY round's 3-way
    // join (one aggregation + one extra join + one edge-block re-read per
    // iteration). The degree join runs once, here.
    val deg = e0.groupBy("src").agg(count(lit(1)).as("__d"))
      .localCheckpoint(eager = false) // verts + every round's update read it
    val e = e0.join(deg, "src").select(col("src"), col("dst"), col("__d"))
      .localCheckpoint(true)
    // the raw edge blocks are dead once the degree-annotated copy exists
    e0.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
    val verts = deg.select(col("src").as("u"))
    var r = verts.withColumn("pr", lit(1000000L))
    for (i <- 1 to iterations) {
      val contrib = e
        .join(r.withColumnRenamed("u", "__ru"), e("src") === col("__ru"))
        .select(col("dst"), expr("pr div __d").as("__c"))
        .groupBy("dst")
        .agg(sum(col("__c")).as("__contrib"))
      // left join over the full vertex set: a pure-source vertex (no
      // in-edges) receives nothing but keeps the damping floor and keeps
      // contributing next round
      r = verts
        .join(contrib, verts("u") === contrib("dst"), "left")
        .select(col("u"),
          expr(s"${base}L + ($dampingPct * coalesce(__contrib, 0L)) div 100").as("pr"))
      // lazy (r12): each round's rank table has exactly ONE consumer (the
      // next round's contrib join), so the cut can materialize inside that
      // consumer's job instead of paying a dedicated job per iteration —
      // g1 is serial-job-latency-bound, not compute-bound. The edge list
      // `e` above stays EAGER: degree + every round read it, and
      // concurrent AQE stages would race a lazy cut into recomputation.
      if (i < iterations) r = r.localCheckpoint(eager = false)
    }
    r
  }

  /** Exact triangle count by degree-ordered edge orientation (the
    * compact-forward algorithm): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher, enumerate wedges as a
    * self-join of oriented edges on their source, and close each wedge
    * with a semi-join against the oriented edge list. The orientation
    * bounds every vertex's OUT-degree by ~sqrt(2m), so the wedge join —
    * the step a naive 3-way join lets explode on hub vertices — generates
    * O(m^1.5) candidates worst-case instead of sum(deg^2): the shape that
    * survives a power-law 100 TB graph. Each triangle is counted exactly
    * once (its vertices have a unique orientation order); all joins are
    * equi-joins on vertex keys.
    *
    * `und`: canonical undirected edges `(a, b)` with `a < b`, deduped.
    * Returns the exact triangle count.
    *
    * Closure routing (r12): the oriented edge list is a checkpoint
    * (LogicalRDD — size unknown to the planner), so the wedge-closing
    * semi-join can never auto-broadcast and the WEDGE set (the large side,
    * O(m^1.5) worst case) pays a full exchange. The edge COUNT is already
    * materialized, so route on it: at or under `broadcastEdgeBound` edges
    * the closure broadcasts the (src, dst) pairs and the wedges never
    * shuffle (measured at sf0.1: the 14.4 MB wedge exchange + sort was the
    * query's dominant stage); above the bound the shuffled semi-join
    * stands — at corpus scale the edge list must never broadcast.
    */
  def triangleCount(und: DataFrame, broadcastEdgeBound: Long = 1L << 21): Long = {
    val e = und.select(col("a"), col("b")).localCheckpoint(true)
    val m = e.count() // routes the closure AND sizes the wedge fan-out
    val deg = e.selectExpr("a AS v").union(e.selectExpr("b AS v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val o = e
      .join(deg.selectExpr("v AS a", "d AS da"), "a")
      .join(deg.selectExpr("v AS b", "d AS db"), "b")
      .selectExpr(
        "CASE WHEN struct(da, a) < struct(db, b) THEN a ELSE b END AS src",
        "CASE WHEN struct(da, a) < struct(db, b) THEN b ELSE a END AS dst",
        "CASE WHEN struct(da, a) < struct(db, b) THEN db ELSE da END AS dd")
      .localCheckpoint(true) // read three times: two wedge sides + closure
    // r13 negative result, kept for the record: widening the wedge join's
    // exchange (AQE coalesces the byte-tiny oriented edge list to ~one
    // partition while the join OUTPUT is O(m^1.5)) cut wall 3.6 -> 2.3 s at
    // sf0.1 but inflated task CPU 1.1 -> ~12 s — 32 concurrent tasks
    // probing the same ~600k-entry broadcast relation thrash the shared
    // cache, so the same enumeration costs 10x the cycles. The single-task
    // codegen'd SMJ inner loop is the cheapest total-work plan at this
    // volume; at a true corpus scale the exchange is byte-large enough
    // that AQE widens it on its own.
    val wedges = o.as("x")
      .join(o.as("y").hint("merge"),
        expr("x.src = y.src AND struct(x.dd, x.dst) < struct(y.dd, y.dst)"))
      .select(col("x.dst").as("src"), col("y.dst").as("dst"))
    val closure = o.select("src", "dst")
    val closed =
      if (m <= broadcastEdgeBound)
        wedges.join(broadcast(closure), Seq("src", "dst"), "left_semi")
      else wedges.join(closure, Seq("src", "dst"), "left_semi")
    closed.count()
  }

  /** Small-graph path: classic union-find with path compression over the
    * collected edge list, labels normalized to the per-component minimum —
    * byte-identical output to the distributed loop.
    */
  private def unionFindOnDriver(und: DataFrame): DataFrame = {
    import scala.collection.mutable
    val spark = und.sparkSession
    val rows = und.collect()
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    def lt(x: Any, y: Any): Boolean =
      x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    val minOfRoot = mutable.HashMap.empty[Any, Any]
    parent.keys.foreach { v =>
      val r = find(v)
      minOfRoot.get(r) match {
        case Some(m) => if (lt(v, m)) minOfRoot(r) = v
        case None    => minOfRoot(r) = v
      }
    }
    val dt = und.schema("a").dataType
    val out = parent.keys.toSeq.map(v =>
      org.apache.spark.sql.Row(v, minOfRoot(find(v))))
    // LocalRelation, not parallelize (r13): the driver-path label table is
    // tiny, and an RDD-backed frame spread it over defaultParallelism
    // near-empty partitions — every downstream join paid ~cores tasks of
    // pure scheduling (p20's final join measured 32 tasks / 2.7 s run /
    // 0.3 s cpu with zero IO). A local collection keeps it a broadcastable
    // LocalRelation with no job at all.
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      out.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", dt),
        org.apache.spark.sql.types.StructField("label", dt))))
  }
}
