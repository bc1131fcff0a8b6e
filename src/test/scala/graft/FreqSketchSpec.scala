package graft

import graft.ops.FreqSketch
import graft.ops.FreqSketch.MisraGries

/** Misra–Gries contract: exact + deterministic when the support fits the
  * capacity (the oracle-gated regime), and in the approximate regime the
  * classic bounds hold under ANY partitioning of the stream — estimates
  * never exceed truth, the deficit is at most N/(c+1), and everything above
  * that threshold is present in the summary.
  */
class FreqSketchSpec extends SparkSpec {

  private def exact(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  /** Fold a stream through the sketch along the given partition cuts,
    * reducing within chunks and merging across them — the distributed shape.
    */
  private def sketch(stream: Seq[String], c: Int, cuts: Int): Map[String, Long] = {
    val mg = new MisraGries(c)
    val chunks =
      if (cuts <= 1) Seq(stream)
      else stream.grouped(math.max(1, stream.size / cuts)).toSeq
    chunks.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
  }

  private def seededStream(seed: Int, n: Int, keys: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // Zipfian-ish skew: low key ids far more probable — the heavy hitters
    Seq.fill(n)(s"k${(math.pow(rnd.nextDouble(), 3) * keys).toInt}")
  }

  test("exact regime: support <= c gives exact counts under any partitioning") {
    val stream = seededStream(seed = 1, n = 5000, keys = 40)
    val truth = exact(stream)
    assert(truth.size <= 64, "fixture must stay within capacity")
    for (cuts <- Seq(1, 3, 8, 17))
      assert(sketch(stream, c = 64, cuts) == truth, s"cuts=$cuts diverged")
  }

  test("approximate regime: MG bounds hold under any partitioning") {
    val c = 16
    val stream = seededStream(seed = 2, n = 20000, keys = 400)
    val truth = exact(stream)
    assert(truth.size > c, "stream must overflow the capacity")
    val n = stream.size.toLong
    val deficit = n / (c + 1).toLong
    for (cuts <- Seq(1, 4, 13)) {
      val est = sketch(stream, c, cuts)
      assert(est.size <= c, s"cuts=$cuts: summary over capacity")
      est.foreach { case (k, e) =>
        val t = truth.getOrElse(k, 0L)
        assert(e <= t, s"cuts=$cuts $k: estimate $e above truth $t")
        assert(t - e <= deficit, s"cuts=$cuts $k: deficit ${t - e} > $deficit")
      }
      truth.foreach { case (k, t) =>
        if (t > deficit)
          assert(est.contains(k), s"cuts=$cuts: heavy hitter $k (freq $t) missing")
      }
    }
  }

  test("decrement-all consumes the arriving token (no insert on a full buffer)") {
    val mg = new MisraGries(2)
    val buf = Seq("a", "a", "b").foldLeft(mg.zero)(mg.reduce)
    val hit = mg.reduce(buf, "z") // full, unseen: a->1, b dropped, z NOT inserted
    assert(hit == Map("a" -> 1L), s"got $hit")
  }

  test("property: MG bounds hold for random streams, capacities, and partitionings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      c <- Gen.choose(2, 24)
      keys <- Gen.choose(2, 120)
      n <- Gen.choose(50, 3000)
      cuts <- Gen.choose(1, 9)
      toks <- Gen.listOfN(n, Gen.choose(0, keys - 1).map(i => s"k$i"))
    } yield (c, cuts, toks)
    (1 to 40).foreach { i =>
      gen(Gen.Parameters.default, Seed(9000L + i)).foreach { case (c, cuts, toks) =>
        val truth = exact(toks)
        val est = sketch(toks, c, cuts)
        val deficit = toks.size.toLong / (c + 1).toLong
        assert(est.size <= c, s"seed $i: over capacity")
        est.foreach { case (k, e) =>
          val t = truth.getOrElse(k, 0L)
          assert(e <= t && t - e <= deficit, s"seed $i ($c,$cuts): $k est=$e true=$t")
        }
        truth.foreach { case (k, t) =>
          if (t > deficit) assert(est.contains(k), s"seed $i: lost heavy hitter $k ($t > $deficit)")
        }
        if (truth.size <= c)
          assert(est == truth, s"seed $i: exact regime must be exact")
      }
    }
  }

  test("heavyHittersByKey: exact-regime end-to-end equals the exact top-k") {
    import spark.implicits._
    val rows = for {
      lang <- Seq("aa", "bb"); i <- 1 to 300
    } yield (lang, s"tok${i % (if (lang == "aa") 20 else 50)}")
    val df = rows.toDF("key", "token").repartition(7)
    val got = FreqSketch.heavyHittersByKey(df, c = 64, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = rows.groupBy(identity).map { case ((l, t), v) => (l, t, v.size.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (l, g) =>
        g.toSeq.sortBy { case (_, t, n) => (-n, t) }.take(5).zipWithIndex
          .map { case ((_, t, n), i) => (l, (i + 1).toLong, t, n) }
      }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }
}
