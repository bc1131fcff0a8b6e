package graft

import org.apache.spark.sql.functions._

import graft.ext.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def tok(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text").selectExpr("doc_id", "split(lower(text), ' ') AS t")

  test("train: LUT matches a brute-force recount of hashed features") {
    val target = tok(Seq((0L, "alpha beta alpha"), (1L, "gamma")))
    val raw = tok(Seq((2L, "delta epsilon"), (3L, "alpha delta delta")))
    val m = Dsir.train(target.select("t"), raw.select("t"))
    // brute-force: recount both sides' bucketed features with the same SQL
    def counts(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.selectExpr(s"explode(${Dsir.featuresExpr("t")}) AS f")
        .selectExpr(s"${Dsir.bucketExpr("f")} AS b")
        .groupBy("b").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (ct, cr) = (counts(target), counts(raw))
    def bl(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (0 until Dsir.Buckets).foreach { b =>
      assert(m.diffBits(b) ==
        bl(ct.getOrElse(b, 0L) + 1) - bl(cr.getOrElse(b, 0L) + 1), s"bucket $b")
    }
    // target feats: alpha, beta, alpha, gamma + 2 bigrams = 6; raw: 5 + 3 = 8
    assert(m.bias == bl(8L + 1) - bl(6L + 1)) // bitlen(9)=4, bitlen(7)=3
  }

  test("score: equals a per-feature join recomputation, bias included") {
    val target = tok(Seq((0L, "alpha beta alpha beta"), (1L, "alpha gamma")))
    val pool = tok(Seq(
      (10L, "alpha beta alpha"), (11L, "delta epsilon zeta"), (12L, "alpha delta")))
    val m = Dsir.train(target.select("t"), pool.select("t"))
    val got = Dsir.score(pool, m, Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recomputation: explode features, look buckets up on the
    // driver against the model arrays
    val lut = m.diffBits.map(_ + m.bias)
    val want = pool
      .selectExpr("doc_id", s"explode(${Dsir.featuresExpr("t")}) AS f")
      .selectExpr("doc_id", s"${Dsir.bucketExpr("f")} AS b")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> (rows.length.toLong, rows.map(r => lut(r.getInt(1)).toLong).sum)
      }
    assert(got == want)
  }

  test("selection signal: a target-vocabulary doc outscores an off-domain doc") {
    // distinctive vocabularies; repeated tokens make the count signal strong
    val target = tok(for (i <- 0L until 20L)
      yield (i, "quark lepton boson quark lepton"))
    val pool = tok(Seq(
      (100L, "quark lepton boson quark"),        // on-distribution
      (101L, "recipe butter flour sugar whisk"))) // off-domain
    val m = Dsir.train(target.select("t"), pool.select("t"))
    val w = Dsir.score(pool, m, Seq("doc_id"))
      .withColumn("wpf", col("w_bits").cast("double") / col("n_feats"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("wpf")).toMap
    assert(w(100L) > w(101L),
      s"on-distribution doc should outweigh off-domain: $w")
  }

  test("docs with no features produce no score row; empty slices fail loudly") {
    val target = tok(Seq((0L, "alpha beta")))
    val pool = tok(Seq((1L, "gamma"))).union(
      Seq((2L, null: String)).toDF("doc_id", "text")
        .selectExpr("doc_id", "split(lower(text), ' ') AS t"))
    val m = Dsir.train(target.select("t"), pool.select("t"))
    val ids = Dsir.score(pool, m, Seq("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L)) // null-text doc vanished, not scored as zero
    val empty = tok(Seq.empty[(Long, String)])
    assertThrows[IllegalArgumentException] {
      Dsir.train(empty.select("t"), pool.select("t"))
    }
    assertThrows[IllegalArgumentException] {
      Dsir.train(target.select("t"), empty.select("t"))
    }
  }

  test("scoring plan: zero joins — the LUT rides the scan") {
    val target = tok(Seq((0L, "alpha beta gamma")))
    val pool = tok(Seq((1L, "alpha delta"), (2L, "beta gamma alpha")))
    val m = Dsir.train(target.select("t"), pool.select("t"))
    val plan = Dsir.score(pool, m, Seq("doc_id"))
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, s"DSIR scoring must not join:\n$plan")
  }
}
