package graft

import org.apache.spark.sql.functions._

import graft.ext.LangModel

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def tok(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text").selectExpr("doc_id", "split(lower(text), ' ') AS t")

  test("train: exact unigram/bigram/context counts and total") {
    val m = LangModel.train(tok(Seq(
      (0L, "the cat sat"),
      (1L, "the cat ran"),
      (2L, "dog"))).select("t"))
    assert(m.totalTokens == 7)
    assert(m.totalBits == 3) // bitlen(7)
    val uni = m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("the" -> 2, "cat" -> 2, "sat" -> 1, "ran" -> 1, "dog" -> 1))
    val big = m.bigrams.collect()
      .map(r => (r.getAs[String]("c1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("cb"), r.getAs[Long]("cc"))).toMap
    // cc carries the CONTEXT's unigram count, pre-joined at train time
    assert(big == Map(
      ("the", "cat") -> (2L, 2L), ("cat", "sat") -> (1L, 2L), ("cat", "ran") -> (1L, 2L)))
    // single-token doc contributes no bigrams (the t19 sequence guard)
  }

  test("scoreDocs: hand-computed surprisal on every branch of the backoff") {
    // train: T=7, bitlen(T)=3; C(the)=2 (2 bits), C(cat)=2, C(sat)=1 (1 bit),
    // C(the,cat)=2, C(cat,sat)=1
    val m = LangModel.train(tok(Seq(
      (0L, "the cat sat"), (1L, "the cat ran"), (2L, "dog"))).select("t"))
    val got = LangModel.scoreDocs(
      tok(Seq(
        (10L, "the cat sat"), // pos1 uni-hit + 2 bigram hits
        (11L, "sat the"),     // pos1 uni-hit + backoff (no bigram sat->the)
        (12L, "zebra"),       // pos1 OOV
        (13L, "the zebra"))), // pos1 uni-hit + OOV after context
      m, Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 10: i=1 'the': 3-2=1; ('the','cat') hit: bitlen(2)-bitlen(2)=0;
    //         ('cat','sat') hit: bitlen(2)-bitlen(1)=1  => 2 bits
    assert(got(10L) == (3L, 2L))
    // doc 11: i=1 'sat': 3-1=2; 'the' backoff: 2+3-2=3 => 5
    assert(got(11L) == (2L, 5L))
    // doc 12: i=1 OOV: 3+8=11
    assert(got(12L) == (1L, 11L))
    // doc 13: i=1 'the': 1; OOV after context: 2+3+8=13 => 14
    assert(got(13L) == (2L, 14L))
  }

  test("surprisal is non-negative and monotone in rarity") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) "common common common word" else "common word tail" + i)
    }
    val m = LangModel.train(tok(docs).select("t"))
    val scored = LangModel.scoreDocs(tok(docs), m, Seq("doc_id"))
    assert(scored.where(col("bits") < 0).count() == 0, "bits must be non-negative")
    // a doc of frequent tokens scores fewer bits/token than an OOV-heavy one
    val frequent = LangModel.scoreDocs(tok(Seq((100L, "common common"))), m, Seq("doc_id"))
      .collect()(0).getLong(2)
    val rare = LangModel.scoreDocs(tok(Seq((101L, "qq zz"))), m, Seq("doc_id"))
      .collect()(0).getLong(2)
    assert(frequent < rare, s"$frequent !< $rare")
  }

  test("empty training slice fails loudly") {
    val e = intercept[IllegalArgumentException] {
      LangModel.train(tok(Seq.empty[(Long, String)]).select("t"))
    }
    assert(e.getMessage.contains("empty training slice"))
  }

  test("scoring plan: no window, count-table joins are shuffle-side (no data broadcast)") {
    val docs = tok((0L until 50L).map(i => (i, s"w${i % 7} w${i % 11} w${i % 5}")))
    val m = LangModel.train(docs.select("t"))
    val scored = LangModel.scoreDocs(docs, m, Seq("doc_id"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window in LM scoring:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no product joins:\n${plan.take(2000)}")
  }
}
