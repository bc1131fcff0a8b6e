package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** BPE trainer/encoder: frequency-ranked merges, determinism across
  * partition layouts, greedy-apply semantics, distributed encode parity.
  * (The registered `t14_bpe_encode` gates the DISTRIBUTED apply bitwise
  * against DuckDB with a constant merge table; training is pinned here —
  * merge learning is not SQL-expressible.)
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "low low low low low"),
    (1L, "lower lower newest newest"),
    (2L, "newest newest newest newest"),
    (3L, "widest widest")
  ).toDF("id", "text")

  test("most frequent pair merges first; merges chain into full subwords") {
    val m = Bpe.train(corpus, "text", numMerges = 8)
    // 'newest' x6 and 'low' x7 dominate: the first merges must come from
    // their char bigrams, ranked by weighted frequency
    val first = m.merges.head
    assert(Set(("l", "o"), ("e", "s"), ("s", "t"), ("n", "e"), ("w", "e"), ("e", "w"))
      .contains(first), s"unexpected first merge: $first")
    val toks = Bpe.encodeWord("newest", m)
    assert(toks.length < 6, s"merges must compress 'newest': ${toks.toSeq}")
    assert(toks.mkString("") == "newest", "tokens must concatenate back to the word")
  }

  test("training is deterministic and layout-independent") {
    val m1 = Bpe.train(corpus, "text", numMerges = 6)
    val m2 = Bpe.train(corpus.repartition(7), "text", numMerges = 6)
    val m3 = Bpe.train(corpus.coalesce(1), "text", numMerges = 6)
    assert(m1.merges == m2.merges && m1.merges == m3.merges,
      "merge ranks must not depend on partition layout")
  }

  test("maxVocab cut keeps the most frequent word types, layout-independently") {
    val m1 = Bpe.train(corpus, "text", numMerges = 4, maxVocab = 3)
    val m2 = Bpe.train(corpus.repartition(5), "text", numMerges = 4, maxVocab = 3)
    assert(m1.merges == m2.merges, "bounded vocab cut must be layout-independent")
    // vocab cut keeps newest(6), low(5), lower(2) — dropping widest(2) by
    // the lexicographic tie — so the dominant pair is (w,e) at weight 8
    // (6 from newest + 2 from lower), ahead of (l,o)/(o,w) at 7
    assert(m1.merges.head == (("w", "e")),
      s"cut must keep the frequency mass that ranks merges: ${m1.merges}")
  }

  test("encode distributes and matches per-word greedy application exactly") {
    val m = Bpe.train(corpus, "text", numMerges = 6)
    val out = Bpe.encode(corpus, "id", "text", m).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = corpus.collect().map { r =>
      r.getLong(0) -> r.getString(1).toLowerCase.split(' ').filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWord(w, m)).toSeq
    }.toMap
    assert(out == expected, "distributed encode must equal driver-side greedy apply")
  }

  test("t14 oracle guard: replace-chain == greedy-array over every fixture word at every SF") {
    // The t14 DuckDB oracle applies each merge as replace(space-joined,
    // 'a b', 'ab') — equivalent to greedy array merging ONLY while no merge
    // pattern matches across a token boundary in the corpus vocabulary
    // (e.g. with merge (a,r): 's t a r' would collapse where array-greedy
    // keeps 'ta','r' apart if (t,a) merged first into a token ending in
    // 'a'). Re-verify the equivalence over the ACTUAL distinct words of all
    // three gated fixtures, so a fixture regeneration that opens the
    // vocabulary fails HERE instead of silently turning the oracle into a
    // different algorithm.
    val m = graft.analytics.ExtensionQueries.t14BpeModel
    def chain(w: String): Seq[String] = {
      var s = w.toCharArray.map(_.toString).mkString(" ")
      m.merges.foreach { case (a, b) => s = s.replace(s"$a $b", s"$a$b") }
      s.split(' ').toSeq
    }
    val words = Seq("sf0.001", "sf0.01", "sf0.1").flatMap { sf =>
      spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .selectExpr("explode(split(lower(text), ' ')) AS w")
        .where(length(col("w")) > 0)
        .distinct().collect().map(_.getString(0))
    }.distinct
    assert(words.nonEmpty)
    val diverged = words.filter(w => chain(w) != Bpe.encodeWord(w, m).toSeq)
    assert(diverged.isEmpty,
      s"replace-chain oracle no longer equals greedy BPE for fixture words: " +
        s"${diverged.take(5)} (of ${diverged.size}) — the t14 oracle SQL is now a " +
        "DIFFERENT algorithm; fix the oracle or the merge table")
  }

  test("null text skipped; empty text yields an empty token row; runs merge non-overlapping") {
    val df = Seq((0L, "aaaa"), (1L, null: String), (2L, "   ")).toDF("id", "text")
    val m = Bpe.Model(Seq(("a", "a")))
    val rows = Bpe.encode(df, "id", "text", m).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows.keySet == Set(0L, 2L), "null text skipped, blank text kept")
    // leftmost non-overlapping: a a a a -> aa aa (never aaa a)
    assert(rows(0L) == Seq("aa", "aa"), s"run merge semantics: ${rows(0L)}")
    assert(rows(2L).isEmpty, "whitespace-only text has zero tokens")
  }
}
