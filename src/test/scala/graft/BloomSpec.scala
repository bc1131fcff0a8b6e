package graft

import org.apache.spark.sql.functions._

import graft.analytics.Registry
import graft.ext.Bloom

/** The Bloom prefilter's contract: never a false negative (that would change
  * query results), bounded false positives (that's only a perf leak — the
  * verify join removes them), and a build that is partitioning-independent
  * (bit-OR is associative+commutative, but a buffer-reuse bug would break it).
  */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def strDf(xs: Seq[String]) = {
    import spark.implicits._
    xs.toDF("v")
  }

  test("params: sane sizing across magnitudes") {
    for (n <- Seq(1L, 100L, 10000L, 10000000L); p <- Seq(0.1, 0.01, 0.001)) {
      val prm = Bloom.params(n, p)
      assert(prm.words >= 1 && prm.k >= 1 && prm.k <= 8, s"n=$n p=$p -> $prm")
      // classic sizing: ~1.44 * log2(1/p) bits per element, give or take rounding
      assert(prm.bits >= n, s"n=$n p=$p: filter can't be smaller than one bit/element")
    }
    assertThrows[IllegalArgumentException](Bloom.params(-1, 0.01))
    assertThrows[IllegalArgumentException](Bloom.params(10, 1.5))
  }

  test("no false negatives: every built member probes true") {
    val members = (0 until 500).map(i => s"member-$i-${i * 31}")
    val df = strDf(members)
    val p = Bloom.params(members.size.toLong, 0.01)
    val bloom = Bloom.build(df, "v", p)
    val hits = df.where(Bloom.mightContain(col("v"), bloom, p.k)).count()
    assert(hits == members.size.toLong, s"dropped ${members.size - hits} true members")
  }

  test("false-positive rate stays near the sized fpp on disjoint probes") {
    val members = (0 until 2000).map(i => s"in-$i")
    val probes = (0 until 4000).map(i => s"out-$i")
    val p = Bloom.params(members.size.toLong, 0.01)
    val bloom = Bloom.build(strDf(members), "v", p)
    val fp = strDf(probes).where(Bloom.mightContain(col("v"), bloom, p.k)).count()
    // 5x headroom over the target: this is a determinism-free sanity bound,
    // not a statistical test (the hash positions are fixed by xxhash64)
    assert(fp.toDouble / probes.size <= 0.05, s"$fp/${probes.size} false positives")
  }

  test("build is partitioning-independent (bit-OR merge, no buffer aliasing)") {
    val members = (0 until 300).map(i => s"part-$i")
    val p = Bloom.params(members.size.toLong, 0.01)
    val one = Bloom.build(strDf(members).repartition(1), "v", p)
    val many = Bloom.build(strDf(members).repartition(7), "v", p)
    assert(java.util.Arrays.equals(one, many), "bloom bits differ across partitionings")
  }

  test("probe-k contract: fewer probes than built is safe, more is NOT") {
    val members = (0 until 400).map(i => s"m-$i")
    val p = Bloom.params(members.size.toLong, 0.01)
    val bloom = Bloom.build(strDf(members), "v", p)
    // fewer probes: strictly more permissive — still zero false negatives
    val fewer = strDf(members)
      .where(Bloom.mightContain(col("v"), bloom, math.max(1, p.k - 1))).count()
    assert(fewer == members.size.toLong, "k-1 probe dropped a true member")
    // one probe MORE than built tests bits the builder never set: with ~half
    // the filter's bits set, members start failing — the false-negative mode
    // the scaladoc warns about (deterministic here: fixed strings, fixed hash)
    val more = strDf(members)
      .where(Bloom.mightContain(col("v"), bloom, p.k + 1)).count()
    assert(more < members.size.toLong,
      "probing beyond the build k should demonstrably lose members on this fixture")
  }

  test("d11 (bloom prefilter + exact verify) == d7 (inverted join), row for row") {
    val d7 = Registry.byName("d7_decontaminate").fn(spark, sf).collect().toSeq
    val d11 = Registry.byName("d11_decontaminate_bloom").fn(spark, sf).collect().toSeq
    assert(d11 == d7, s"bloom path diverged:\nd7 = $d7\nd11 = $d11")
  }
}
