package graft

import org.apache.spark.sql.functions._

import graft.ext.MinHash
import graft.functions.GraftFunctions

/** The shingle3 + minhash8 native expressions must be BIT-IDENTICAL to the
  * lambda chains they replaced (3-gram transform/array_distinct; two md5
  * digests, four 8-hex slices each, lexicographic min) — the d2/d4/d6 DuckDB
  * oracles mirror those chains, so any divergence here is an oracle break.
  */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  /** The ORIGINAL shingle lambda chain, kept verbatim as the reference
    * implementation for the equivalence pin (MinHash.shingleExpr now routes
    * through the native shingle3).
    */
  private val lambdaShingleExpr =
    """CASE WHEN size(t) < 3 THEN array(concat_ws(' ', t))
      |ELSE array_distinct(transform(
      |  sequence(1, size(t) - 2),
      |  i -> concat(element_at(t, i), ' ',
      |              element_at(t, i + 1), ' ',
      |              element_at(t, i + 2)))) END""".stripMargin

  /** The original 10-lambda signature pipeline — reference for minhash8. */
  private def lambdaChainSignatures(df: org.apache.spark.sql.DataFrame) = {
    val perms = 0 until 8
    df.selectExpr("doc_id", MinHash.splitExpr)
      .selectExpr("doc_id", s"($lambdaShingleExpr) AS sh")
      .selectExpr(Seq("doc_id", "sh",
        "transform(sh, t -> md5(t)) AS ha",
        "transform(sh, t -> md5(concat('x', t))) AS hb"): _*)
      .selectExpr(
        Seq("doc_id", "sh") ++
          perms.map { i =>
            val src = if (i < 4) "ha" else "hb"
            val off = (i % 4) * 8 + 1
            s"array_min(transform($src, h -> substring(h, $off, 8))) AS h$i"
          }: _*)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "short"),            // < 3 tokens -> whole-text shingle
    (4L, "two tokens"),       // < 3 tokens
    (5L, ""),                 // empty text -> [""] shingle
    (6L, "a b c"),            // exactly one 3-gram
    (7L, "x y z x y z x y z") // repeated grams -> array_distinct path
  ).toDF("doc_id", "text")

  test("minhash8 output is bit-identical to the transform/array_min lambda chain") {
    val fast = MinHash.signatures(docs, Seq("doc_id")).orderBy("doc_id").collect()
    val slow = lambdaChainSignatures(docs).orderBy("doc_id").collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (f, sl) =>
      (0 until 8).foreach { i =>
        assert(f.getAs[String](s"h$i") == sl.getAs[String](s"h$i"),
          s"doc ${f.getLong(0)} h$i: ${f.getAs[String](s"h$i")} vs ${sl.getAs[String](s"h$i")}")
      }
    }
  }

  test("minhash8 equivalence holds on randomized corpora (property sweep)") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val fast = MinHash.signatures(df, Seq("doc_id")).orderBy("doc_id").collect()
    val slow = lambdaChainSignatures(df).orderBy("doc_id").collect()
    fast.zip(slow).foreach { case (f, sl) =>
      (0 until 8).foreach(i => assert(f.getAs[String](s"h$i") == sl.getAs[String](s"h$i")))
    }
  }

  test("shingle3 output is bit-identical to the transform/array_distinct chain (incl. order)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val rows = (0 until 120).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((900L, ""), (901L, "one"), (902L, "one two"), (903L, "a b c"),
      (904L, "x y z x y z x y z"), (905L, null: String))
    val df = rows.toDF("doc_id", "text").selectExpr("doc_id", MinHash.splitExpr)
    val fast = df.selectExpr("doc_id", s"(${MinHash.shingleExpr}) AS sh")
      .orderBy("doc_id").collect()
    val slow = df.selectExpr("doc_id", s"($lambdaShingleExpr) AS sh")
      .orderBy("doc_id").collect()
    fast.zip(slow).foreach { case (f, sl) =>
      assert(f.getSeq[String](1) == sl.getSeq[String](1),
        s"doc ${f.getLong(0)}: ${f.getSeq[String](1)} vs ${sl.getSeq[String](1)}")
    }
  }

  test("shinglen output is bit-identical to the transform/slice chain (d7 13-gram semantics)") {
    GraftFunctions.register(spark)
    val lambdaG = (w: Int) =>
      s"""CASE WHEN size(t) < $w THEN CAST(array() AS array<string>)
         |ELSE array_distinct(transform(
         |  sequence(1, size(t) - ${w - 1}),
         |  i -> concat_ws(' ', slice(t, i, $w)))) END""".stripMargin
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val rows = (0 until 100).map { i =>
      val n = rnd.nextInt(20)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((900L, ""), (901L, "exactly four tokens here"), (902L, null: String))
    val df = rows.toDF("doc_id", "text").selectExpr("doc_id", MinHash.splitExpr)
    for (w <- Seq(4, 13)) {
      val fast = df.selectExpr("doc_id", s"shinglen(t, $w) AS g").orderBy("doc_id").collect()
      val slow = df.selectExpr("doc_id", s"(${lambdaG(w)}) AS g").orderBy("doc_id").collect()
      fast.zip(slow).foreach { case (f, sl) =>
        val (fg, sg) = (
          if (f.isNullAt(1)) null else f.getSeq[String](1),
          if (sl.isNullAt(1)) null else sl.getSeq[String](1))
        assert(fg == sg, s"w=$w doc ${f.getLong(0)}: $fg vs $sg")
      }
    }
  }

  test("simhash32 is bit-identical to the 32-SUM bit-majority aggregation chain") {
    GraftFunctions.register(spark)
    // the original aggregation shape, verbatim (hex-lookup bit extraction)
    val hexToBits =
      "0000000100100011010001010110011110001001101010111100110111101111"
    def bitTerm(j: Int): String = {
      val hexPos = j / 4 + 1
      val bitOff = j % 4
      s"(CASE WHEN substring('$hexToBits', (instr('0123456789abcdef', substring(md5(tok), $hexPos, 1)) - 1) * 4 + $bitOff + 1, 1) = '1' THEN 1 ELSE -1 END)"
    }
    val assemble = "concat(" +
      (0 until 32).map(j => s"(CASE WHEN s$j >= 0 THEN '1' ELSE '0' END)").mkString(", ") +
      ") AS simhash"
    val rnd = new scala.util.Random(31)
    val vocab = Vector("red", "green", "blue", "cyan", "violet", "umber")
    val rows = (0 until 150).map { i =>
      val n = 1 + rnd.nextInt(15)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (900L, "")
    val df = rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "array_distinct(split(lower(text), ' ')) AS toks")
    val fast = df.selectExpr("doc_id", "simhash32(toks) AS simhash")
      .orderBy("doc_id").collect()
    val slow = df.selectExpr("doc_id", "explode(toks) AS tok")
      .groupBy("doc_id")
      .agg(expr(s"SUM(${bitTerm(0)}) AS s0"),
        (1 until 32).map(j => expr(s"SUM(${bitTerm(j)}) AS s$j")): _*)
      .selectExpr("doc_id", assemble)
      .orderBy("doc_id").collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (f, sl) =>
      assert(f.getString(1) == sl.getString(1),
        s"doc ${f.getLong(0)}: ${f.getString(1)} vs ${sl.getString(1)}")
    }
  }

  test("minhash8 null/empty edges: null array -> null, empty array -> 8 null elements") {
    GraftFunctions.register(spark)
    val out = Seq(
      (1L, Seq("a b c")),
      (2L, Seq.empty[String]),
      (3L, null: Seq[String])
    ).toDF("doc_id", "sh")
      .selectExpr("doc_id", "minhash8(sh) AS mh")
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1).forall(_ != null))
    assert(out(1).getSeq[String](1) == Seq(null, null, null, null, null, null, null, null))
    assert(out(2).isNullAt(1))
  }

  test("bands over minhash8 signatures produce the documented 4x2 band keys") {
    val sigs = MinHash.signatures(docs.where(col("doc_id") === 1), Seq("doc_id"))
    val bands = MinHash.bands(sigs).collect()
    assert(bands.length == 4)
    assert(bands.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(bands.forall(_.getString(2).length == 32), "band key is an md5 hex")
  }
}
