package graft

import org.apache.spark.sql.functions._

import graft.tools.ReplicaGen

/** The scaling-probe replica builder's invariants: replicas must be
  * content-DISJOINT (or the probe re-measures duplicate families, not
  * scale) while preserving the intra-replica structure that drives cost.
  */
class ReplicaGenSpec extends SparkSpec {
  import spark.implicits._

  test("document replicas: disjoint token space, preserved counts/lang skew, unique ids") {
    val docs = Seq(
      (0L, "the cat sat", "en", "web", 11L),
      (1L, "the cat sat", "en", "web", 11L), // exact dup pair — must replicate
      (2L, "der hund", "de", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = ReplicaGen.replicateDocs(docs, 3).cache()
    assert(rep.count() == 9)
    assert(rep.select("doc_id").distinct().count() == 9, "ids must stay unique")
    // lang skew preserved exactly: 2 en + 1 de per replica
    val byLang = rep.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 6, "de" -> 3))
    // token counts per doc preserved (suffix never splits or merges tokens)
    val ntok = rep.selectExpr("size(split(text, ' ')) AS n").collect().map(_.getInt(0))
    assert(ntok.count(_ == 3) == 6 && ntok.count(_ == 2) == 3)
    // replicas are token-disjoint: no token appears in two replicas
    val byReplica = rep.selectExpr("CAST(doc_id DIV 10000000 AS INT) AS r",
      "explode(split(text, ' ')) AS w")
      .distinct().collect().groupBy(_.getInt(0))
      .map { case (r, rows) => r -> rows.map(_.getString(1)).toSet }
    for (a <- byReplica.keys; b <- byReplica.keys if a < b)
      assert(byReplica(a).intersect(byReplica(b)).isEmpty,
        s"replicas $a and $b share tokens — shingle space must be disjoint")
    // intra-replica exact-dup structure preserved: each replica keeps 1 dup pair
    val fams = rep.groupBy(md5(col("text"))).count().where(col("count") > 1).collect()
    assert(fams.length == 3 && fams.forall(_.getLong(1) == 2),
      "one 2-doc exact-dup family per replica")
  }

  test("embedding replica factor is capped at 5 (flips must stay one-per-band and distinct)") {
    val emb = Seq((0L, Array.fill(16)(0.5f).toSeq, 1)).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      ReplicaGen.replicateEmbeddings(emb, 6)
    }
    assert(e.getMessage.contains("[1, 5]"),
      "factor 6 would silently share band keys across replicas — must refuse")
  }

  test("embedding replicas: orthogonal flips preserve norms; band signatures de-collide") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Seq(
      (0L, Array.tabulate(16)(i => 0.5f + 0.01f * i).toSeq, 1),
      (1L, Array.tabulate(16)(i => -0.3f - 0.01f * i).toSeq, 2))
      .toDF("vec_id", "embedding", "label")
    val rep = ReplicaGen.replicateEmbeddings(emb, 4).cache()
    assert(rep.count() == 8)
    assert(rep.select("vec_id").distinct().count() == 8)
    // norms exactly preserved (sign flips are orthogonal)
    val norms = rep
      .selectExpr("vec_id % 10000000 AS base",
        "array_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS n2")
      .collect().groupBy(_.getLong(0)).map { case (b, rows) => b -> rows.map(_.getDouble(1)).toSet }
    norms.foreach { case (b, set) =>
      assert(set.size == 1, s"vector $b: replica norms must be bit-identical, got $set")
    }
    // every replica's sign signature differs from every other's in EVERY band
    val sigs = graft.ext.Similarity
      .signBands(graft.ext.Similarity.prepare(rep, "vec_id", "embedding"), bits = 16, bands = 4)
      .selectExpr("id % 10000000 AS base", "CAST(id DIV 10000000 AS INT) AS r", "band", "bkey")
      .collect().groupBy(r => (r.getLong(0), r.getInt(2)))
    sigs.foreach { case ((base, band), rows) =>
      val keys = rows.map(_.getString(3))
      assert(keys.distinct.length == keys.length,
        s"vector $base band $band: replica band keys must be pairwise distinct")
    }
  }

  test("replicateEvents: disjoint keys and time, per-user structure preserved exactly") {
    import org.apache.spark.sql.functions._
    val ev = graft.analytics.Tables.events(spark, "/root/testdata/sf0.001")
    val rep = graft.tools.ReplicaGen.replicateEvents(ev, 3)
    assert(rep.count() == ev.count() * 3)
    // key spaces disjoint
    assert(rep.select("event_id").distinct().count() == rep.count())
    assert(rep.select("user_id").distinct().count() ==
      ev.select("user_id").distinct().count() * 3)
    // time-disjoint: replica spans must not overlap (>= 1 day apart)
    val b = ev.agg(max("user_id")).head.getLong(0) + 1
    val byRep = rep.withColumn("rep", (col("user_id") / b).cast("int"))
      .groupBy("rep").agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("rep").collect()
      .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
    byRep.sliding(2).foreach { case Array((_, hi0), (lo1, _)) =>
      assert(lo1 - hi0 >= 86400000L - 1, s"replica streams must be time-disjoint: $hi0 vs $lo1")
    case _ => ()
    }
    // per-user event-count multiset identical per replica (structure intact)
    val perUser = rep.withColumn("rep", (col("user_id") / b).cast("int"))
      .groupBy("rep", "user_id").agg(count(lit(1)).as("n"))
      .groupBy("rep").agg(sort_array(collect_list("n")).as("profile"))
      .collect().map(_.getSeq[Long](1))
    assert(perUser.forall(_ == perUser.head),
      "every replica must carry the identical per-user activity profile")
  }

  test("replicateEvents: factor 1 is identity; empty input fails loudly, not with an NPE") {
    import org.apache.spark.sql.functions._
    val ev = graft.analytics.Tables.events(spark, "/root/testdata/sf0.001")
    // factor 1 returns the input unchanged without running the span aggregate
    assert(graft.tools.ReplicaGen.replicateEvents(ev, 1).count() == ev.count())
    val empty = ev.where(lit(false))
    val e = intercept[IllegalArgumentException] {
      graft.tools.ReplicaGen.replicateEvents(empty, 2)
    }
    assert(e.getMessage.contains("empty"), s"message must name the cause: ${e.getMessage}")
  }
}
