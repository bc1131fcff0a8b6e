package graft

import org.apache.spark.sql.functions._

import graft.ext.TextPipeline

/** PII redaction semantics on planted PII (the registry query t9 pins the
  * cross-engine regex dialect; the corpus itself is PII-free word soup, so
  * the actual redaction behavior is pinned here).
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("text").select(TextPipeline.redact(col("text"))).collect()(0).getString(0)

  test("emails, IPv4s, phones and long digit IDs redact to typed placeholders") {
    assert(redactOne("mail bob.smith+x@ex-ample.org now") == "mail <EMAIL> now")
    assert(redactOne("from 192.168.001.12 port") == "from <IP> port")
    assert(redactOne("call 312-555-1234 or 312.555.1234") == "call <PHONE> or <PHONE>")
    assert(redactOne("ssn-ish 123456789 and card 4111111111111111") ==
      "ssn-ish <ID> and card <ID>")
  }

  test("pattern order: an email's digits never leak as a partial ID hit") {
    assert(redactOne("reach a123456789@host.com today") == "reach <EMAIL> today")
  }

  test("short digit runs and plain text pass through untouched") {
    val clean = "meet at 5 on floor 12 room 304"
    assert(redactOne(clean) == clean)
  }

  test("hit flags align with what redact rewrites") {
    val df = Seq(
      ("a@b.co plus 10.0.0.1", 1, 1, 0, 0),
      ("only text here", 0, 0, 0, 0),
      ("555-555-5555 and 987654321", 0, 0, 1, 1))
      .toDF("text", "e", "i", "p", "d")
    val got = df.select(
      TextPipeline.hit(col("text"), 0).as("e2"),
      TextPipeline.hit(col("text"), 1).as("i2"),
      TextPipeline.hit(col("text"), 2).as("p2"),
      TextPipeline.hit(col("text"), 3).as("d2"),
      col("e"), col("i"), col("p"), col("d")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(4) && r.getInt(1) == r.getInt(5) &&
        r.getInt(2) == r.getInt(6) && r.getInt(3) == r.getInt(7), r.toString)
    }
  }

  test("inverted index: lookup prunes to one bucket directory and matches a full scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString + "/idx"
    val docs = graft.analytics.Tables.documents(spark, "/root/testdata/sf0.001")
    TextPipeline.writeInvertedIndex(docs, dir, buckets = 8)

    // pick a real term from the corpus
    val term = docs.selectExpr("explode(split(lower(text), ' ')) AS t")
      .groupBy("t").count().orderBy(org.apache.spark.sql.functions.desc("count"), col("t"))
      .head.getString(0)
    val lookup = TextPipeline.lookupTerm(spark, dir, term, buckets = 8)
    val got = lookup.collect().map(r => (r.getLong(1), r.getLong(2))).sorted

    // parity: the pruned read returns exactly the full-scan postings
    val want = spark.read.parquet(dir).where(col("term") === term)
      .select("doc_id", "tf").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want) && got.nonEmpty, s"pruned lookup diverged for '$term'")

    // the plan must prune to exactly one bucket partition
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec    => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    lookup.collect()
    val scan = scans(lookup.queryExecution.executedPlan).head
    val parts = scan.metadata.get("PartitionFilters")
    assert(parts.exists(_.contains("bucket")), s"bucket predicate must be a partition filter: $parts")
    assert(scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).size == 1,
      "lookup must read exactly one bucket directory")
  }
}
