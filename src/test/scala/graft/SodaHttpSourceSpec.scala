package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.JavaConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

/** S2: the SODA-style HTTP source (paging, retry/backoff, $select/$where
  * pushdown) against an in-JVM HTTP server — no network egress.
  */
class SodaHttpSourceSpec extends SparkSpec {

  /** 25-row synthetic crashes resource, SODA paging semantics. The server
    * applies $limit/$offset/$select and records every request's params;
    * $where is recorded but NOT applied (the source must stay correct via
    * residual filters when a server ignores the hint). Offsets listed in
    * `failFirst` return one 500 before succeeding — exercises retry.
    */
  private class FakeSoda(failFirst: Set[Long], honorCount: Boolean = true) {
    val rows: Seq[Map[String, String]] = (0 until 25).map { i =>
      Map(
        "crash_record_id" -> s"c$i",
        "crash_date" -> f"2024-01-${i % 9 + 1}%02dT10:00:00",
        "crash_type" -> (if (i % 2 == 0) "NO INJURY / DRIVE AWAY" else "INJURY"),
        "posted_speed_limit" -> (20 + i % 4 * 10).toString)
    }
    val requests = new ConcurrentHashMap[String, AtomicInteger]()
    val seenParams = java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[String, java.lang.Boolean]())
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    server.createContext("/resource.json", (ex: HttpExchange) => {
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
        .filter(_.nonEmpty)
        .map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      params.foreach { case (k, v) => seenParams.add(s"$k=$v") }
      val offset = params.getOrElse("$offset", "0").toLong
      val hits = requests.computeIfAbsent(offset.toString, _ => new AtomicInteger).incrementAndGet()
      if (failFirst.contains(offset) && hits == 1) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        val limit = params.getOrElse("$limit", "1000").toInt
        val cols = params.get("$select").map(_.split(",\\s*").toSeq)
        val body =
          if (params.get("$select").exists(_.startsWith("count")) && honorCount) {
            s"""[{"count":"${rows.length}"}]"""
          } else {
            rows.slice(offset.toInt, offset.toInt + limit)
              .map { r =>
                val kept = cols.fold(r)(cs => r.filter(kv => cs.contains(kv._1)))
                kept.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
              }
              .mkString("[", ",", "]")
          }
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/resource.json"
    def stop(): Unit = server.stop(0)
  }

  private def reader(s: FakeSoda) = spark.read
    .format("graft.sources.SodaHttpSource")
    .option("url", s.url)
    .option("pageSize", 10)
    .option("backoffMs", 1)

  test("parallel paged read: pages option -> one partition per page, all rows") {
    val s = new FakeSoda(Set.empty)
    try {
      val df = reader(s).option("pages", 3).load()
      assert(df.rdd.getNumPartitions == 3, "each page is an input partition")
      val got = df.select("crash_record_id").collect().map(_.getString(0)).toSet
      assert(got == (0 until 25).map(i => s"c$i").toSet)
    } finally s.stop()
  }

  test("probeCount plans pages from one count(1) request (reference page-count probe)") {
    val s = new FakeSoda(Set.empty)
    try {
      val df = reader(s).option("probeCount", "true").load()
      assert(df.count() == 25)
      assert(df.rdd.getNumPartitions == 3, "ceil(25/10) pages")
    } finally s.stop()
  }

  test("sequential mode pages until a short page (reference termination rule)") {
    val s = new FakeSoda(Set.empty)
    try {
      val df = reader(s).load() // no pages, no probe -> one sequential pager
      assert(df.rdd.getNumPartitions == 1)
      // collect, not count: a bare count() is aggregate-pushed and never pages
      assert(df.collect().length == 25)
      // pages 0,10,20 fetched; short page (5 rows) terminates
      assert(s.requests.keySet().size() == 3)
    } finally s.stop()
  }

  test("global COUNT(*) pushes down to ONE count(1) request — no paging at all") {
    val s = new FakeSoda(Set.empty)
    try {
      val df = reader(s).load()
      assert(df.count() == 25)
      assert(s.seenParams.contains("$select=count(1)"), "server-side count idiom used")
      assert(!s.seenParams.asScala.exists(_.startsWith("$limit=")),
        s"count must not fetch any page: ${s.seenParams.asScala.mkString(", ")}")
      assert(s.requests.values().asScala.map(_.get()).sum == 1,
        "exactly one HTTP request answers df.count()")
      val plan = df.groupBy().count().queryExecution.executedPlan.toString
      assert(!plan.contains("HashAggregate") || plan.contains("SodaHttpCountScan"),
        s"pushed scan expected in plan:\n$plan")
    } finally s.stop()
  }

  test("a page-bounded scan refuses the count pushdown so count() == collect().length") {
    // with pages=2 the scan is bounded at 20 of the server's 25 rows; a
    // pushed count(1) would answer 25 and disagree with the scan itself
    val s = new FakeSoda(Set.empty)
    try {
      val df = reader(s).option("pages", 2).load()
      assert(df.count() == 20, "count must honor the page bound")
      assert(df.collect().length == 20)
      assert(!s.seenParams.contains("$select=count(1)"),
        "a bounded scan must never push the unbounded server count")
    } finally s.stop()
  }

  test("a server that ignores $select=count(1) fails the pushed count loudly, never returns 0") {
    // This is the one path where the server's answer IS the result, so a
    // non-conforming response must throw, not silently undercount.
    val s = new FakeSoda(Set.empty, honorCount = false)
    try {
      val e = intercept[org.apache.spark.SparkException] {
        reader(s).option("maxRetries", 0).load().count()
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
      assert(chain(e).exists(m => m != null && m.contains("did not honor")),
        s"expected the strict-parse error, got: ${chain(e).mkString(" | ")}")
    } finally s.stop()
  }

  test("filtered count still pages with residual filters (aggregate push refused)") {
    val s = new FakeSoda(Set.empty)
    try {
      // $where is recorded but IGNORED by the fake server, so a correct
      // result here proves the residual filter did the work client-side —
      // which requires real rows, not a pushed count.
      val n = reader(s).load().where(col("crash_type") === "INJURY").count()
      assert(n == 12, "odd i of 0..24")
      assert(s.seenParams.asScala.exists(_.startsWith("$limit=")), "filtered count must page")
    } finally s.stop()
  }

  test("transient 500s retry with backoff and the read still succeeds (S2 retry loop)") {
    val s = new FakeSoda(failFirst = Set(0L, 20L))
    try {
      // collect, not count: a bare count() is aggregate-pushed and never pages
      val got = reader(s).option("pages", 3).load().collect().length
      assert(got == 25)
      assert(s.requests.get("0").get() >= 2, "offset 0 was retried after its 500")
      assert(s.requests.get("20").get() >= 2, "offset 20 was retried after its 500")
    } finally s.stop()
  }

  test("$select and $where pushdown reach the server; residuals keep results exact") {
    val s = new FakeSoda(Set.empty)
    try {
      val df = reader(s).option("pages", 3).load()
        .where(col("crash_type") === "INJURY")
        .select("crash_record_id", "posted_speed_limit")
      val rows = df.collect()
      // server ignores $where -> the residual filter must still apply exactly
      assert(rows.length == 12, "odd-indexed rows 1..23")
      val seen = s.seenParams.asScala.toSet
      assert(seen.exists(p => p.startsWith("$select=") && p.contains("crash_record_id")),
        s"pruned column list pushed, saw: ${seen.filter(_.startsWith("$select")).mkString("; ")}")
      assert(seen.contains("$where=crash_type = 'INJURY'"),
        s"predicate pushed as SoQL, saw: ${seen.filter(_.startsWith("$where")).mkString("; ")}")
    } finally s.stop()
  }

  test("non-retryable 4xx fails fast instead of burning the retry budget") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger
    server.createContext("/gone.json", (ex: HttpExchange) => {
      hits.incrementAndGet()
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    try {
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft.sources.SodaHttpSource")
          .option("url", s"http://127.0.0.1:${server.getAddress.getPort}/gone.json")
          .option("pages", 1).option("backoffMs", 1)
          .load().count()
      }
      assert(e.getMessage.contains("404") ||
        Option(e.getCause).exists(_.getMessage.contains("404")))
      assert(hits.get() == 1, s"404 must not be retried, saw ${hits.get()} requests")
    } finally server.stop(0)
  }

  test("quote escaping in pushed predicates (F14: embedded quotes double)") {
    import graft.sources.SodaScanBuilder
    import org.apache.spark.sql.sources.{EqualTo, In}
    assert(SodaScanBuilder.render(EqualTo("a", "O'HARE")).contains("a = 'O''HARE'"))
    assert(SodaScanBuilder.render(In("a", Array("x", "y'z")))
      .contains("a in ('x', 'y''z')"))
  }

}
