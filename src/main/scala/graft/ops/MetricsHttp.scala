package graft.ops

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession

/** Live operational metrics endpoint — the reference exports Prometheus
  * counters and duration histograms from every pipeline stage and scrapes
  * them on a 5 s interval (extractor/main.go:69-87,
  * transformer/transformer.py:65-82, cleaner/cleaner.py:63-81,
  * monitoring/prometheus.yml:2); this serves the engine's equivalent signal
  * LIVE over HTTP in the Prometheus text exposition format (0.0.4), so a
  * user watching a long job points a scraper (or curl) at `/metrics`
  * instead of waiting for the end-of-run bench artifact.
  *
  * What is exported:
  *  - the [[QueryMetricsListener]] task-level counters (tasks, executor /
  *    CPU / GC time, shuffle read+write, spill, input bytes, peak execution
  *    memory) — monotonic totals since [[start]], the Spark-native analog
  *    of the reference's per-stage byte/latency counters;
  *  - a query-duration HISTOGRAM (`graft_query_duration_seconds`) fed by
  *    [[Server.timeQuery]]/[[Server.observeQuery]] — the reference's
  *    job-duration envelope (0.005–120 s buckets across its three
  *    services) collapsed to one bucket ladder covering interactive scans
  *    through multi-minute corpus sweeps.
  *
  * Scale/ops posture: the handler renders from lock-free LongAdders — a
  * scrape never blocks the driver's scheduling path and costs O(metrics)
  * string building; the server binds loopback by default (metrics often
  * leak table names — exposing them beyond the host is a deliberate,
  * caller-owned choice via `host`); everything rides the JDK's built-in
  * HttpServer, zero new dependencies. Driver-side counters only, by
  * design: executor-level detail already flows INTO the listener as task
  * metrics, which is exactly the aggregation a fleet scraper wants (one
  * scrape per driver, not per executor).
  */
object MetricsHttp {

  /** Upper bounds (seconds) of the query-duration histogram buckets —
    * reference envelope 0.005–10 s (extractor) .. 0.1–120 s (transformer,
    * cleaner) merged into one ladder; +Inf is implicit.
    */
  private[ops] val QueryBuckets: Array[Double] =
    Array(0.01, 0.05, 0.1, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0, 120.0)

  final class Server private[MetricsHttp] (
      http: com.sun.net.httpserver.HttpServer,
      spark: SparkSession,
      listener: QueryMetricsListener) {

    private val bucketHits = Array.fill(QueryBuckets.length + 1)(new LongAdder)
    private val querySumMs = new LongAdder
    private val startedAtMs = System.currentTimeMillis()

    /** The bound port (useful with `port = 0` ephemeral binds in tests). */
    def port: Int = http.getAddress.getPort

    /** Record one finished query's wall duration into the histogram. */
    def observeQuery(seconds: Double): Unit = {
      var i = 0
      while (i < QueryBuckets.length && seconds > QueryBuckets(i)) i += 1
      bucketHits(i).increment()
      querySumMs.add(math.round(seconds * 1000.0))
    }

    /** Time `body` and record it; returns `body`'s result (exceptions are
      * recorded too — a failing query's latency is still a latency).
      */
    def timeQuery[T](body: => T): T = {
      val t0 = System.nanoTime()
      try body finally observeQuery((System.nanoTime() - t0) / 1e9)
    }

    private[ops] def render(): String = {
      val s = listener.snapshot()
      val sb = new StringBuilder(2048)
      def metric(name: String, kind: String, help: String, v: Double): Unit = {
        sb.append("# HELP ").append(name).append(' ').append(help).append('\n')
        sb.append("# TYPE ").append(name).append(' ').append(kind).append('\n')
        sb.append(name).append(' ')
        if (v == v.floor && !v.isInfinite) sb.append(v.toLong) else sb.append(v)
        sb.append('\n')
      }
      metric("graft_tasks_total", "counter", "Completed Spark tasks", s.tasks.toDouble)
      metric("graft_task_time_seconds_total", "counter",
        "Executor run time across tasks", s.taskTimeMs / 1000.0)
      metric("graft_cpu_seconds_total", "counter",
        "Executor CPU time across tasks", s.cpuTimeMs / 1000.0)
      metric("graft_gc_seconds_total", "counter",
        "JVM GC time across tasks", s.gcTimeMs / 1000.0)
      metric("graft_shuffle_read_bytes_total", "counter",
        "Shuffle bytes read", s.shuffleReadBytes.toDouble)
      metric("graft_shuffle_write_bytes_total", "counter",
        "Shuffle bytes written", s.shuffleWriteBytes.toDouble)
      metric("graft_spill_bytes_total", "counter",
        "Memory+disk spill bytes", s.spillBytes.toDouble)
      metric("graft_input_bytes_total", "counter",
        "Source bytes read", s.inputBytes.toDouble)
      metric("graft_peak_execution_memory_bytes", "gauge",
        "Peak per-task execution memory high-water mark", s.peakExecutionMemory.toDouble)
      metric("graft_uptime_seconds", "gauge", "Seconds since metrics start",
        (System.currentTimeMillis() - startedAtMs) / 1000.0)
      // histogram: cumulative le-buckets + _sum + _count
      val name = "graft_query_duration_seconds"
      sb.append("# HELP ").append(name).append(" Wall duration of timed queries\n")
      sb.append("# TYPE ").append(name).append(" histogram\n")
      var cum = 0L
      var i = 0
      while (i < QueryBuckets.length) {
        cum += bucketHits(i).sum()
        sb.append(name).append("_bucket{le=\"").append(QueryBuckets(i))
          .append("\"} ").append(cum).append('\n')
        i += 1
      }
      cum += bucketHits(QueryBuckets.length).sum()
      sb.append(name).append("_bucket{le=\"+Inf\"} ").append(cum).append('\n')
      sb.append(name).append("_sum ").append(querySumMs.sum() / 1000.0).append('\n')
      sb.append(name).append("_count ").append(cum).append('\n')
      sb.toString
    }

    private[MetricsHttp] var pool: java.util.concurrent.ExecutorService = _

    def stop(): Unit = {
      http.stop(0)
      if (pool != null) pool.shutdown()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  /** Start serving `/metrics`. `port = 0` binds an ephemeral port (read it
    * back from [[Server.port]]); default host is loopback — widening the
    * bind is the caller's explicit call.
    */
  def start(spark: SparkSession, port: Int = 0,
      host: String = "127.0.0.1"): Server = {
    val listener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(host, port), 0)
    val srv = new Server(http, spark, listener)
    http.createContext("/metrics", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val body = srv.render().getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        val out = ex.getResponseBody
        try out.write(body) finally ex.close()
      }
    })
    // a tiny dedicated pool: with the default same-thread dispatch, one
    // slow/stalled scraper would head-of-line-block every later scrape
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-metrics-http")
        t.setDaemon(true)
        t
      })
    srv.pool = pool
    http.setExecutor(pool)
    http.start()
    srv
  }
}
