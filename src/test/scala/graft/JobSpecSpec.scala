package graft

import graft.ingest.Ingest
import graft.model.JobSpec

/** Job-spec parsing (extractor/main.go:114-199) and predicate precedence
  * (main.go:202-222), using the reference's shipped specs verbatim as
  * fixtures (FIXTURES.md §A7).
  */
class JobSpecSpec extends SparkSpec {

  private val streamingJson =
    """{
      |  "mode": "streaming", "source": "crash", "join_key": "crash_record_id",
      |  "primary": {
      |    "id": "85ca-t3if", "alias": "crashes",
      |    "select": "crash_record_id,crash_date,crash_type",
      |    "where_by": { "since_days": 7 },
      |    "order": "crash_date, crash_record_id", "page_size": 2000
      |  },
      |  "enrich": [
      |    { "id": "68nd-jvt3", "alias": "vehicles", "select": "crash_record_id,make" },
      |    { "id": "u6pd-qa9d", "alias": "people", "select": "crash_record_id,age" }
      |  ],
      |  "batching": { "id_batch_size": 50, "max_workers": { "vehicles": 4, "people": 4 } },
      |  "storage": { "bucket": "raw-data", "prefix": "crash", "compress": true }
      |}""".stripMargin

  private val backfillJson =
    """{
      |  "mode": "backfill", "source": "crash", "join_key": "crash_record_id",
      |  "date_range": { "field": "crash_date",
      |    "start": "2020-01-01T00:00:00", "end": "2020-01-02T00:00:00" },
      |  "primary": { "id": "85ca-t3if", "alias": "crashes",
      |    "select": "crash_record_id,crash_date,crash_type", "page_size": 2000 },
      |  "enrich": [], "storage": { "bucket": "raw-data", "prefix": "crash" }
      |}""".stripMargin

  test("parses the reference streaming spec with defaults") {
    val job = JobSpec.parse(streamingJson)
    assert(job.mode == "streaming")
    assert(job.primary.id == "85ca-t3if")
    assert(job.enrich.map(_.alias.get) == Seq("vehicles", "people"))
    assert(job.sinceDays.contains(7))
    assert(job.idBatchSize == 50)
  }

  test("missing primary id is rejected") {
    intercept[IllegalArgumentException] {
      JobSpec.parse("""{"primary": {"alias": "x"}}""")
    }
  }

  test("predicate precedence: explicit where > date_range > watermark > since_days > default") {
    val now = java.time.LocalDate.parse("2024-02-01")
    val backfill = JobSpec.parse(backfillJson)
    val streaming = JobSpec.parse(streamingJson)

    // date_range wins over watermark (backfill never uses it)
    val pDate = Ingest.buildPredicate(backfill, Some("2023-01-01 00:00:00"), now)
    assert(pDate.toString.contains("2020-01-01"))

    // watermark beats since_days
    val pWm = Ingest.buildPredicate(streaming, Some("2024-01-15 00:00:00"), now)
    assert(pWm.toString.contains("2024-01-15"))

    // since_days fallback when no watermark
    val pSince = Ingest.buildPredicate(streaming, None, now)
    assert(pSince.toString.contains("2024-01-25")) // now - 7d

    // explicit where trumps everything
    val withWhere = streaming.copy(where = Some("crash_type = 'X'"))
    val pWhere = Ingest.buildPredicate(withWhere, Some("2024-01-15 00:00:00"), now)
    assert(pWhere.toString.contains("crash_type"))
  }

  test("ensureSelect injects the join key and date column when absent") {
    assert(Ingest.ensureSelect(Seq("crash_type"), "crash_record_id", "crash_date") ==
      Seq("crash_record_id", "crash_date", "crash_type"))
    assert(Ingest.ensureSelect(Seq("*"), "crash_record_id") == Seq("*"))
    assert(Ingest.ensureSelect(Seq("crash_record_id", "crash_date"),
      "crash_record_id", "crash_date") == Seq("crash_record_id", "crash_date"))
  }
}
