package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental semantics (SURVEY §2.9): the reference's "streaming" is
  * watermark-driven micro-batch re-extraction (extractor/main.go:202-222,
  * 433-473), mapped here onto both forms Spark offers:
  *
  *  1. [[incrementalBatch]] — checkpointed max-event-time watermark driving the
  *     next batch's predicate: the literal translation of ST1/ST2.
  *  2. [[fileStream]] — a Structured Streaming file source with event-time
  *     watermark + within-watermark dedup + idempotent foreachBatch upsert:
  *     the native form (ST4/ST5 exactly-once via checkpoint offsets).
  */
object Incremental {

  /** One incremental micro-batch over a batch source: select rows newer than
    * the stored watermark, and return the advanced watermark (max event time
    * seen, monotone — reference: extractor/main.go:583-599 runMax).
    */
  def incrementalBatch(
      df: DataFrame,
      eventTimeCol: String,
      watermark: Option[String]): (DataFrame, Option[String]) = {
    val fresh = watermark match {
      case Some(wm) => df.where(col(eventTimeCol) > lit(wm).cast("timestamp"))
      case None     => df
    }
    val maxTs = fresh
      .agg(max(col(eventTimeCol).cast("timestamp")).cast("string").as("wm"))
      .first()
      .getString(0)
    val advanced = (watermark ++ Option(maxTs)).reduceOption((a, b) => if (a > b) a else b)
    (fresh, advanced)
  }

  /** Structured Streaming source over a landing directory: event-time
    * watermark, within-watermark dedup (ST4's at-least-once tolerance), and a
    * per-micro-batch idempotent sink callback (the foreachBatch MERGE analog
    * of the Gold upsert). `Trigger.AvailableNow` drains the backlog exactly
    * once then stops — the streaming analog of a queue-driven run (ST6).
    */
  def fileStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      eventTimeCol: String,
      key: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow())(sink: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(path)
      .withColumn(eventTimeCol, to_timestamp(col(eventTimeCol)))
      .withWatermark(eventTimeCol, "1 day")
      .dropDuplicatesWithinWatermark(key)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id) }
      .start()

  /** Event-time tumbling-window aggregate as a streaming plan — the streaming
    * form of the batch `st1_tumbling_window` query (counts+sums per window per
    * type with a lateness bound).
    */
  def tumblingCounts(stream: DataFrame, eventTimeCol: String, keyCol: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, "10 minutes")
      .groupBy(window(col(eventTimeCol), "1 hour"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** The full streaming pipeline: landed Bronze pages stream in, each
    * micro-batch runs the Silver merge + cleaning/Gold chain, and the Gold
    * sink is the idempotent anti-join upsert — the reference's queue-chained
    * extract->transform->clean (ST6) as ONE continuously-running query with
    * exactly-once page semantics from the checkpoint (ST5) and late/dup
    * tolerance from watermark dedup + first-write-wins (ST4).
    *
    * When `vehicles`/`people` are supplied, each micro-batch runs the full
    * 3-entity Silver merge (transformer/transformer.py:221-258) as a
    * stream-static join: the static sides are rolled up many-to-one and
    * joined onto the streaming crashes, so the enrich aggregates (veh_/ppl_
    * counts and value lists, CSV-safe JSON form) flow into Gold via the
    * cleaner's passthrough. The roll-up is an aggregate-before-join on the
    * batch's own keys — per-batch cost scales with the batch, and the static
    * side prunes through the join's key semi-space under AQE.
    */
  def streamingGold(
      spark: SparkSession,
      bronzePath: String,
      goldPath: String,
      checkpoint: String,
      corrId: String,
      vehicles: Option[DataFrame] = None,
      people: Option[DataFrame] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    fileStream(
      spark, bronzePath, graft.model.Schemas.bronzeCrashes,
      "crash_date", "crash_record_id", checkpoint, trigger) { (batch, batchId) =>
      if (!batch.isEmpty) {
        val crashes = batch.withColumn("crash_date", col("crash_date").cast("string"))
        // A missing side becomes a correctly-typed EMPTY frame (the
        // zero-column spark.emptyDataFrame would fail the merge's join and
        // roll-up column resolution at runtime).
        def typedEmpty(s: StructType) =
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        val silver =
          if (vehicles.isEmpty && people.isEmpty) crashes
          else graft.silver.Transformer.makeCsvSafe(
            graft.silver.Transformer.mergeCrashVehiclesPeople(
              crashes,
              vehicles.getOrElse(typedEmpty(graft.model.Schemas.bronzeVehicles)),
              people.getOrElse(typedEmpty(graft.model.Schemas.bronzePeople)),
              graft.model.Schemas.JoinKey))
        val enrichCols =
          silver.columns.filter(c => c.startsWith("veh_") || c.startsWith("ppl_")).toSeq
        val cleaned = graft.gold.Cleaner.cleanData(silver, passthrough = enrichCols)
        val gold = graft.gold.Cleaner.toGold(
          cleaned, s"$corrId-b$batchId",
          new java.sql.Timestamp(0L), // deterministic metadata for replays
          passthrough = enrichCols)
        // Bucketed upsert: the conflict anti-join reads only the key-hash
        // partitions this batch touches — per-batch IO stays proportional to
        // the batch, not to the ever-growing Gold table.
        graft.gold.GoldWriter.upsertBucketed(spark, gold, goldPath)
        ()
      }
    }

  /** Streaming near-dup dedup: a document landing directory streams in and
    * every micro-batch runs [[graft.ext.DedupStore.ingestBatch]] — arriving
    * docs are collapsed within the batch, probed against the signatures of
    * everything accepted so far, and survivors' signatures appended. The
    * checkpoint gives exactly-once batch processing; a replayed batch
    * rejects against its own stored signatures, so the store converges to
    * the same state as a batch d2/d6 run over the union.
    */
  def streamingDedup(
      spark: SparkSession,
      docsPath: String,
      storePath: String,
      checkpoint: String,
      threshold: Double = 0.8,
      compactEvery: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(docsPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ext.DedupStore.ingestBatch(spark, batch, storePath, threshold)
        // Periodic compaction from the single ingest owner (safe spot for
        // the store's rename-aside swap): every ingest appends small files,
        // and without this the probe's file listing grows without bound over
        // a long-lived stream. Outside the isEmpty guard — an empty batch at
        // the compaction slot must not defer it another compactEvery
        // batches — and keyed to batchId so a replayed batch re-compacts
        // harmlessly instead of double-counting.
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          graft.ext.DedupStore.compact(spark, storePath)
        ()
      }
      .start()
  }

  /** Dead-letter quarantine for `foreachBatch` bodies — the delivery
    * semantics the reference gets from RabbitMQ's manual-ack +
    * nack-no-requeue poison handling (cleaner/cleaner.py:246-316: a batch
    * whose processing throws is NOT requeued — it leaves the stream so one
    * poison message cannot wedge the consumer forever). Structured
    * Streaming's default is the opposite: a foreachBatch exception fails
    * the query, and a restart replays the SAME batch into the same
    * exception — a poison batch halts the pipeline permanently.
    *
    * This wrapper retries the body `attempts` times (transient faults —
    * an FS hiccup, an executor loss — succeed on retry), then QUARANTINES:
    * the batch's rows land in `deadLetterDir/batch=<id>/` with an
    * `_error.txt` sidecar (exception + timestamp + row count) and the
    * wrapper returns normally, so the checkpoint commits past the poison
    * batch and the stream keeps draining. The quarantine write is
    * OVERWRITE, keyed to the batch id — a crash between quarantine and
    * checkpoint commit replays into an identical rewrite, not a duplicate
    * (the streamingVectorIndex replay discipline). Operators re-drive a
    * fixed batch from the dead-letter directory (it holds the full rows),
    * exactly like a queue's DLX.
    *
    * If even the quarantine write fails (the input itself is unreadable),
    * the LAST error is rethrown — a batch that can neither process nor
    * persist must fail the query loudly rather than vanish.
    *
    * `retryDelayMs` spaces the retries (default 0 keeps tests instant):
    * the transient faults retries exist for — an FS hiccup, a recovering
    * dependency — rarely clear in the microseconds between two
    * back-to-back attempts, so production callers should give them a
    * beat (e.g. 1-5 s).
    */
  def withDeadLetter(deadLetterDir: String, attempts: Int = 2,
      retryDelayMs: Long = 0L)(
      body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    require(attempts >= 1, "attempts must be >= 1")
    (batch: DataFrame, batchId: Long) => {
      var lastErr: Throwable = null
      var done = false
      var i = 0
      while (!done && i < attempts) {
        if (i > 0 && retryDelayMs > 0) Thread.sleep(retryDelayMs)
        try { body(batch, batchId); done = true }
        catch { case scala.util.control.NonFatal(e) => lastErr = e }
        i += 1
      }
      if (!done) {
        try {
          val dir = s"$deadLetterDir/batch=$batchId"
          batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_error.txt"), true)
          try out.write(
            (s"batch=$batchId\nquarantined_at_ms=${System.currentTimeMillis()}\n" +
              s"error=${lastErr.getClass.getName}: ${Option(lastErr.getMessage).getOrElse("")}\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        } catch {
          case scala.util.control.NonFatal(qe) =>
            lastErr.addSuppressed(qe)
            throw lastErr
        }
      }
    }
  }

  /** Streaming data-quality gate — [[withDeadLetter]]'s sibling for
    * batches that are readable but WRONG: evaluate an
    * [[graft.ops.Expectations]] suite on each micro-batch (ONE extra
    * aggregation over the batch, however many checks), and only a batch
    * passing every check reaches `body`. A failing batch is quarantined to
    * `quarantineDir/batch=<id>/` with an `_expectations.txt` sidecar
    * carrying the failing report rows, and the wrapper returns normally so
    * the checkpoint commits past it — bad upstream data cannot poison the
    * table OR wedge the stream. The quarantine write is OVERWRITE keyed to
    * the batch id, so at-least-once replay re-quarantines identically (the
    * [[withDeadLetter]] discipline); operators inspect the sidecar, fix
    * the feed, and re-drive the quarantined rows. Compose inside
    * [[withDeadLetter]] for both failure classes: `withDeadLetter(dlq) {
    * withExpectations(checks, qdir) { apply } }`.
    */
  def withExpectations(checks: Seq[graft.ops.Expectations.Check],
      quarantineDir: String)(
      body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    require(checks.nonEmpty, "withExpectations needs at least one check")
    (batch: DataFrame, batchId: Long) => {
      val failing = graft.ops.Expectations.run(batch, checks)
        .where(!col("pass")).collect()
      if (failing.isEmpty) body(batch, batchId)
      else {
        val dir = s"$quarantineDir/batch=$batchId"
        batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_expectations.txt"), true)
        val lines = failing.map(r =>
          s"check=${r.getString(0)} col=${r.getString(1)} total=${r.getLong(2)} " +
            s"violations=${r.getLong(3)}").mkString("\n")
        try out.write(
          (s"batch=$batchId\nquarantined_at_ms=${System.currentTimeMillis()}\n" +
            lines + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    }
  }

  /** Streaming upsert into a [[graft.ops.ManifestStore]] table: arriving
    * JSON files land as micro-batches, each batch first-write-wins-upserted
    * through the manifest's atomic CAS commit. The two at-least-once
    * hazards of a parquet-directory streaming sink disappear structurally:
    * a batch REPLAYED after a crash re-upserts keys that already committed
    * (anti-join drops them — zero duplicates, the ST4 discipline), and a
    * crash DURING the upsert leaves only an unpublished segment no reader
    * can see (vacuum reclaims it) — there is no torn-append window at all,
    * which the plain GoldWriter path can only approximate with staleness
    * heuristics. Readers resolve the table through
    * [[graft.ops.ManifestStore.read]] at any moment, mid-stream included.
    */
  def streamingManifestUpsert(
      spark: SparkSession,
      srcPath: String,
      schema: StructType,
      tablePath: String,
      key: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(srcPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.ops.ManifestStore.upsert(spark, batch, tablePath, key)
          ()
        }
      }
      .start()

  /** Streaming CDC apply — [[streamingManifestUpsert]]'s full-MERGE
    * sibling: each micro-batch of change rows merges through
    * [[graft.ops.ManifestStore.merge]]'s segment-granular copy-on-write
    * commit (matched rows update, matched rows satisfying `deleteWhen`
    * delete). The not-matched insert clause is gated with
    * `insertWhen = NOT deleteWhen`, which is what makes at-least-once
    * replay safe: re-merging an already-applied batch re-updates rows to
    * the same values, re-deletes nothing (the keys are gone and, being
    * delete-flagged, cannot re-insert), and re-inserts only rows already
    * present (which become same-value updates) — the table converges to
    * the same state however many times a batch replays. A crash DURING a
    * merge leaves only unpublished segments no reader sees (vacuum
    * reclaims); readers resolve a consistent snapshot mid-stream, and the
    * copy-on-write touched-set means each micro-batch rewrites only the
    * segments its keys live in, not the table.
    */
  def streamingMerge(
      spark: SparkSession,
      srcPath: String,
      schema: StructType,
      tablePath: String,
      key: String,
      deleteWhen: Column,
      checkpoint: String,
      statsCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow(),
      seqCol: Option[String] = None): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(srcPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // seqCol: a micro-batch holding SEVERAL events for one key (update
          // then delete) must apply the LAST by event order — without it the
          // per-key survivor is arbitrary, which is unsafe for CDC (see
          // ManifestStore.merge's seqCol contract); pass the log offset /
          // event timestamp column whenever the feed can collide in-batch
          graft.ops.ManifestStore.merge(spark, batch, tablePath, key,
            deleteWhen = Some(deleteWhen), statsCols = statsCols,
            insertWhen = Some(!coalesce(deleteWhen, lit(false))),
            seqCol = seqCol)
          ()
        }
      }
      .start()

  /** Streaming ANN index maintenance — the vector-side sibling of
    * [[streamingDedup]]: embedding vectors land as JSON files
    * `(vec_id, embedding[])`; each micro-batch is IVFPQ-encoded
    * ([[graft.ext.Pq.ivfPqEncode]]: coarse cell + residual PQ codes, so a
    * dim×4-byte vector persists as one int cell + m bytes) and written to a
    * `batch=<id>/cell=<c>` partitioned parquet code store. The batch
    * directory is keyed to the micro-batch id and written with OVERWRITE:
    * foreachBatch is at-least-once, so a crash-replayed batch rewrites the
    * same directory instead of double-appending — idempotent without a
    * transactional sink (the GoldWriter corrId discipline, applied to
    * files). Probes ([[graft.ext.Pq.probeIndex]]) partition-prune on `cell`,
    * so query scan volume stays ~nprobe/nCells of the store at any corpus
    * size; the model is fit once offline and broadcast — the index never
    * retrains in the hot path.
    *
    * File-count maintenance: compact with
    * [[graft.ops.ScaleOps.compactParquet]] only while the stream is STOPPED
    * — the replay contract keys on the `batch=<id>` directories, and folding
    * a batch the checkpoint has not yet committed would turn its replay into
    * a duplicate append. (The dedup stream can compact inline because its
    * store rejects replayed rows semantically; a code store cannot.)
    */
  def streamingVectorIndex(
      spark: SparkSession,
      vecsPath: String,
      indexPath: String,
      checkpoint: String,
      coarse: Array[Array[Float]],
      model: graft.ext.Pq.Model,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField}
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(vecsPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ext.Pq.ivfPqEncode(batch, "vec_id", "embedding", coarse, model)
            .write.mode("overwrite").partitionBy("cell")
            .parquet(s"$indexPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming decontamination — the d11 pipeline run per micro-batch over
    * landed documents: a document is a stateless fact (it lives in exactly
    * one batch), so unlike dedup/heavy-hitters NO cross-batch state store is
    * needed — the whole check is the Bloom-prefiltered gram probe (pure
    * codegen'd column arithmetic, built ONCE from the benchmark set at
    * stream start) plus the exact verify join against the static benchmark
    * gram table. A Bloom has no false negatives, so the flagged set equals
    * the exact inverted-join decontamination of each batch. Flagged
    * (doc_id, lang) rows land batchId-keyed overwrite — the
    * [[streamingVectorIndex]] replay-idempotence recipe: a retried batch
    * overwrites its own directory, never duplicates.
    */
  def streamingDecontaminate(
      spark: SparkSession,
      docsPath: String,
      benchGrams: DataFrame,
      outPath: String,
      checkpoint: String,
      fpp: Double = 0.01,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    graft.functions.GraftFunctions.register(spark)
    val bench = benchGrams.select(col("gram").cast("string").as("gram")).distinct()
      .localCheckpoint() // eager: every micro-batch verify-joins it
    val p = graft.ext.Bloom.params(bench.count(), fpp)
    val bloom = graft.ext.Bloom.build(bench, "gram", p)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(docsPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val sh = batch
            .selectExpr("doc_id", "lang", graft.ext.MinHash.splitExpr)
            .selectExpr("doc_id", "lang", "shinglen(t, 13) AS g13")
          val pre = sh.selectExpr("doc_id", "lang", "explode(g13) AS gram")
            .where(graft.ext.Bloom.mightContain(col("gram"), bloom, p.k))
          pre.join(bench, Seq("gram"))
            .select("doc_id", "lang").distinct()
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Streaming DSIR importance scoring — the selection-side sibling of
    * [[streamingDecontaminate]]: documents land as JSON files
    * `(doc_id, lang, text)`, each micro-batch is tokenized and scored
    * against a FIXED trained [[graft.ext.Dsir.Model]], and per-doc weights
    * land in a `batch=<id>` parquet directory (overwrite — foreachBatch is
    * at-least-once, so a crash-replayed batch rewrites its own directory
    * instead of double-appending; the streamingVectorIndex discipline).
    * Because the model is an O(buckets) literal LUT riding the scan, the
    * per-batch work is STATELESS pure scan+aggregate — no state store, no
    * stream-static join, nothing that grows with corpus or stream length —
    * which is what makes DSIR the selection operator you can afford to run
    * ON INGEST rather than as a corpus-wide batch pass. Downstream
    * selection (the t21 top-fraction cut) stays a batch decision over the
    * accumulated scores: a global quantile is not meaningfully defined
    * per micro-batch.
    */
  def streamingDsirScore(
      spark: SparkSession,
      docsPath: String,
      model: graft.ext.Dsir.Model,
      outPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(docsPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ext.Dsir.score(
            batch.selectExpr("doc_id", "lang", graft.ext.MinHash.splitExpr),
            model, Seq("doc_id", "lang"))
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Open-session state carried between micro-batches by
    * [[streamingSessions]].
    */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** A closed session row emitted by [[streamingSessions]]. */
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, events: Long)

  /** Streaming sessionization — the custom-state streaming form of the
    * batch `st2_sessionize` query (same >gap-minutes split rule), via
    * `flatMapGroupsWithState`: per-user open-session state lives in the
    * state store across micro-batches, a session closes (and emits) when a
    * later event arrives past the gap, and the event-time TIMEOUT closes
    * the tail session once the watermark passes lastSeen + gap — without
    * it an idle user's final session would never materialize. State per
    * key is three longs (bounded regardless of session length), late
    * events beyond the watermark are dropped by the engine, and the
    * emitted rows are append-mode (closed sessions are immutable facts).
    *
    * Out-of-order contract vs the batch window form: a cross-batch event
    * that lands WITHIN the gap of the open session extends it in either
    * direction (`startMs`/`lastMs` both fold through min/max — StreamingSpec
    * pins the backward case). Two divergences from batch `st2_sessionize`
    * are accepted streaming approximations, both only reachable through
    * within-watermark stragglers: (1) an event within the watermark but
    * arriving AFTER its session was data-closed opens a fresh session where
    * batch would have merged it (closed sessions are immutable append-mode
    * facts — un-emitting is not expressible); (2) an event more than a gap
    * EARLIER than the open session's start folds into it where batch would
    * have made it a separate earlier session (only the open session is
    * carried as state). The parity pin on the events fixture holds because
    * its per-user streams are watermark-ordered across batches.
    */
  def streamingSessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val typed = events
      .selectExpr("CAST(user_id AS LONG) AS user_id", "CAST(ts AS TIMESTAMP) AS ts")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          def close(s: OpenSession) = ClosedSession(
            user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            // a micro-batch delivers a group's rows unordered — fold in
            // event-time order so intra-batch gaps split correctly
            val times = rows.map(_._2.getTime).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case None => cur = Some(OpenSession(t, t, 1))
                case Some(s) if t > s.lastMs + gapMs =>
                  out += close(s)
                  cur = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  // a cross-batch straggler can predate the stored start —
                  // fold both edges so the session window matches what the
                  // batch sort would have built
                  cur = Some(OpenSession(
                    math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** Current sketch report for one key — `hits` is estimate-desc/token-asc,
    * at most the report size k.
    */
  final case class HeavyHitterRow(key: String, hits: List[graft.ops.FreqSketch.KeyCount])

  /** Streaming heavy hitters — the incremental form of t15's Misra–Gries
    * sketch: per-key MG state (at most c counters, bounded regardless of
    * how many distinct tokens stream through) lives in the state store, and
    * each micro-batch folds its tokens through the SAME `reduce` the batch
    * Aggregator uses. After draining any prefix of the stream the state is
    * a valid MG summary of that prefix (same deficit bound), and in the
    * exact regime (support <= c) it equals exact counts no matter how the
    * stream was batched — StreamingSpec pins streaming == batch there.
    * Update-mode output: each batch re-emits the touched keys' current
    * top-k reports (a sketch report is a refinable estimate, not an
    * immutable fact — append mode would be the wrong contract).
    */
  def streamingHeavyHitters(tokens: DataFrame, c: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(k >= 1 && k <= c, s"report size k=$k must be in [1, c=$c]")
    val spark = tokens.sparkSession
    import spark.implicits._
    val mg = new graft.ops.FreqSketch.MisraGries(c)
    tokens
      .selectExpr("CAST(key AS STRING) AS key", "CAST(token AS STRING) AS token")
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], HeavyHitterRow](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state) =>
          val buf = rows.map(_._2).foldLeft(state.getOption.getOrElse(mg.zero))(mg.reduce)
          state.update(buf)
          HeavyHitterRow(key, mg.finish(buf).take(k))
      }
      .toDF()
  }

  /** Stream-stream event-time interval join — the streaming sibling of the
    * batch `j6_interval_join`: each error event joins the SAME user's clicks
    * from the preceding `windowMinutes`. Spark's stream-stream join buffers
    * both sides in state; the two watermarks PLUS the time-bound join
    * condition are what make that state finite — the engine derives "a click
    * older than (error watermark - window) can never match again" and
    * expires it. Without the interval bound the click buffer would grow
    * forever; this is the canonical shape for joining two unbounded streams.
    * Inner-join matches emit as soon as both rows arrive (no watermark
    * delay); the watermark only gates state cleanup.
    */
  def streamingClickErrorJoin(
      clicks: DataFrame,
      errors: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    val e = errors
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"))
      .withWatermark("error_ts", s"$windowMinutes minutes")
    c.join(e, expr(
        s"""c_user = e_user AND
           |error_ts >= click_ts AND
           |error_ts <= click_ts + INTERVAL $windowMinutes MINUTES""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_ts"), col("error_ts"))
  }

  /** A probe row enriched with the as-of matched build row (nulls = no
    * prior build for the key). */
  final case class AsofEnriched(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, click_id: java.lang.Long,
      click_ts: java.sql.Timestamp)

  /** Streaming AS-OF enrichment — the streaming sibling of the batch
    * `j10_asof_join` ([[graft.ops.ScaleOps.asofJoin]]): each PROBE event
    * (purchase) is matched to the same user's latest prior-or-equal BUILD
    * event (click). One keyed `flatMapGroupsWithState` over the tagged
    * union of both streams; state per key is ONE (time, id) pair — the
    * newest build seen — so state is O(keys) regardless of history length
    * (the batch form's O(1)-per-row window state, made persistent).
    *
    * Within a micro-batch, rows fold in event-time order with builds
    * before probes at equal times (the batch form's inclusive tie rule;
    * equal-time builds keep the max id, matching j10's pre-aggregation).
    * Cross-batch, a build never regresses the stored state (max fold).
    * The streaming approximation class (sessionization's notes apply): a
    * probe processed in an EARLIER batch than a late build it should have
    * matched keeps its emitted null/older match — enrichments are
    * append-mode immutable facts. Streaming == batch exactly when per-key
    * streams are event-time-ordered across batches (StreamingSpec pins
    * parity and the divergence case).
    *
    * Input needs (user_id, ts, event_type, event_id); probes are
    * `probeType` rows, builds `buildType`, everything else is ignored.
    */
  def streamingAsofEnrich(events: DataFrame, probeType: String = "purchase",
      buildType: String = "click"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .where(col("event_type").isin(probeType, buildType))
      .selectExpr("CAST(user_id AS LONG) AS user_id",
        "CAST(event_id AS LONG) AS event_id", "CAST(ts AS TIMESTAMP) AS ts",
        s"CAST(event_type = '$buildType' AS BOOLEAN) AS is_build")
      // a single null ts/id would NPE inside the state function — and a
      // streaming NPE is a poison pill (the checkpoint replays the same
      // batch forever). Malformed events drop here, the codec family's
      // PERMISSIVE posture applied to the stream.
      .where(col("user_id").isNotNull && col("event_id").isNotNull && col("ts").isNotNull)
      .as[(Long, Long, java.sql.Timestamp, Boolean)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), AsofEnriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Boolean)],
         state) =>
          // builds sort before probes at equal times: (t, !is_build) asc
          val sorted = rows.toArray.sortBy(r => (r._3.getTime, !r._4, r._2))
          var cur = state.getOption // (newest build tMs, its id)
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofEnriched]
          sorted.foreach { case (_, id, ts, isBuild) =>
            if (isBuild) {
              val t = ts.getTime
              cur match {
                case Some((ct, cid)) if ct > t || (ct == t && cid >= id) => ()
                case _ => cur = Some((t, id))
              }
            } else out += (cur match {
              case Some((ct, cid)) =>
                AsofEnriched(user, id, ts, cid, new java.sql.Timestamp(ct))
              case None => AsofEnriched(user, id, ts, null, null)
            })
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF()
  }

  /** ST7 — scheduled periodic ingestion: the reference's external cron
    * scheduler (pipeline_scheduler.py:42-103 cron -> job publish) collapses
    * into Structured Streaming's own trigger scheduler. The SAME pipeline as
    * [[streamingGold]] fires every `interval` (e.g. "10 minutes"),
    * processing whatever landed since the last tick; the checkpoint makes
    * re-fires idempotent, so a missed/slow tick is caught up, never
    * double-applied. Runs until `stop()` — the long-lived form of the
    * drain-once `Trigger.AvailableNow` query.
    */
  def scheduledGold(
      spark: SparkSession,
      bronzePath: String,
      goldPath: String,
      checkpoint: String,
      corrId: String,
      interval: String,
      vehicles: Option[DataFrame] = None,
      people: Option[DataFrame] = None): StreamingQuery =
    streamingGold(spark, bronzePath, goldPath, checkpoint, corrId,
      vehicles, people, Trigger.ProcessingTime(interval))

  /** Scheduled table-format maintenance — the daemon leg of
    * [[graft.ops.ManifestStore.maintain]], the cron analog of
    * [[scheduledGold]] (reference: scheduler/scheduler.py's cron loop):
    * every `interval` tick runs the metadata-only advisor with
    * `apply = true` (compacting when the layout drifts past budget or
    * merge-on-read delete debt is outstanding, refusing to destroy a
    * clustered layout) and then [[graft.ops.ManifestStore.vacuum]]s
    * orphans past `graceMs`. The driver of the tick is a 1-row/s rate
    * stream — the batch CONTENT is ignored; the checkpoint makes the
    * daemon restartable like every other query here. Maintenance verbs
    * are CAS commits, so a tick racing a live writer just retries —
    * running this beside active appenders is safe by construction.
    */
  def scheduledMaintain(
      spark: SparkSession,
      tablePath: String,
      checkpoint: String,
      interval: String,
      targetSegmentBytes: Long = 128L << 20,
      maxSegments: Int = 64,
      graceMs: Long = 24L * 3600 * 1000,
      statsCols: Seq[String] = Nil,
      trigger: Option[Trigger] = None): StreamingQuery =
    spark.readStream
      .format("rate").option("rowsPerSecond", 1)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger.getOrElse(Trigger.ProcessingTime(interval)))
      .foreachBatch { (_: DataFrame, _: Long) =>
        if (graft.ops.ManifestStore.current(spark, tablePath)
            .exists(_.segments.nonEmpty)) {
          graft.ops.ManifestStore.maintain(spark, tablePath,
            targetSegmentBytes, maxSegments, apply = true, statsCols)
          graft.ops.ManifestStore.vacuum(spark, tablePath, graceMs)
          ()
        }
      }
      .start()

  /** Scheduled change-feed replication — the packaged form of the CDC
    * lane (primary commits → [[graft.ops.ManifestStore.pollChanges]] →
    * replica): every `interval` tick polls the primary's manifest-diff
    * feed from the crash-safe cursor and MERGEs the pending change frame
    * into the replica table in EVENT ORDER (`seqCol = _commit_version`,
    * so an insert-then-delete collision inside one poll applies
    * correctly). At-least-once all the way down: a crash between apply
    * and cursor advance redelivers the frame, and the merge re-applies
    * it idempotently (same values re-update; delete-flagged rows cannot
    * re-insert under the `insertWhen` gate). The replica's schema is the
    * table's plus the `_change_type`/`_commit_version` provenance
    * columns — drop them for the data view. A REWRITE on the primary
    * (compact/cluster/COW delete) propagates [[graft.ops.ManifestStore.changes]]'
    * loud failure into the query: full-refresh the replica from that
    * snapshot, reset the cursor past it, restart the daemon — the same
    * contract as every feed consumer. Replica staleness is measured FLAT
    * as the primary grows (SCALE.md, artifacts/replica_lag_r11.json).
    */
  def scheduledReplica(
      spark: SparkSession,
      primaryPath: String,
      replicaPath: String,
      cursorPath: String,
      checkpoint: String,
      interval: String,
      key: String,
      statsCols: Seq[String] = Nil,
      trigger: Option[Trigger] = None): StreamingQuery =
    spark.readStream
      .format("rate").option("rowsPerSecond", 1)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger.getOrElse(Trigger.ProcessingTime(interval)))
      .foreachBatch { (_: DataFrame, _: Long) =>
        if (graft.ops.ManifestStore.current(spark, primaryPath)
            .exists(_.segments.nonEmpty)) {
          graft.ops.ManifestStore.pollChanges(spark, primaryPath, cursorPath) {
            frame =>
              graft.ops.ManifestStore.merge(spark, frame, replicaPath, key,
                deleteWhen = Some(col("_change_type") === "delete"),
                insertWhen = Some(col("_change_type") =!= "delete"),
                seqCol = Some("_commit_version"),
                statsCols = statsCols)
              ()
          }
          ()
        }
      }
      .start()

  /** Streaming materialized-aggregate maintenance — the stream leg of
    * [[graft.ops.ScaleOps.writeAggState]]: each micro-batch reduces to one
    * (group, count, exact DECIMAL sum) row per group appended to the state
    * store; [[graft.ops.ScaleOps.readAggState]] folds all batches to exact
    * running totals at read time. The run tag is keyed to the micro-batch
    * id, so a crash-replayed batch OVERWRITES its own contribution
    * (idempotent under foreachBatch's at-least-once contract) instead of
    * double-counting: exactly-once totals without a transactional sink.
    */
  def streamingAggState(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      groupCol: String,
      valueCol: String,
      storePath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .json(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions._
          // same row shape as ScaleOps.writeAggState, but idempotent:
          // partitioned by run_id and overwritten per batch id
          batch.selectExpr(s"CAST($groupCol AS STRING) AS g",
            s"CAST($valueCol AS DECIMAL(30, 6)) AS v")
            .groupBy("g")
            .agg(count(col("v")).as("cnt"),
              sum(col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("sm"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(s"$storePath/run_id=batch_$batchId") // run_id derives from the dir
        }
        ()
      }
      .start()

  /** Fold a [[streamingAggState]] store (per-batch directories) to exact
    * totals — same read contract as `ScaleOps.readAggState`, layout-aware.
    */
  def readStreamingAggState(spark: SparkSession, storePath: String): DataFrame =
    // one copy of the fold contract: the per-batch directories here and
    // ScaleOps' per-run directories share the (g, cnt, sm) row shape, so a
    // future change to the decimal scale or avg derivation lands in both
    graft.ops.ScaleOps.readAggState(spark, storePath)
}
