package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The extraction job specification — same JSON contract as the reference's
  * `streaming.json` / `backfill.json` (reference: extractor/main.go:114-157
  * `Job` struct; defaults at main.go:159-199; predicate precedence at
  * main.go:202-222).
  */
final case class DatasetSpec(
    id: String,
    alias: Option[String],
    select: Option[String],
    order: Option[String],
    pageSize: Option[Int])

final case class DateRange(field: String, start: String, end: String)

final case class JobSpec(
    mode: String,                  // "streaming" | "backfill"
    source: String,
    joinKey: String,
    primary: DatasetSpec,
    enrich: Seq[DatasetSpec],
    where: Option[String],         // explicit predicate (highest precedence)
    dateRange: Option[DateRange],
    sinceDays: Option[Int],
    idBatchSize: Int,
    bucket: String,
    prefix: String) {

  /** Comma-split select list, trimmed. */
  def primarySelect: Seq[String] =
    primary.select.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq("*"))
}

object JobSpec {

  /** Parse the reference's job-spec JSON (reference: extractor/main.go:1039-1056
    * unmarshal + validate; rejects a missing `primary.id`).
    */
  def parse(json: String): JobSpec = {
    val j = JsonMethods.parse(json)
    def str(v: JValue): Option[String] = v match {
      case JString(s) if s.nonEmpty => Some(s)
      case _                        => None
    }
    def int(v: JValue): Option[Int] = v match {
      case JInt(i)     => Some(i.toInt)
      case JDouble(d)  => Some(d.toInt)
      case JLong(l)    => Some(l.toInt)
      case _           => None
    }
    def dataset(v: JValue): DatasetSpec = {
      val id = str(v \ "id").getOrElse(
        throw new IllegalArgumentException("job spec: missing dataset id"))
      DatasetSpec(id, str(v \ "alias"), str(v \ "select"), str(v \ "order"), int(v \ "page_size"))
    }
    val primary = dataset(j \ "primary")
    val enrich = (j \ "enrich") match {
      case JArray(xs) => xs.map(dataset)
      case _          => Nil
    }
    val dr = (j \ "date_range") match {
      case JNothing | JNull => None
      case v =>
        for {
          f <- str(v \ "field"); s <- str(v \ "start"); e <- str(v \ "end")
        } yield DateRange(f, s, e)
    }
    // Defaults mirror applyDefaults (reference: extractor/main.go:159-199;
    // missing mode defaults to "streaming" there, main.go:160-162).
    JobSpec(
      mode = str(j \ "mode").getOrElse("streaming"),
      source = str(j \ "source").getOrElse("crash"),
      joinKey = str(j \ "join_key").getOrElse(Schemas.JoinKey),
      primary = primary,
      enrich = enrich,
      // The reference carries the explicit predicate on the primary dataset
      // (extractor/main.go:121 DatasetSpec.Where); accept a top-level `where`
      // as a convenience fallback.
      where = str(j \ "primary" \ "where").orElse(str(j \ "where")),
      dateRange = dr,
      sinceDays = int(j \ "primary" \ "where_by" \ "since_days"),
      idBatchSize = int(j \ "batching" \ "id_batch_size").getOrElse(300),
      bucket = str(j \ "storage" \ "bucket").getOrElse("raw-data"),
      prefix = str(j \ "storage" \ "prefix").getOrElse("crash"))
  }
}
