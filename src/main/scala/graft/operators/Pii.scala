package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The PII redaction patterns, ONE definition for every consumer: the
  * declared `doc_pii_scrub` / `doc_pipeline_e2e` queries, their DuckDB
  * oracle strings, and the at-ingest [[graft.streaming.StreamingPipeline]]
  * — a pattern edit in one path cannot silently diverge the others.
  * Patterns are deliberately in the Java∩RE2 regex subset so the same
  * strings run unchanged on both engines (see `doc_pii_scrub`'s notes).
  */
object Pii {
  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePat = "555-[0-9]{4}"

  /** Redact both patterns in a text column (map-side, codegen'd). */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPat, "<EMAIL>"),
      PhonePat, "<PHONE>")
}
