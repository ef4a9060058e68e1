package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + shared conversion helpers for the query surface.
  *
  * Scale notes: every loader is a plain parquet scan, so Catalyst pushes
  * filters/projections into the scan (verify with .explain: PushedFilters /
  * ReadSchema). Money is aggregated in integer cents (all test money columns
  * are 2-decimal exact) — bit-identical across engines and immune to
  * fp-summation order, which also matters at 1000-executor scale where
  * partial-aggregation order is nondeterministic.
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Loads `events` and adds `state_us` = event time in microseconds
    * (BIGINT), matching DuckDB's `epoch_us(ts)`. The fixture's `ts` column
    * has shipped as both TIMESTAMP(NANOS) (older driver drops; Spark 4 only
    * accepts it as a raw long via `nanosAsLong`) and plain timestamp[us]
    * (current drops; Spark reads it as TIMESTAMP_NTZ), so the derivation
    * branches on the loaded type:
    *   - raw nanos long: exact integer `ts div 1000`
    *   - timestamp:      `unix_micros` after an NTZ→UTC cast — the session
    *     timezone is pinned to UTC by every entry point, so the tz-naive
    *     wall clock is interpreted exactly as DuckDB's `epoch_us` does.
    * Downstream, all event-time arithmetic stays on the BIGINT `state_us`,
    * bit-identical across engines regardless of which precision shipped.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = tbl(spark, dir, "events")
    val stateUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    df.withColumn("state_us", stateUs)
  }

  /** Money double → exact integer cents. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")
}
