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

  /** `events` ships with a TIMESTAMP(NANOS) column, which Spark 4 rejects
    * unless nanos are read as raw longs. Reading nanos as BIGINT is also the
    * determinism-friendly choice: every time derivation below is exact
    * integer arithmetic, immune to timestamp-precision mismatches vs the
    * oracle. Adds `state_us` = event time in microseconds (BIGINT), matching
    * DuckDB's `epoch_us(ts)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tbl(spark, dir, "events")
      .withColumn("state_us", expr("ts div 1000"))
  }

  /** Money double → exact integer cents. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")
}
