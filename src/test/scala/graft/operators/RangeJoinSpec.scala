package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Semantics + plan shape of the binned range join: half-open bounds,
  * intervals spanning several bins, a negative axis (floor vs truncate
  * division), and — the point of the operator — no nested-loop join in
  * the physical plan.
  */
class RangeJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def joined(points: Seq[Long], ivs: Seq[(Long, Long, Long)],
                     bin: Long) = {
    val p = points.toDF("ts")
    val i = ivs.toDF("iv_id", "s", "e")
    RangeJoin.joinPointInInterval(p, "ts", i, "s", "e", bin)
  }

  test("half-open bounds: start included, end excluded") {
    val res = joined(Seq(10L, 19L, 20L), Seq((1L, 10L, 20L)), bin = 7L)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == Set((10L, 1L), (19L, 1L))) // 20 is the excluded end
  }

  test("intervals spanning multiple bins match without duplicates") {
    // interval [5, 40) covers bins 0..5 at width 7; every in-range point
    // matches exactly once even though the interval exploded 6 ways
    val res = joined(Seq(5L, 13L, 27L, 39L, 40L, 4L), Seq((1L, 5L, 40L)), bin = 7L)
      .select("ts").collect().map(_.getLong(0)).sorted
    assert(res.toSeq == Seq(5L, 13L, 27L, 39L))
  }

  test("negative axis values bin by floor, not truncation") {
    // floor(-3/7) = -1 (truncation would give 0 and miss the match)
    val res = joined(Seq(-3L), Seq((1L, -5L, 0L)), bin = 7L)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.toSeq == Seq((-3L, 1L)))
  }

  test("inverted intervals (end <= start) produce zero bins, not a descending explode") {
    // sequence(a, b) with a > b is DESCENDING in Spark: without the
    // pre-explode guard an interval with end far below start would
    // explode to a huge per-row bin array (memory blowup) whose matches
    // the exact re-filter then discards. The guard drops such rows first.
    val res = joined(Seq(5L, 500L),
      Seq((1L, 10L, 10L),            // empty under half-open
        (2L, 1000L, -1000000000L),   // grossly inverted: would be ~1.4e8 bins
        (3L, 0L, 8L)), bin = 7L)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.toSeq == Seq((5L, 3L)))
  }

  test("the physical plan is an equi-join, not a nested loop") {
    val plan = joined(Seq(1L, 2L), Seq((1L, 0L, 10L)), bin = 7L)
      .queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = collectWithSubqueries(p) { case x => x }
    assert(!all(plan).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
