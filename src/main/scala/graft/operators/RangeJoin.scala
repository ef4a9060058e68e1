package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range (interval) join — the scale-out form of
  * `point BETWEEN start AND end` with NO equi key.
  *
  * Spark's native plan for a pure range predicate is a broadcast
  * nested-loop (or cartesian) join: every point row is tested against
  * every interval — O(|points|·|intervals|), the exact all-pairs shape
  * PlanHygieneSpec bans. The standard fix (the same trick production
  * engines hide behind range-join hints): quantize the axis into
  * fixed-width bins, explode each interval to the bins it overlaps,
  * compute each point's single bin map-side, EQUI-join on the bin id,
  * and re-check the exact predicate on the matches. Work becomes
  * O(|points| + |intervals|·(width/binWidth + 1) + |matches|), shuffled
  * by bin — a plain hash join at any scale.
  *
  * A point lies in exactly one bin and an interval is exploded ONCE per
  * distinct bin it covers, so a (point, interval) pair can match at most
  * once: no post-join dedupe is needed. Pick `binWidth` near the typical
  * interval width: much smaller multiplies the interval explode; much
  * larger turns bins into hot keys (if the axis itself is skewed, salt
  * the bin id — see Skew.saltedJoin — or shrink the bins).
  *
  * All bin arithmetic is integer (`floor_div`), so the bucketing is
  * engine-independent; the exact containment filter keeps the result
  * identical to the naive BETWEEN join the oracle runs.
  */
object RangeJoin {

  /** Floor division on integral columns: subtracting the (always
    * nonnegative) pmod makes the numerator an exact multiple of `w`, so
    * the double division is exact while |c| < 2^53 — correct for
    * negatives too, unlike SQL `div`'s truncation toward zero.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / w).cast("long")

  /** Inner-join `points` to `intervals` where
    * `points(pointTs)` ∈ [ `intervals(startCol)`, `intervals(endCol)` )
    * — half-open, so adjacent intervals never double-match a boundary
    * point. All three columns must be integral (same unit, e.g. epoch
    * micros); `binWidth` is in that unit. Returns the joined rows with
    * all columns from both sides (bin bookkeeping dropped).
    */
  def joinPointInInterval(points: DataFrame, pointTs: String,
                          intervals: DataFrame, startCol: String,
                          endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // Guard BEFORE the explode: sequence(a, b) with a > b yields a
    // DESCENDING sequence, so an inverted interval (end <= start — empty
    // under the half-open contract) would still explode to bins, and an
    // end far below start to a huge per-row array (memory blowup). The
    // exact containment re-filter would discard the matches anyway;
    // dropping the rows here produces zero bins at zero cost.
    val binned = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_bin",
        explode(sequence(floorDiv(col(startCol), binWidth),
          floorDiv(col(endCol) - 1, binWidth))))
    points.withColumn("_bin", floorDiv(col(pointTs), binWidth))
      .join(binned, "_bin")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bin")
  }
}
