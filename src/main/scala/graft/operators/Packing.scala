package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk assignment every LLM training
  * pipeline runs last: documents are laid end-to-end in a deterministic
  * order and sliced into fixed token-budget context windows, and each
  * document learns which chunk(s) it lands in.
  *
  * The core is a GLOBAL running sum, which naive
  * `Window.orderBy(id)` (no partition key) would compute by moving the
  * entire corpus into one partition — the canonical scale trap. Instead
  * this is the classic distributed two-pass prefix sum:
  *
  *   1. range-partition by the order key (partition i holds ids strictly
  *      below partition i+1 — global order across partitions is free),
  *   2. one tiny aggregation collects PER-PARTITION totals to the driver
  *      (O(#partitions) rows — bounded driver state, same class as the
  *      k-means centroid tables),
  *   3. a scan over those totals yields each partition's base offset,
  *      broadcast-joined back,
  *   4. the running sum runs WITHIN each partition (parallel windows)
  *      and adds the base.
  *
  * The result is bit-identical to the single-partition window for any
  * partition count — partitioning never crosses the engine boundary —
  * so the DuckDB oracle is the plain `SUM() OVER (ORDER BY id)`.
  *
  * Chunk math is pure integer floor division (`DIV`, not fp `/`): with
  * cumulative token count `cum` and budget `B`,
  * `chunk_first = (cum - w) DIV B`, `chunk_last = (cum - 1) DIV B` —
  * exact at any offset a 100 TB corpus can reach (offsets fit a Long to
  * 9.2e18 tokens). A zero-weight row occupies no token span, so it is
  * special-cased to the explicit empty interval
  * `chunk_last = chunk_first - 1`, `n_chunks = 0` — the general formula
  * alone only yields that when `cum` happens to land on a budget
  * boundary (mid-bucket it degenerates to a spurious 1-chunk span).
  */
object Packing {

  /** @param docs     one row per document
    * @param idCol    unique orderable id — the packing order
    * @param weightCol non-negative Long token count
    * @param budget   context-window size in tokens
    * @return input columns + `start_off`, `chunk_first`, `chunk_last`,
    *         `n_chunks`
    */
  def packChunks(
      docs: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    val parted = docs
      .repartitionByRange(nPart, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Driver state: one (pid, total) pair per partition.
    val totals = parted.groupBy(col("_pid"))
      .agg(sum(col(weightCol)).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val bases = pids.zip(pids.scanLeft(0L)((acc, p) =>
      Math.addExact(acc, totals(p))).init)
    val baseDf = bases.toDF("_pid", "_base")

    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
    val res = parted
      .join(broadcast(baseDf), Seq("_pid"))
      .withColumn("_cum", sum(col(weightCol)).over(w) + col("_base"))
      .withColumn("start_off", col("_cum") - col(weightCol))
      .withColumn("chunk_first", expr(s"start_off DIV ${budget}L"))
      .withColumn("chunk_last",
        when(col(weightCol) === 0L, col("chunk_first") - 1L)
          .otherwise(expr(s"(_cum - 1) DIV ${budget}L")))
      .withColumn("n_chunks",
        greatest(col("chunk_last") - col("chunk_first") + 1L, lit(0L)))
      .drop("_pid", "_cum", "_base")
    Caching.materializeAndRelease(res, parted)
  }
}
