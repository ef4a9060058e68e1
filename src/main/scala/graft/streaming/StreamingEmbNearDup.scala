package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental EMBEDDING near-duplicate detection over a vector stream —
  * the [[StreamingNearDup]] bucket-index discipline applied to the
  * batch ANN family's hyperplane-LSH sketches
  * ([[Similarity.lshTablesFast]]): a late-arriving near-duplicate
  * embedding is caught WITHOUT re-running batch ANN over the corpus
  * (VERDICT_r8 "what's missing" #3 — the batch LSH tables had no
  * incremental form).
  *
  * Per micro-batch of (vec_id, embedding):
  *   1. Sketch: `tables` sign-buckets of `bits` planes each per vector
  *      (the exact-integer kernel — identical values to the batch
  *      operator) + the unit vector for exact verification. Probe key
  *      `tkey` = "t:tbucket"; directory bucket = hash(tkey) mod
  *      `numBuckets`.
  *   2. PROBE: read ONLY the touched index buckets, with the batch's
  *      tkeys pushed down (bounded IN-list under
  *      [[StreamingNearDup.MaxPushdownKeys]], broadcast semi-join
  *      past it) and the per-key hot guard
  *      ([[StreamingNearDup.MaxKeyRows]] smallest vec_ids kept as
  *      family representatives).
  *   3. Candidates = pairs colliding in ≥1 table (history + within
  *      batch), VERIFIED by exact cosine of the stored unit vectors
  *      against `minCos` — sketch collisions only gate the candidate
  *      set, never the verdict.
  *   4. Matches land at `matchesPath/batch-<id>` (overwrite —
  *      idempotent replay); the batch's sketch rows append to the index
  *      via [[BucketIndex.appendDelta]] (one delta file per touched
  *      bucket, tkey-sorted compaction).
  *
  * State: driver holds NOTHING across batches; all history is the
  * on-disk index (the only structure that can hold 100 TB of vectors).
  * Index row cost is `tables` rows per vector each carrying the unit
  * vector (dims doubles) — the verify payload co-located with the
  * sketch so a probe is one scan, no second corpus join.
  */
object StreamingEmbNearDup {

  /** Per-batch probe telemetry (driver-side metadata only). */
  final case class ProbeStats(
      batchId: Long,
      batchVecs: Long,
      bucketsProbed: Int,
      bucketsOccupied: Int,
      indexRowsScanned: Long,
      matches: Long,
      processMs: Long,
      inListKeys: Int = 0)

  private val indexSchema = StructType(Seq(
    StructField("tkey", StringType),
    StructField("vec_id", LongType),
    StructField("uv", ArrayType(DoubleType))))

  def start(
      vectors: DataFrame,
      indexPath: String,
      matchesPath: String,
      tables: Int = 4,
      bits: Int = 8,
      numBuckets: Int = 64,
      minCos: Double = 0.95,
      compactThreshold: Int = 8,
      onStats: ProbeStats => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onStats(processBatch(batch, batchId, indexPath, matchesPath,
          tables, bits, numBuckets, minCos, compactThreshold))
      }
      .start()

  /** One micro-batch: sketch → probe → verify → append. Exposed for the
    * bench harness and tests.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      indexPath: String,
      matchesPath: String,
      tables: Int,
      bits: Int,
      numBuckets: Int,
      minCos: Double,
      compactThreshold: Int,
      probeAllBuckets: Boolean = false,
      maxPushdownKeys: Int = StreamingNearDup.MaxPushdownKeys,
      maxKeyRows: Int = StreamingNearDup.MaxKeyRows): ProbeStats = {
    val t0 = System.nanoTime()
    val spark = batch.sparkSession
    val unit = Similarity.unitVectors(batch.toDF()) // persisted; released below
    val rows = Similarity.lshTablesFast(batch.toDF(), tables, bits)
      .withColumn("tkey", concat_ws(":", col("t"), col("tbucket")))
      .join(unit, "vec_id")
      .select(col("tkey"), col("vec_id"), col("uv"))
      .withColumn("bucket", pmod(hash(col("tkey")), lit(numBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = rows.select("bucket").distinct().collect()
        .map(_.getInt(0)).toSet
      val storeDir = new org.apache.hadoop.fs.Path(indexPath)
      val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // tables/bits are part of the layout: a mismatched reopen would
      // compare sketches from different plane geometries
      BucketIndex.checkLayout(fs, storeDir, "_emb_nd_layout",
        s"$numBuckets:$tables:$bits")
      val occupied =
        if (!fs.exists(storeDir)) Array.empty[Int]
        else fs.listStatus(storeDir)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
          .map(_.getPath.getName.stripPrefix("bucket=").toInt)
      val probeIds =
        if (probeAllBuckets) occupied.toSeq
        else occupied.filter(touched.contains).toSeq
      val probePaths = probeIds.map(b => s"$indexPath/bucket=$b")
      var inListKeys = 0
      val idx =
        if (probePaths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
        else {
          val scan = spark.read.schema(indexSchema).parquet(probePaths: _*)
          if (probeAllBuckets) scan
          else {
            val distinctKeys = rows.select("tkey").distinct()
            val sample = distinctKeys.limit(maxPushdownKeys + 1).collect()
            if (sample.length <= maxPushdownKeys) {
              inListKeys = sample.length
              scan.filter(col("tkey").isInCollection(
                sample.map(_.getString(0)).toSeq))
            } else {
              inListKeys = -1
              scan.join(broadcast(distinctKeys), Seq("tkey"), "left_semi")
            }
          }
        }
      def capPerKey(df: DataFrame): DataFrame =
        if (maxKeyRows <= 0) df
        else df.withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("tkey").orderBy("old_vec")))
          .filter(col("_rn") <= maxKeyRows).drop("_rn")
      val old = capPerKey(idx.select(col("tkey"),
        col("vec_id").as("old_vec"), col("uv").as("old_uv")))
      val newSide = rows.select(col("vec_id").as("new_vec"), col("tkey"), col("uv"))
      val vsHistory = newSide.join(old, Seq("tkey"))
        .filter(col("old_vec") =!= col("new_vec"))
      val inBatch = newSide.join(
        capPerKey(rows.select(col("vec_id").as("old_vec"), col("tkey"),
          col("uv").as("old_uv"))),
        Seq("tkey"))
        .filter(col("old_vec") < col("new_vec"))
      // collapse multi-table collisions to one candidate pair, then
      // verify by EXACT cosine (unit vectors: cosine = dot) — the sketch
      // only gates the candidate set, never the verdict. The interpreted
      // fold runs once per CANDIDATE (post-LSH, a tiny set), not per
      // corpus row.
      val matches = vsHistory.unionByName(inBatch)
        .groupBy("new_vec", "old_vec")
        .agg(count(lit(1)).as("n_tables"),
          first(col("uv")).as("uv"), first(col("old_uv")).as("old_uv"))
        .withColumn("cos", aggregate(
          zip_with(col("uv"), col("old_uv"), (x, y) => x * y),
          lit(0.0), (acc, z) => acc + z))
        .filter(col("cos") >= minCos)
        .select("new_vec", "old_vec", "n_tables", "cos")
      matches.write.mode("overwrite").parquet(s"$matchesPath/batch-$batchId")
      val nMatches = spark.read.parquet(s"$matchesPath/batch-$batchId").count()
      val idxRows = if (probePaths.isEmpty) 0L else idx.count()
      BucketIndex.appendDelta(rows,
        dataCols = Seq("tkey", "vec_id", "uv"),
        batchId, indexPath, numBuckets, compactThreshold,
        schema = indexSchema,
        dedupCols = Seq("tkey", "vec_id"),
        sortCols = Seq("tkey", "vec_id"),
        fs, storeDir)
      ProbeStats(batchId, rows.select("vec_id").distinct().count(),
        probeIds.size, occupied.length, idxRows, nMatches,
        (System.nanoTime() - t0) / 1000000L, inListKeys)
    } finally {
      rows.unpersist()
      unit.unpersist()
    }
  }
}
