package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *   - [[bruteForceKnn]]: exact cosine top-k for a bounded query set —
  *     a broadcast of the queries against a single scan of the corpus
  *     (no shuffle of the big side; per-row dot products stay inside
  *     whole-stage codegen via `zip_with`/`aggregate`).
  *   - [[lshBuckets]] / [[lshKnn]]: random-hyperplane LSH with
  *     *deterministic* integer hyperplanes (derived from (plane, dim)
  *     by an LCG formula, no RNG state) — bucketing keeps the candidate
  *     join near-linear; the scale path when the query set is large.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * a deterministic left fold.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, z) => acc + z)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector. Output:
    * (query_id, neighbor_id, rank), rank by cosine desc then neighbor id.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  val NumPlanes = 8

  /** Deterministic hyperplane weight for (plane p, dimension d):
    * LCG((p·1024 + d)) centered to ±2^30 — reproducible on any engine.
    */
  private def planeWeight(p: Column, d: Column): Column =
    (lit(1103515245L) * (p * 1024 + d) + 12345L) % lit(2147483648L) - lit(1073741824L)

  /** Sign-bucket id (0..2^NumPlanes) per vector: bit p = sign of the dot
    * product with deterministic plane p.
    */
  def lshBuckets(vectors: DataFrame): DataFrame = {
    vectors
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(NumPlanes - 1))).as("p"))
      .withColumn("dot", aggregate(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (v, d) => v.cast("double") * planeWeight(col("p"), d).cast("double")),
        lit(0.0), (acc, z) => acc + z))
      .withColumn("bit",
        when(col("dot") > 0, expr("shiftleft(cast(1 as bigint), p)")).otherwise(lit(0L)))
      .groupBy("vec_id")
      .agg(sum(col("bit")).as("bucket"))
  }

  /** Approximate top-k: brute-force within each LSH bucket. */
  def lshKnn(vectors: DataFrame, k: Int): DataFrame = {
    val b = lshBuckets(vectors)
    // persist: both sides of the bucket self-join reuse this projection
    val withB = vectors.join(b, "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = withB.select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val c = withB.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.join(c, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Exact near-duplicate pairs over a similarity threshold (for planted-
    * duplicate detection; keep the threshold away from the data's natural
    * similarity range).
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val c = vectors.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.crossJoin(c)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b")
  }
}
