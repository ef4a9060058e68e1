package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *   - [[bruteForceKnn]] / [[nearDupPairs]]: exact cosine — vectors are
  *     unit-normalized ONCE (per row, persisted) so every pair costs a
  *     single dot product instead of three norm folds; the corpus side is
  *     scanned, never shuffled, and only the bounded query set broadcasts.
  *   - [[lshBuckets]] / [[lshKnn]]: random-hyperplane LSH with
  *     *deterministic* integer hyperplanes (derived from (plane, dim) by an
  *     LCG formula, no RNG state) — bucketing keeps the candidate join
  *     near-linear; the scale path when the query set is large.
  */
object Similarity {

  /** Deterministic left-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column = aggregate(
    zip_with(a, b, (u, v) => u * v), lit(0.0), (acc, z) => acc + z)

  /** Unrolled dot product for a KNOWN dimensionality. Same left-to-right
    * accumulation order as the fold → identical fp result. MEASURED SLOWER
    * than the `aggregate` fold at dim=64 on this Spark version (sf0.1
    * near-dup scan: 13 s fold vs 36 s unrolled): the 64-term element_at
    * tree exceeds Janino method limits and drops the whole stage out of
    * codegen. Kept for small dims / future codegen improvements; the
    * queries default to the fold (`dim = 0`).
    */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)

  /** Cosine similarity of two float-array columns (self-contained form —
    * prefer the unit-vector path for bulk pair work).
    */
  def cosine(a: Column, b: Column): Column = {
    def d(x: Column, y: Column) = aggregate(
      zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, z) => acc + z)
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  /** Project (vec_id, unit-normalized double vector), persisted: the norm
    * fold runs once per vector, not once per pair.
    */
  def unitVectors(vectors: DataFrame): DataFrame = {
    val asDouble = transform(col("embedding"), x => x.cast("double"))
    vectors
      .select(col("vec_id"), asDouble.as("v"))
      .select(col("vec_id"),
        transform(col("v"), x => x / sqrt(dot(col("v"), col("v")))).as("uv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact top-k neighbors for each query vector. Output:
    * (query_id, neighbor_id, rank), rank by cosine desc then neighbor id.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int = 0): DataFrame = {
    val unit = unitVectors(corpus)
    val q = unit.join(queries.select("vec_id"), "vec_id")
      .select(col("vec_id").as("query_id"), col("uv").as("qv"))
    val c = unit.select(col("vec_id").as("neighbor_id"), col("uv").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val d = if (dim > 0) dotUnrolled(col("qv"), col("cv"), dim) else dot(col("qv"), col("cv"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", d)
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
      .withColumn("dotp", aggregate(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (v, d) => v.cast("double") * planeWeight(col("p"), d).cast("double")),
        lit(0.0), (acc, z) => acc + z))
      .withColumn("bit",
        when(col("dotp") > 0, expr("shiftleft(cast(1 as bigint), p)")).otherwise(lit(0L)))
      .groupBy("vec_id")
      .agg(sum(col("bit")).as("bucket"))
  }

  /** Approximate top-k: brute-force within each LSH bucket. */
  def lshKnn(vectors: DataFrame, k: Int, dim: Int = 0): DataFrame = {
    val withB = unitVectors(vectors).join(lshBuckets(vectors), "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = withB.select(col("vec_id").as("query_id"), col("uv").as("qv"), col("bucket"))
    val c = withB.select(col("vec_id").as("neighbor_id"), col("uv").as("cv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val d = if (dim > 0) dotUnrolled(col("qv"), col("cv"), dim) else dot(col("qv"), col("cv"))
    a.join(c, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", d)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Exact near-duplicate pairs over a similarity threshold (for planted-
    * duplicate detection; keep the threshold away from the data's natural
    * similarity range).
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double, dim: Int = 0): DataFrame = {
    val unit = unitVectors(vectors)
    val a = unit.select(col("vec_id").as("vec_a"), col("uv").as("va"))
    val c = unit.select(col("vec_id").as("vec_b"), col("uv").as("vb"))
    val d = if (dim > 0) dotUnrolled(col("va"), col("vb"), dim) else dot(col("va"), col("vb"))
    a.crossJoin(c)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", d)
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b")
  }
}
