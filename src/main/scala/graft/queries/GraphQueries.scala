package graft.queries

import graft.graph.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX analytics queries over the relation-cell graph
  * (order→customer→nation→region). CC and BFS have exact SQL oracles
  * because this graph is a forest rooted at regions. PageRank is also
  * oracle-checked: every non-sink vertex here has out-degree exactly 1, so
  * the (unnormalized) pagerank recurrence (rank = 0.15 + 0.85·Σ incoming,
  * init 1.0) unrolls into plain SQL — and because 0.15 = 3/20 and
  * 0.85 = 17/20, after t iterations every achievable rank is an exact
  * multiple of 20^-t. Both engines now run the recurrence DIRECTLY on
  * that lattice in Long/BIGINT numerators (Analytics.pageRankLattice):
  * the earlier round(double·20⁵) recovery held while fp noise ≪ 0.5, but
  * broke by exactly 1 at sf1 under a 30%-hot-vertex degree distribution
  * (different summation orders across 450k incoming edges — SCALE_r6 §2);
  * integer arithmetic is order-free at any scale. The lattice is no
  * longer forest-only: `graph_pagerank_general` runs it on a multi-out-
  * degree graph (order→part, degrees 1..4) with per-edge integral
  * weights L/d(u), L = lcm of out-degrees, scale (20L)^k.
  */
object GraphQueries {

  private def edges(s: SparkSession, dir: String): DataFrame =
    GunQueries.relationCells(s, dir)
      .select(col("soul").as("src"), col("field"), col("dst"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Connected components: one component per region (undirected reach).
    "graph_components" -> ((s, dir) =>
      Analytics.connectedComponents(s, edges(s, dir))),

    // BFS hop counts from the ASIA region, walking edges in reverse
    // (region ← nation ← customer ← order).
    "graph_reach_asia" -> ((s, dir) => {
      val rev = edges(s, dir).select(
        col("dst").as("srcRev"), col("field"), col("src").as("dst"))
        .withColumnRenamed("srcRev", "src")
      Analytics.reachable(s, rev, Set("region:2"))
    }),

    // PageRank over the forward graph — the INTEGER-LATTICE recurrence
    // (Analytics.pageRankLattice: Long numerators over 20^k), bit-exact at
    // any scale and summation order. The double form's round(rank·20⁵)
    // flipped by 1 at sf1 under the 30%-hot-vertex fixture (SCALE_r6 §2);
    // same output values where the double form was within its margin, so
    // sf0.01/sf0.1 hashes are unchanged.
    "graph_pagerank" -> ((s, dir) =>
      Analytics.pageRankLattice(s, edges(s, dir), iters = 5)),

    // PageRank on a GENERAL graph (out-degree > 1): order→part edges from
    // lineitem, capped STRUCTURALLY at each order's 4 lexicographically-
    // first parts (row_number over dst — deterministic: pairs are
    // distinct, so the sort has no ties) so out-degrees stay in {1..4}
    // and the lattice scale (20·lcm)^5 ≤ 240^5 ≈ 8·10^11 leaves ~10^6×
    // Long headroom AT ANY sf (a linenumber filter would not bound it:
    // the driver's linenumbers repeat within an order). Exercises the
    // L = lcm(out-degrees) generalization of pageRankLattice — the
    // weight 1/outdeg is no longer identically 1.
    "graph_pagerank_general" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = s.read.parquet(s"$dir/lineitem.parquet")
        .select(
          concat(lit("order:"), col("l_orderkey").cast("string")).as("src"),
          concat(lit("part:"), col("l_partkey").cast("string")).as("dst"))
        .distinct()
      val e = pairs
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("dst"))))
        .filter(col("rn") <= 4)
        .select(col("src"), lit("has_part").as("field"), col("dst"))
      Analytics.pageRankLattice(s, e, iters = 5)
    }),

    // Label-propagation communities over the undirected relation graph:
    // 4 synchronous steps, mode label with smallest-label tie-break
    // (fully deterministic — oracle unrolls the identical recurrence).
    // Output is the community histogram (label, n_members).
    "graph_label_prop" -> ((s, dir) => {
      Analytics.labelPropagation(
          s, edges(s, dir).select(col("src"), col("dst")), iters = 4)
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_members"))
    })
  )

  /** One power-iteration step of the lattice recurrence in SQL, all
    * BIGINT: n_{k+1} = 3·20^k + 17 · Σ_{u→v} n_k(u) (every src has
    * out-degree 1 in this graph, so the 1/outdeg edge weight is 1; n_k is
    * rank·20^k exactly).
    */
  private def prStep(prev: String, powK: Long): String =
    s"""SELECT v.soul,
           CAST(3 * $powK + 17 * COALESCE(m.s, 0) AS BIGINT) AS n
        FROM verts v LEFT JOIN (
          SELECT e.dst AS soul, CAST(SUM(p.n) AS BIGINT) AS s
          FROM pr_edges e JOIN $prev p ON p.soul = e.src
          GROUP BY e.dst) m USING (soul)"""

  /** One power-iteration step of the GENERAL lattice recurrence in SQL:
    * n_{k+1} = 3·L·S_k + 17 · Σ_{u→v} n_k(u)·(L/d(u)), with L from the
    * `lv` CTE (lcm-fold over distinct out-degrees), S_k from `spows`
    * ((20L)^k, built by recursion — no double-typed power()), and the
    * integral per-edge weight L/d(u) from `we`. All BIGINT.
    */
  private def prStepW(prev: String, k: Int): String =
    s"""SELECT v.soul,
           CAST(3 * (SELECT l FROM lv) * (SELECT s FROM spows WHERE k = $k)
                + 17 * COALESCE(m.s, 0) AS BIGINT) AS n
        FROM verts v LEFT JOIN (
          SELECT e.dst AS soul, CAST(SUM(p.n * e.w) AS BIGINT) AS s
          FROM we e JOIN $prev p ON p.soul = e.src
          GROUP BY e.dst) m USING (soul)"""

  /** One synchronous label-propagation step in SQL: for each vertex, the
    * most frequent neighbor label, smallest label on ties (the ORDER BY
    * is total, so ROW_NUMBER is deterministic). MATERIALIZED per step —
    * each step is read by the next; default inlining would re-evaluate
    * the whole chain per reference.
    */
  private def lpStep(prev: String): String =
    s"""SELECT soul, lab FROM (
          SELECT n.v AS soul, p.lab,
                 ROW_NUMBER() OVER (PARTITION BY n.v
                   ORDER BY COUNT(*) DESC, p.lab) AS rn
          FROM und n JOIN $prev p ON p.soul = n.u
          GROUP BY n.v, p.lab) WHERE rn = 1"""

  val oracles: Map[String, String] = Map(
    "graph_pagerank_general" ->
      s"""WITH RECURSIVE pr_edges AS (
            SELECT src, dst FROM (
              SELECT src, dst,
                     ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
              FROM (SELECT DISTINCT
                      'order:' || CAST(l_orderkey AS VARCHAR) AS src,
                      'part:' || CAST(l_partkey AS VARCHAR) AS dst
                    FROM lineitem))
            WHERE rn <= 4),
          verts AS (
            SELECT DISTINCT soul FROM (
              SELECT src AS soul FROM pr_edges
              UNION ALL SELECT dst FROM pr_edges)),
          deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
                  FROM pr_edges GROUP BY src),
          dd AS (SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i
                 FROM (SELECT DISTINCT d FROM deg)),
          fold AS (
            SELECT i, d AS l FROM dd WHERE i = 1
            UNION ALL
            SELECT dd.i, lcm(fold.l, dd.d) FROM fold JOIN dd ON dd.i = fold.i + 1),
          lv AS (SELECT CAST(l AS BIGINT) AS l FROM fold ORDER BY i DESC LIMIT 1),
          spows AS (
            SELECT 0 AS k, CAST(1 AS BIGINT) AS s
            UNION ALL
            SELECT k + 1, CAST(s * 20 * (SELECT l FROM lv) AS BIGINT)
            FROM spows WHERE k < 4),
          we AS (SELECT e.src, e.dst, (SELECT l FROM lv) / d.d AS w
                 FROM pr_edges e JOIN deg d ON d.src = e.src),
          r0 AS (SELECT soul, CAST(1 AS BIGINT) AS n FROM verts),
          r1 AS (${prStepW("r0", 0)}),
          r2 AS (${prStepW("r1", 1)}),
          r3 AS (${prStepW("r2", 2)}),
          r4 AS (${prStepW("r3", 3)}),
          r5 AS (${prStepW("r4", 4)})
          SELECT soul, n AS rank_q FROM r5""",
    "graph_pagerank" ->
      s"""WITH pr_edges AS (
            SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS src,
                   'cust:' || CAST(o_custkey AS VARCHAR) AS dst FROM orders
            UNION ALL
            SELECT 'cust:' || CAST(c_custkey AS VARCHAR),
                   'nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
            UNION ALL
            SELECT 'nation:' || CAST(n_nationkey AS VARCHAR),
                   'region:' || CAST(n_regionkey AS VARCHAR) FROM nation),
          verts AS (
            SELECT DISTINCT soul FROM (
              SELECT src AS soul FROM pr_edges
              UNION ALL SELECT dst FROM pr_edges)),
          r0 AS (SELECT soul, CAST(1 AS BIGINT) AS n FROM verts),
          r1 AS (${prStep("r0", 1L)}),
          r2 AS (${prStep("r1", 20L)}),
          r3 AS (${prStep("r2", 400L)}),
          r4 AS (${prStep("r3", 8000L)}),
          r5 AS (${prStep("r4", 160000L)})
          SELECT soul, n AS rank_q FROM r5""",
    "graph_components" ->
      """WITH members AS (
           SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS soul,
                  r_regionkey AS rk FROM region
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), n_regionkey FROM nation
           UNION ALL
           SELECT 'cust:' || CAST(c_custkey AS VARCHAR), n_regionkey
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           UNION ALL
           SELECT 'order:' || CAST(o_orderkey AS VARCHAR), n_regionkey
           FROM orders JOIN customer ON o_custkey = c_custkey
                       JOIN nation ON c_nationkey = n_nationkey)
         SELECT MIN(soul) AS component_rep, COUNT(*) AS component_size
         FROM members GROUP BY rk""",
    "graph_reach_asia" ->
      """SELECT 'region:2' AS soul, CAST(0 AS BIGINT) AS hops
         UNION ALL
         SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 1
         FROM nation WHERE n_regionkey = 2
         UNION ALL
         SELECT 'cust:' || CAST(c_custkey AS VARCHAR), 2
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE n_regionkey = 2
         UNION ALL
         SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 3
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         WHERE n_regionkey = 2""",
    "graph_label_prop" ->
      s"""WITH dedges AS (
            SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS src,
                   'cust:' || CAST(o_custkey AS VARCHAR) AS dst FROM orders
            UNION ALL
            SELECT 'cust:' || CAST(c_custkey AS VARCHAR),
                   'nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
            UNION ALL
            SELECT 'nation:' || CAST(n_nationkey AS VARCHAR),
                   'region:' || CAST(n_regionkey AS VARCHAR) FROM nation),
          und AS (SELECT src AS v, dst AS u FROM dedges
                  UNION SELECT dst, src FROM dedges),
          verts AS (SELECT DISTINCT v AS soul FROM und),
          l0 AS (SELECT soul, soul AS lab FROM verts),
          l1 AS MATERIALIZED (${lpStep("l0")}),
          l2 AS MATERIALIZED (${lpStep("l1")}),
          l3 AS MATERIALIZED (${lpStep("l2")}),
          l4 AS MATERIALIZED (${lpStep("l3")})
          SELECT lab AS community, COUNT(*) AS n_members FROM l4 GROUP BY lab"""
  )
}
