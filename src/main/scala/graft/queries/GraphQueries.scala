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
  * integer arithmetic is order-free at any scale.
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
      Analytics.pageRankLattice(s, edges(s, dir), iters = 5))
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

  val oracles: Map[String, String] = Map(
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
         WHERE n_regionkey = 2"""
  )
}
