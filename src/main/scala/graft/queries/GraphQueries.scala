package graft.queries

import graft.graph.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX analytics queries over the relation-cell graph
  * (order→customer→nation→region). CC and BFS have exact SQL oracles
  * because this graph is a forest rooted at regions. PageRank is also
  * oracle-checked: every non-sink vertex here has out-degree exactly 1, so
  * GraphX's (unnormalized) pagerank recurrence (rank = 0.15 + 0.85·Σ
  * incoming, init 1.0) unrolls into plain SQL. Output quantization uses
  * the recurrence's OWN exact lattice: 0.15 = 3/20 and 0.85 = 17/20, so
  * after t iterations every achievable rank is an exact multiple of 20^-t
  * — rank·20⁵ is a true integer, and round() of either engine's double
  * (noise ≪ 0.5) recovers it identically. (A decimal grid like
  * floor(rank·10⁴) would NOT work: achievable ranks are finite decimals
  * that land exactly ON that grid's boundaries, and one did at sf0.01.)
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

    // PageRank over the forward graph — GraphX, output in exact-lattice
    // units of 20^-5 (see class doc for why this is oracle-exact).
    "graph_pagerank" -> ((s, dir) =>
      Analytics.pageRank(s, edges(s, dir), iters = 5)
        .select(col("soul"),
          round(col("rank") * (20L * 20 * 20 * 20 * 20)).cast("long").as("rank_q")))
  )

  /** One power-iteration step of the staticPageRank recurrence in SQL:
    * rank = 0.15 + 0.85 · Σ_{u→v} prev(u) (every src has out-degree 1 in
    * this graph, so the 1/outdeg edge weight is 1).
    */
  private def prStep(prev: String): String =
    s"""SELECT v.soul, 0.15 + 0.85 * COALESCE(m.s, 0.0) AS rank
        FROM verts v LEFT JOIN (
          SELECT e.dst AS soul, SUM(p.rank) AS s
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
          r0 AS (SELECT soul, CAST(1.0 AS DOUBLE) AS rank FROM verts),
          r1 AS (${prStep("r0")}),
          r2 AS (${prStep("r1")}),
          r3 AS (${prStep("r2")}),
          r4 AS (${prStep("r3")}),
          r5 AS (${prStep("r4")})
          SELECT soul, CAST(round(rank * 3200000) AS BIGINT) AS rank_q FROM r5""",
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
