package graft.queries

import graft.graph.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX analytics queries over the relation-cell graph
  * (order→customer→nation→region). CC and BFS have exact SQL oracles
  * because this graph is a forest rooted at regions; PageRank is
  * iterative-fp and gets the weaker rows-only check.
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

    // PageRank over the forward graph (rows-only check: iterative fp).
    "graph_pagerank" -> ((s, dir) =>
      Analytics.pageRank(s, edges(s, dir), iters = 10)
        .select(col("soul"), col("rank")))
  )

  val oracles: Map[String, String] = Map(
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
