package graft.graph

import graft.SparkSuite

class AnalyticsSpec extends SparkSuite {

  // two components: {a,b,c} and {x,y}
  private lazy val edges = {
    import spark.implicits._
    Seq(("a", "r", "b"), ("b", "r", "c"), ("x", "r", "y"))
      .toDF("src", "field", "dst")
  }

  test("connected components with lexicographic representative") {
    val cc = Analytics.connectedComponents(spark, edges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cc == Set(("a", 3L), ("x", 2L)))
  }

  test("reachability hop counts along edge direction") {
    val reach = Analytics.reachable(spark, edges, Set("a"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(reach == Set(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("pagerank produces a rank per vertex") {
    val pr = Analytics.pageRank(spark, edges, iters = 5).collect()
    assert(pr.length == 5 && pr.forall(_.getDouble(1) > 0))
  }

  test("triangle counts: one triangle plus a dangling edge") {
    import spark.implicits._
    // triangle a-b-c (mixed edge directions — must canonicalize to
    // undirected) plus pendant edge c-d: a,b,c in 1 triangle, d in none
    val tri = Seq(("a", "r", "b"), ("c", "r", "b"), ("a", "r", "c"),
      ("c", "r", "d")).toDF("src", "field", "dst")
    val counts = Analytics.triangleCounts(spark, tri)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(counts == Set(("a", 1L), ("b", 1L), ("c", 1L)))
  }
}
