package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Runnable evidence for the SCALE.md co-location claim: a join between
  * two tables bucketed on the join key (same bucket count) plans with
  * ZERO shuffle exchanges under the join — each task reads bucket i of
  * both sides. At 100 TB this converts the fact-fact join from a
  * full-corpus exchange (the single most expensive wire event in the
  * plan) into a local merge per bucket; the one-time bucketed write is
  * amortized across every downstream join on that key.
  */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val db = "graft_bucketdb"

  private def descend(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan +: descend(a.executedPlan)
    case q: QueryStageExec        => q.plan +: descend(q.plan)
    case other                    => other.children.flatMap(c => c +: descend(c))
  }

  test("bucketed-by-key join: no shuffle under the join, same result") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/$db'")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_b")

    // disable broadcast so the join is the co-located sort-merge shape a
    // fact-fact join takes at scale (neither side fits an executor)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), col("l_quantity"))
      val n = joined.count()
      assert(n === lineitem.count()) // every lineitem has its order

      val plan = joined.queryExecution.executedPlan
      val all = plan +: descend(plan)
      val joins = all.collect {
        case j: SortMergeJoinExec   => j: SparkPlan
        case j: ShuffledHashJoinExec => j: SparkPlan
      }
      assert(joins.nonEmpty, "expected a non-broadcast join in the plan")
      val shufflesUnderJoin = joins.flatMap(descend).collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shufflesUnderJoin.isEmpty,
        "bucketed join must not shuffle either side")

      // cross-check against the plain (shuffling) join on the raw files
      val expected = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").cast("long").as("q"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.groupBy("o_orderpriority")
        .agg(sum("l_quantity").cast("long").as("q"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
      spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    }
  }
}
