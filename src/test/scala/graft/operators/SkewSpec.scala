package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of the big side hits one hot key.
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("key", "name")
    val plain = big.join(small, "key")
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", factor = 8, bigSaltCol = Some("v"))
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.count(_.head == "hot") == 900)
  }

  test("salted join's exchange partitions on (key, salt), not key alone") {
    // the production call site (doc_ngram_jaccard's per-doc count joins)
    // returns through an eager checkpoint, so its plan is only visible
    // here: the shuffle key must include __salt — that's the whole point
    // (a hot key spreads over `factor` partitions instead of one).
    val big = (1 to 1000).map(i => ("hot", i)).toDF("key", "v")
    val small = Seq(("hot", "H")).toDF("key", "name")
    val joined = Skew.saltedJoin(big, small, "key", factor = 8, bigSaltCol = Some("v"))
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salted exchange in plan:\n$plan")
  }

  test("salt values actually spread the hot key across buckets") {
    val big = (1 to 1000).map(i => ("hot", i)).toDF("key", "v")
    val salts = big
      .withColumn("__salt", pmod(xxhash64(col("key"), col("v")), lit(8)).cast("int"))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts == 8)
  }
}
