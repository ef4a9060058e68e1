package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot values (the
  * "one viral soul / one boilerplate shingle" case from SCALE.md).
  *
  * AQE's skew-join handles most cases at runtime; [[saltedJoin]] is the
  * explicit form for when the skew is known in advance or AQE is
  * unavailable (e.g. inside a streaming foreachBatch): the big side gets a
  * deterministic salt in [0, factor), the small side is replicated once
  * per salt value, and the join key becomes (key, salt) — a hot key's rows
  * spread over `factor` shuffle partitions instead of one.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted with `factor` buckets.
    * Result equals the plain inner join (salting only re-partitions work).
    * The big side's salt is xxhash64(key, disambiguator): pass `bigSaltCol`
    * (e.g. a row id) for replay-deterministic partitioning; without it a
    * monotonic id distributes correctly but partition assignment varies
    * across replays (results are unaffected either way).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int,
      bigSaltCol: Option[String] = None): DataFrame = {
    val saltSrc = bigSaltCol.map(col).getOrElse(monotonically_increasing_id())
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), saltSrc), lit(factor)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
