package graft.queries

import graft.functions.GunFunctions
import graft.operators.HamMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's graph/CRDT operator surface (SURVEY §2 Part A) expressed
  * over the driver test tables, each with a DuckDB-oracle SQL equivalent.
  *
  * The `events` table maps onto the gun cell model deterministically:
  * soul = 'u'<user_id>, field = event_type, value = props (string value),
  * state = epoch micros of ts — one cell per event, exactly the shape of the
  * reference's storage relation (gun/storage.go:40-45). The star-schema
  * foreign keys map onto relation cells (edges), mirroring gun's
  * field-as-edge model (gun/node.go:149-159).
  */
object GunQueries {

  /** events → gun cells with the engine's GunValue struct. */
  def eventCells(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("u"), col("user_id").cast("string")).as("soul"),
      col("event_type").as("field"),
      GunFunctions.gunString(col("props")).as("value"),
      col("state_us").cast("double").as("state"),
      lit(true).as("valueExists"))

  private val eventCellsSql =
    "SELECT 'u' || CAST(user_id AS VARCHAR) AS soul, event_type AS field, " +
      "props AS value, epoch_us(ts) AS state_us FROM events"

  /** Star-schema FKs → relation cells: order→customer→nation→region. */
  def relationCells(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.tbl(spark, dir, "orders").select(
      concat(lit("order:"), col("o_orderkey")).as("soul"),
      lit("customer").as("field"),
      concat(lit("cust:"), col("o_custkey")).as("dst"))
    val c = Tables.tbl(spark, dir, "customer").select(
      concat(lit("cust:"), col("c_custkey")).as("soul"),
      lit("nation").as("field"),
      concat(lit("nation:"), col("c_nationkey")).as("dst"))
    val n = Tables.tbl(spark, dir, "nation").select(
      concat(lit("nation:"), col("n_nationkey")).as("soul"),
      lit("region").as("field"),
      concat(lit("region:"), col("n_regionkey")).as("dst"))
    o.unionByName(c).unionByName(n)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A10: HAM merge — winner per (soul, field) by (state, canonical json).
    // Runs the real engine operator (single shuffle, map-side partial agg).
    "gun_ham_merge" -> ((s, dir) => {
      HamMerge.mergeSnapshot(eventCells(s, dir))
        .select(col("soul"), col("field"), col("value.str").as("value"),
          col("state").cast("long").as("state_us"))
    }),

    // Node view (gun/node.go:25-30): fields of each soul, pivoted.
    "gun_node_summary" -> ((s, dir) => {
      eventCells(s, dir)
        .groupBy("soul")
        .agg(
          countDistinct(col("field")).as("n_fields"),
          array_join(array_sort(collect_set(col("field"))), ",").as("fields"),
          max(col("state")).cast("long").as("max_state_us"))
    }),

    // A1/A2: path navigation order/customer/nation/region — soul resolution
    // as a join chain over the cell relation (broadcast: dims are small).
    "gun_path_read" -> ((s, dir) => {
      val cells = relationCells(s, dir)
      val step1 = cells.filter(col("field") === "customer")
        .select(col("soul"), col("dst").as("s1"))
      val step2 = cells.filter(col("field") === "nation")
        .select(col("soul").as("s1"), col("dst").as("s2"))
      val step3 = cells.filter(col("field") === "region")
        .select(col("soul").as("s2"), col("dst").as("s3"))
      step1
        .join(broadcast(step2), "s1")
        .join(broadcast(step3), "s2")
        .select(col("soul"), col("s3").as("region_soul"))
    }),

    // Edge/degree view over the relation cells.
    "gun_degree" -> ((s, dir) => {
      relationCells(s, dir)
        .groupBy(col("dst").as("soul"))
        .agg(count(lit(1)).as("in_degree"))
    }),

    // A13: TTL purge — retention window relative to the newest state. The
    // cutoff is a scalar subquery (1-row broadcast), not a driver-side
    // action: the whole query stays one lazy plan.
    "gun_ttl_purge" -> ((s, dir) => {
      val cells = eventCells(s, dir)
      val mx = cells.agg(max(col("state")).as("mx_state"))
      cells.crossJoin(broadcast(mx))
        .filter(col("state") >= col("mx_state") - 7.0 * 3600 * 1e6)
        .groupBy("field").agg(count(lit(1)).as("n_kept"))
    }),

    // A11: deferred-future split at a fixed sysState (batch form).
    "gun_deferred_split" -> ((s, dir) => {
      val sysUs = 1.7215E15 // fixed mid-range sysState, micros
      eventCells(s, dir)
        .groupBy("field")
        .agg(
          sum(when(col("state") <= sysUs, 1L).otherwise(0L)).as("n_now"),
          sum(when(col("state") > sysUs, 1L).otherwise(0L)).as("n_deferred"))
    }),

    // A14: TrackingRequested ingest policy — only keys already in the store
    // survive (left-semi). Store = even event_ids, incoming = odd.
    "gun_tracking_requested" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val store = ev.filter(col("event_id") % 2 === 0).select(
        concat(lit("u"), col("user_id").cast("string")).as("soul"),
        col("event_type").as("field")).distinct()
      val incoming = ev.filter(col("event_id") % 2 === 1).select(
        concat(lit("u"), col("user_id").cast("string")).as("soul"),
        col("event_type").as("field"))
      HamMerge.applyTracking(store, incoming, HamMerge.TrackingRequested)
        .groupBy("field").agg(count(lit(1)).as("n_merged"))
    }),

    // A6: per-subscription dedupe — suppress consecutive identical values
    // per (soul, field) in state order (gun/scoped_fetch.go:173-178).
    "gun_dedupe_sub" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("soul"), col("field"))
        .orderBy(col("state_us"), col("event_id"))
      Tables.events(s, dir)
        .select(
          concat(lit("u"), col("user_id").cast("string")).as("soul"),
          col("event_type").as("field"),
          col("props").as("value"),
          col("state_us"),
          col("event_id"))
        .withColumn("emit", coalesce(col("value") =!= lag(col("value"), 1).over(w), lit(true)))
        .groupBy("soul", "field")
        .agg(sum(when(col("emit"), 1L).otherwise(0L)).as("n_emitted"),
          count(lit(1)).as("n_total"))
    }),

    // A10 tiebreak path: states coarsened to days force same-state conflicts;
    // winner decided by canonical-JSON byte order (gun/state.go:68-78).
    "gun_lww_tiebreak" -> ((s, dir) => {
      val cells = eventCells(s, dir)
        .withColumn("state", floor(col("state") / 8.64e10).cast("double"))
      HamMerge.mergeSnapshot(cells)
        .select(col("soul"), col("field"), col("state").cast("long").as("day"),
          col("value.str").as("value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "gun_ham_merge" ->
      s"""SELECT soul, field, value, state_us FROM (
          SELECT soul, field, value, state_us,
                 row_number() OVER (PARTITION BY soul, field
                                    ORDER BY state_us DESC, value DESC) AS rn
          FROM ($eventCellsSql)) WHERE rn = 1""",
    "gun_node_summary" ->
      s"""SELECT soul, COUNT(DISTINCT field) AS n_fields,
                 string_agg(DISTINCT field, ',' ORDER BY field) AS fields,
                 MAX(state_us) AS max_state_us
          FROM ($eventCellsSql) GROUP BY soul""",
    "gun_path_read" ->
      """SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS soul,
                'region:' || CAST(n_regionkey AS VARCHAR) AS region_soul
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey""",
    "gun_degree" ->
      """SELECT soul, COUNT(*) AS in_degree FROM (
           SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS soul FROM orders
           UNION ALL
           SELECT 'nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
           UNION ALL
           SELECT 'region:' || CAST(n_regionkey AS VARCHAR) FROM nation
         ) GROUP BY soul""",
    "gun_ttl_purge" ->
      s"""SELECT field, COUNT(*) AS n_kept FROM ($eventCellsSql)
          WHERE state_us >= (SELECT MAX(epoch_us(ts)) FROM events) - 7.0*3600*1e6
          GROUP BY field""",
    "gun_deferred_split" ->
      s"""SELECT field,
                 CAST(SUM(CASE WHEN state_us <= 1.7215e15 THEN 1 ELSE 0 END) AS BIGINT) AS n_now,
                 CAST(SUM(CASE WHEN state_us >  1.7215e15 THEN 1 ELSE 0 END) AS BIGINT) AS n_deferred
          FROM ($eventCellsSql) GROUP BY field""",
    "gun_tracking_requested" ->
      """SELECT field, COUNT(*) AS n_merged FROM (
           SELECT 'u' || CAST(user_id AS VARCHAR) AS soul, event_type AS field
           FROM events WHERE event_id % 2 = 1) i
         WHERE EXISTS (
           SELECT 1 FROM events e
           WHERE e.event_id % 2 = 0
             AND 'u' || CAST(e.user_id AS VARCHAR) = i.soul
             AND e.event_type = i.field)
         GROUP BY field""",
    "gun_dedupe_sub" ->
      """SELECT soul, field,
                CAST(SUM(CASE WHEN emit THEN 1 ELSE 0 END) AS BIGINT) AS n_emitted,
                COUNT(*) AS n_total
         FROM (
           SELECT soul, field,
                  COALESCE(value <> lag(value) OVER
                    (PARTITION BY soul, field ORDER BY state_us, event_id), TRUE) AS emit
           FROM (SELECT 'u' || CAST(user_id AS VARCHAR) AS soul,
                        event_type AS field, props AS value,
                        epoch_us(ts) AS state_us, event_id FROM events))
         GROUP BY soul, field""",
    "gun_lww_tiebreak" ->
      """SELECT soul, field, day, value FROM (
           SELECT soul, field, day, value,
                  row_number() OVER (PARTITION BY soul, field
                                     ORDER BY day DESC, value DESC) AS rn
           FROM (SELECT 'u' || CAST(user_id AS VARCHAR) AS soul,
                        event_type AS field,
                        CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                        props AS value FROM events))
         WHERE rn = 1"""
  )
}
