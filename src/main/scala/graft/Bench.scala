package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. One JSON line on stdout + `bench_out.json`.
  *
  * Round-5 methodology (see BENCH_STABILITY.md): the round-4 suite ran all
  * queries in one SparkContext and min-of-3 did NOT isolate them — residual
  * ContextCleaner backlog (localCheckpoint blocks released only after GC),
  * shuffle-file cleanup, and block-manager pressure from earlier queries
  * inflated unchanged trivial plans by up to 40x (doc_fingerprint 8.98 s
  * in-suite vs 0.22 s isolated, judge-measured, same build). Fix, default ON:
  *   1. per-query CONTEXT ISOLATION — each query gets a fresh SparkContext
  *      (same JVM), so no cross-query cached blocks, shuffle files, or
  *      cleaner backlog can leak into its timed window; and
  *   2. a QUIESCE between repeats — unpersist + System.gc() polling until
  *      the ContextCleaner has drained every persistent RDD, outside the
  *      timed region.
  * JIT/code-cache state intentionally stays shared (a long-lived session
  * user has a warm JIT too; min-of-n absorbs compile cost).
  *
  * Both the FIRST run and the min-of-n are reported per query
  * ("queries_first" / "queries") so cross-round comparisons can separate
  * methodology from plan changes: first-run is the cold number comparable
  * to rounds 1-3, min-of-n is the plan-cost signal used for "value".
  * SPARK_GRAFT_ISOLATE=0 restores the round-4 shared-context mode.
  */
object Bench {
  /** Per-query shuffle-write tally (VERDICT_r14 #6): shuffle records/bytes
    * are PLAN properties — stable across repeats while wall time swings up
    * to 1.8x with box noise (BENCH_STABILITY.md) — so recording them next
    * to each query's wall seconds makes a plan regression separable from a
    * noisy box at a glance. Registered per fresh context; snapshots are
    * best-effort (the listener bus is async — `stable()` polls until two
    * consecutive reads agree, which the post-query quiesce makes near-
    * certain) and telemetry-only, never a gate.
    */
  private final class ShuffleTally
      extends org.apache.spark.scheduler.SparkListener {
    private val recs = new java.util.concurrent.atomic.AtomicLong
    private val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { recs.set(0L); bytes.set(0L) }
    def stable(): (Long, Long) = {
      var prev = (recs.get(), bytes.get())
      var tries = 0
      while (tries < 20) {
        Thread.sleep(50)
        val cur = (recs.get(), bytes.get())
        if (cur == prev) return cur
        prev = cur; tries += 1
      }
      prev
    }
  }

  def newSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Unpersist everything and wait for the ContextCleaner to actually drain.
    * localCheckpoint blocks are freed only after their RDD handles are
    * garbage-collected, so a plain unpersist sweep leaves cleaner work
    * queued that lands inside the NEXT query's timed window.
    */
  def quiesce(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    var tries = 0
    while (spark.sparkContext.getPersistentRDDs.nonEmpty && tries < 50) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "bench_out.json")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt max 1
    val isolate = sys.env.getOrElse("SPARK_GRAFT_ISOLATE", "1") != "0"
    // SPARK_GRAFT_PASSES=n runs the WHOLE suite n times (suite-level
    // stability check; only meaningful with SPARK_GRAFT_ISOLATE=0).
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt max 1
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }

    var spark = newSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    var tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    // Warm the JVM/codegen paths so the first measured query doesn't pay
    // one-time session machinery.
    spark.range(1000).selectExpr("sum(id)").collect()

    // per query -> shuffle write (records, bytes) from the query's FIRST
    // repeat — a plan-cost signal, not a timing (see ShuffleTally)
    val shuffles = scala.collection.mutable.Map[String, (Long, Long)]()
    // per query -> (firstRun, minOfN)
    val perPass = (1 to passes).map { _ =>
      selected.map { case (name, fn) =>
        if (isolate) {
          // Fresh context per query: nothing from the previous query's
          // lifetime (cached blocks, shuffle files, cleaner queue) exists.
          spark.stop()
          spark = newSession(cpus)
          spark.sparkContext.setLogLevel("WARN")
          tally = new ShuffleTally
          spark.sparkContext.addSparkListener(tally)
        }
        val times = (1 to repeat).zipWithIndex.map { case (_, i) =>
          // drain the async listener bus before resetting (ADVICE_r15):
          // stage-completed events from the warmup query or a previous
          // query's later repeats can otherwise land AFTER reset() and
          // pollute this query's first-repeat tally; stable() polls until
          // the counters stop moving, which empties the in-flight queue
          if (i == 0) { tally.stable(); tally.reset() }
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          val elapsed = (System.nanoTime() - t0) / 1e9
          quiesce(spark) // outside the timed region: measure the query, not GC
          if (i == 0 && !shuffles.contains(name)) shuffles(name) = tally.stable()
          elapsed
        }
        name -> ((times.head, times.min))
      }
    }
    val byName = perPass.flatten.groupBy(_._1)
    val firsts = byName.map { case (k, vs) => k -> vs.map(_._2._1).min }
    val results = byName.map { case (k, vs) => k -> vs.map(_._2._2).min }
    def jsonMap(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val passTotals = perPass.map(_.map(_._2._2).sum)
    val passesJson =
      if (passes > 1) s""","passes":${passTotals.mkString("[", ",", "]")}""" else ""
    val mode = if (isolate) "context-per-query" else "shared-context"
    // provenance: who ran this record and on what tree (ADVICE_r10 —
    // builder-committed and judge-overwritten runs were otherwise
    // indistinguishable in the artifact)
    val who = sys.env.getOrElse("SPARK_GRAFT_BENCH_WHO", "builder")
    val commit = {
      import scala.sys.process._
      try Seq("git", "rev-parse", "--short", "HEAD").!!.trim
      catch { case _: Exception => "unknown" }
    }
    def jsonLongMap(m: scala.collection.Map[String, Long]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val shufRecs = shuffles.map { case (k, v) => k -> v._1 }
    val shufBytes = shuffles.map { case (k, v) => k -> v._2 }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results)},"queries_first":${jsonMap(firsts)},"shuffle_records":${jsonLongMap(shufRecs)},"shuffle_bytes":${jsonLongMap(shufBytes)},"repeat":$repeat,"isolation":"$mode","sf":"$sfDir","provenance":"$who@$commit"$passesJson}"""
    // newline-terminated: line-oriented tooling (wc -l, tail, jq -c
    // pipelines) miscounts a file whose last line has no terminator
    try Files.writeString(Paths.get(outFile), json + "\n")
    catch { case e: Exception => System.err.println(s"[bench] file write failed: $e") }
    // Stop Spark BEFORE the stdout emit so no shutdown chatter can follow it:
    // the driver parses the process's LAST stdout line as JSON (sbt's
    // "[success]" trailer is separately suppressed via showSuccess in
    // build.sbt). That last line must also FIT the driver's ~2.2 KB stdout
    // tail window — the full 81-query map is ~4.8 KB and truncates mid-line
    // (BENCH_r08 "parsed": null), so stdout gets a COMPACT summary and the
    // full per-query record lives in `outFile` (committed as bench_out.json).
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"repeat":$repeat,"isolation":"$mode","sf":"$sfDir","detail":"$outFile"}"""
    spark.stop()
    println(compact)
  }
}
