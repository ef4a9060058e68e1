package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Graph-family headroom probe (round-8 scale evidence): times the
  * GraphX legs — lattice pagerank (forest), lattice pagerank on the
  * general order→part graph, and connected components — at whatever
  * SPARK_GRAFT_SF_DIR points to, and verifies the lattice's Long
  * headroom CLAIM against the measured numerators: the structural
  * degree cap keeps (20·L)^5 ≤ 240^5, so max(rank_q) · headroom_factor
  * must stay far from Long.MaxValue at ANY sf. Reports wall seconds,
  * |V|/|E|, out-degree max + lcm, max numerator, the measured headroom
  * factor (Long.MaxValue / max rank_q), and JVM peak heap — the GraphX
  * memory behavior the sf3+ run is after.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf3 runMain graft.GraphProbe
  * (SPARK_GRAFT_GRAPH_FILE overrides the GRAPH_PROBE.json output path).
  */
object GraphProbe {

  private def peakHeapMb: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .sum / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_GRAPH_FILE", "GRAPH_PROBE.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shuffle-write volume per leg (plan property — stable on this noisy
    // VM, unlike wall; same discipline as ShuffleProbe)
    val shufRecs = new AtomicLong(0L)
    val shufBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // optional leg selection: `runMain graft.GraphProbe leg1 leg2` probes
    // only the named legs (a dup-pair-only probe at a scale where the
    // relational tables were not generated must not touch them — edge
    // builds are by-name lazy below)
    val only = args.toSet

    // the same edge constructions the declared queries use
    lazy val forestEdges = queries.GunQueries.relationCells(spark, sfDir)
      .select(col("soul").as("src"), col("field"), col("dst"))
    lazy val generalEdges = {
      import org.apache.spark.sql.expressions.Window
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(
          concat(lit("order:"), col("l_orderkey").cast("string")).as("src"),
          concat(lit("part:"), col("l_partkey").cast("string")).as("dst"))
        .distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("dst"))))
        .filter(col("rn") <= 4)
        .select(col("src"), lit("has_part").as("field"), col("dst"))
    }

    def leg(name: String, edges: org.apache.spark.sql.DataFrame,
            kind: String): String = {
      val nE = edges.count()
      val degStats = edges.groupBy("src").agg(count(lit(1)).as("d"))
        .agg(max(col("d")).as("dmax"), countDistinct(col("src")).as("nsrc"))
        .first()
      val dmax = degStats.getLong(0)
      shufRecs.set(0L); shufBytes.set(0L)
      val (res, sec) = timed {
        val df = kind match {
          case "pagerank" => graph.Analytics.pageRankLattice(spark, edges, iters = 5)
          case "label_prop" => graph.Analytics.labelPropagation(spark, edges, iters = 4)
          case "triangles" => graph.Analytics.triangleCounts(spark, edges)
          case "triangles_wedge" => graph.Analytics.triangleCountsWedge(spark, edges)
          case _ => graph.Analytics.connectedComponents(spark, edges)
        }
        if (kind == "pagerank")
          df.agg(count(lit(1)), max(col("rank_q"))).first()
        else if (kind == "label_prop")
          // the declared query's terminal shape: community histogram
          df.groupBy(col("lab")).agg(count(lit(1)).as("n"))
            .agg(count(lit(1)), max(col("n"))).first()
        else if (kind.startsWith("triangles"))
          // triangleCounts returns only vertices in >=1 triangle, so a
          // triangle-free graph yields max(...) = null — coalesce to 0
          df.agg(count(lit(1)), coalesce(max(col("n_triangles")), lit(0L))).first()
        else df.agg(count(lit(1)), lit(0L)).first()
      }
      Thread.sleep(1000) // listener events drain async after the last task
      val nV = res.getLong(0)
      val maxQ = res.getLong(1)
      val headroom =
        if (kind == "pagerank" && maxQ > 0) Long.MaxValue / maxQ else 0L
      val sMb = shufBytes.get / 1024 / 1024.0
      println(f"[graph-probe] $name: edges=$nE out=$nV dmax=$dmax " +
        f"sec=$sec%.1f max_q=$maxQ headroom=${headroom}x " +
        f"shuffle_recs=${shufRecs.get} shuffle_mb=$sMb%.1f peak_heap=${peakHeapMb}MB")
      s""""$name":{"edges":$nE,"vertices_out":$nV,"out_degree_max":$dmax,""" +
        s""""sec":${f"$sec%.1f"},"max_rank_q":$maxQ,"long_headroom_x":$headroom,""" +
        s""""shuffle_records":${shufRecs.get},"shuffle_mb":${f"$sMb%.1f"}}"""
    }

    // VERDICT_r12 Missing #4: the dedup end-products' input — the
    // MinHash-LSH candidate-pair graph backing doc_dup_clusters /
    // doc_dup_triangles. Its density is set by the corpus's duplicate
    // structure (gen_sf: 3% exact + 7% near dups) plus band collisions,
    // the one graph input the gen_sf sweep didn't exercise; the guard
    // rails are Dedup.DefaultMaxBucket (band side) and the edge list
    // itself (one row per candidate pair, doc_a < doc_b canonical).
    lazy val dupEdges = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.operators.Dedup.minhashCandidates(
        graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text"))
        .select(
          concat(lit("d"), lpad(col("doc_a").cast("string"), 9, "0")).as("src"),
          lit("dup").as("field"),
          concat(lit("d"), lpad(col("doc_b").cast("string"), 9, "0")).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    val legs: Seq[(String, () => String)] = Seq(
      ("pagerank_forest", () => leg("pagerank_forest", forestEdges, "pagerank")),
      ("pagerank_general", () => leg("pagerank_general", generalEdges, "pagerank")),
      ("components", () => leg("components", forestEdges, "components")),
      // VERDICT_r10 #4: the bench's most expensive query — 4-step
      // synchronous LPA over the undirected relation graph, terminal
      // histogram agg exactly as graph_label_prop declares it.
      ("label_prop", () =>
        leg("label_prop", forestEdges.select(col("src"), col("dst")), "label_prop")),
      // the two dedup end-product legs (doc_dup_clusters /
      // doc_dup_triangles terminal shapes over the same edge build)
      ("dup_pair_components", () =>
        leg("dup_pair_components", dupEdges, "components")),
      // keep `field`: triangleCounts goes through fromEdges, which reads
      // (src, field, dst) — dropping it was an AnalysisException found on
      // this leg's first real run
      ("dup_pair_triangles", () =>
        leg("dup_pair_triangles", dupEdges, "triangles")),
      // A/B: the degree-oriented DataFrame wedge join — wins on sparse
      // graphs, loses 3.7× on the dup graph's near-clique families
      // (it must materialize every triangle; SCALE_r13 §3a)
      ("dup_pair_triangles_wedge", () =>
        leg("dup_pair_triangles_wedge", dupEdges, "triangles_wedge")))
    val unknown = only -- legs.map(_._1).toSet
    require(unknown.isEmpty,
      s"unknown leg name(s): ${unknown.mkString(", ")} — valid: ${legs.map(_._1).mkString(", ")}")
    val parts = legs.filter(l => only.isEmpty || only(l._1)).map(_._2())
    require(parts.nonEmpty, "no legs selected")
    val json = s"""{"sf_dir":"$sfDir","cpus":$cpus,""" +
      parts.mkString(",") + s""","peak_heap_mb":$peakHeapMb}"""
    println(json)
    try Files.writeString(Paths.get(outFile), json)
    catch { case e: Exception => System.err.println(s"[graph-probe] write failed: $e") }
    spark.stop()
  }
}
