package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-training-pipeline surface (BASELINE.json north star): token
  * counting, quality scoring, language-ID heuristic, fingerprinting,
  * normalized-key exact dedup, and n-gram Jaccard similarity.
  *
  * All functions are Spark built-ins (codegen'd, no UDFs) with identical
  * DuckDB SQL, so every operator is oracle-checked. Scale: token ops are
  * per-row map work (no shuffle); dedup groups shuffle on the dedup key;
  * the Jaccard pair join blocks by (source, shingle) to bound the
  * candidate space — the standard blocking trick that keeps the self-join
  * from going O(n²) at 100 TB.
  */
object TextQueries {
  import Tables._

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Whitespace tokens, lowercased. */
  private def tokens(c: org.apache.spark.sql.Column) =
    split(lower(trim(c)), "\\s+")

  /** Count-min heavy hitters; `estOnly` drops the exact ride-along (its
    * truth leg is a SECOND corpus scan + probe-filtered aggregation —
    * bias-check instrumentation, not production cost).
    */
  private def countminQuery(s: SparkSession, dir: String, estOnly: Boolean): DataFrame = {
    import s.implicits._
    val h = (r: Int, c: org.apache.spark.sql.Column) =>
      conv(substring(md5(concat(lit(s"cm:$r:"), c)), 1, 15), 16, 10)
        .cast("long") % CmWidth
    val buckets = (c: org.apache.spark.sql.Column) =>
      array((0 until CmDepth).map(r => h(r, c)): _*)
    val toks = tbl(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
    val sketch = toks
      .select(posexplode(buckets(col("tok"))))
      .toDF("r", "bucket")
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val probes = CmProbes.toDF("term")
      .select(col("term"), posexplode(buckets(col("term"))))
      .toDF("term", "r", "bucket")
    val est = probes.join(sketch, Seq("r", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
    if (estOnly) est.select(col("term"), col("est_count"))
    else {
      val truth = toks.filter(col("tok").isInCollection(CmProbes))
        .groupBy(col("tok")).agg(count(lit(1)).as("true_count"))
        .withColumnRenamed("tok", "term")
      est.join(truth, Seq("term"), "left")
        .select(col("term"), col("est_count"),
          coalesce(col("true_count"), lit(0L)).as("true_count"))
    }
  }

  /** HyperLogLog distinct; `estOnly` drops the exact `countDistinct`
    * ride-along — the full-distinct shuffle the sketch exists to avoid —
    * and with it the persist (the shingle stream is then read once).
    */
  private def hllQuery(s: SparkSession, dir: String, estOnly: Boolean): DataFrame = {
    import s.implicits._
    val h = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val ex0 = tbl(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - 7),
        i => concat_ws(" ", slice(col("toks"), i, lit(8))))).as("gram"))
      .select(h(col("gram")).as("g"))
    val ex =
      if (estOnly) ex0
      else ex0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val regs = ex
      .select((col("g") % 64).as("j"), shiftright(col("g"), 6).as("w"))
      .withColumn("tz",
        length(bin(col("w"))) - length(rtrim(bin(col("w")), "0")))
      .withColumn("rank",
        when(col("w") === 0, lit(31L))
          .otherwise(least(lit(31L), lit(1L) + col("tz"))))
      .groupBy("j").agg(max(col("rank")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = (0L until 64L).map(j => regs.getOrElse(j, 0L))
    val mMax = m.max
    val sScaled = m.map(mj => 1L << (mMax - mj)).sum
    val estQ = (709L * 64 * 64 * (1L << mMax)) / sScaled
    val vZero = m.count(_ == 0L).toLong
    val estFinal =
      if (vZero > 0 && estQ < 2500L * 64) HllLinTable(vZero.toInt) else estQ
    if (estOnly)
      Seq((mMax, sScaled, estQ, vZero, estFinal))
        .toDF("m_max", "s_scaled", "est_q", "v_zero", "est_final_q")
    else {
      val nTrue = ex.agg(countDistinct(col("g"))).head.getLong(0)
      ex.unpersist(blocking = false)
      Seq((mMax, sScaled, estQ, vZero, estFinal, nTrue))
        .toDF("m_max", "s_scaled", "est_q", "v_zero", "est_final_q",
          "true_distinct")
    }
  }

  /** Bloom membership probe; `estOnly` drops the exact semi-join
    * ride-along column (bias-check only).
    */
  private def bloomQuery(s: SparkSession, dir: String, estOnly: Boolean): DataFrame = {
      val h = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      // probe positions by Kirsch-Mitzenmacher double hashing over the
      // shingle's one md5-derived 60-bit hash — pos_i = (h1 + i·h2)
      // mod m with h1 = low 30 bits, h2 = high 30 bits (independent
      // halves of the same md5) — not 4 more string md5s per shingle:
      // the md5s were ~5× the probe's per-row cost (2.9 s → the
      // CMS-class constant VERDICT_r7 #2 asked for). KM gives the fp of
      // independent hashes (measured 0.4% at 23% load, vs 1.5% for
      // naively-correlated affine mixes of one residue). All values
      // < 2^32 after the splits, so every product stays in Long range
      // on both engines (DuckDB errors on BIGINT overflow).
      // shiftright, NOT `/`: Column `/` is DOUBLE division and g exceeds
      // 2^53, so the high half would lose bits; g ≥ 0 makes >> exact
      val hb = (i: Int, g: org.apache.spark.sql.Column) =>
        ((g % lit(BloomHalf)) + lit(i.toLong) * shiftright(g, 30)
          ) % lit(BloomBits.toLong)
      // hash at TOP LEVEL, never inside the transform lambda: a
      // higher-order function's lambda body runs interpreted (outside
      // whole-stage codegen), and the per-shingle md5 was the probe's
      // dominant cost there (2.2 s → 0.6 s at sf0.1 from this hoist
      // alone). The lambda only builds the gram strings; dedupe happens
      // on the strings per doc (same set as deduped hashes), then the
      // exploded column is hashed codegen'd.
      def shingles(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"),
          explode(array_distinct(
            transform(sequence(lit(1), size(col("toks")) - 7),
              i => concat_ws(" ", slice(col("toks"), i, lit(8)))))).as("gs"))
        .select(col("doc_id"), h(col("gs")).as("g"))
      // The TEST side is the small corpus by construction (the
      // decontamination shape: eval set vs training corpus), so both its
      // Bloom bits AND its exact shingle-hash set are bounded driver-side
      // literals — bits by the filter width (16384), the exact set by the
      // test corpus size. That turns the WHOLE query into scan → map →
      // per-doc aggregate: no persist, no join, nothing shuffles but the
      // per-doc counts. (The r7 shape persisted the full corpus's shingle
      // arrays and joined probe rows to a test-set DataFrame — both
      // avoidable; VERDICT_r7 "what's wrong" #2.)
      // ONE collect for the whole test side: the distinct test-shingle
      // hashes are the only thing that must cross to the driver — the
      // filter bits are pure arithmetic over them (the same KM formula
      // the probe uses), computed driver-side. (The r8a shape persisted
      // the test shingles and ran a second collect for the bit
      // positions — a full extra job on every run for derivable data.)
      val testG = shingles(tbl(s, dir, "documents").filter(col("doc_id") < 20))
        .select(col("g")).distinct().collect().map(_.getLong(0))
      // O(1) bit test, not O(set bits): pack the 16384 bits into 256
      // longs and probe word>>offset&1 via two element_at lookups — the
      // same membership decisions as array_contains over the ~thousands
      // of set-bit positions at a flat constant. All values < 2^14, so
      // the fp division in (b / 64) is exact.
      val words = {
        val w = new Array[Long](BloomBits / 64)
        for (g <- testG; i <- 0 until BloomHashes) {
          val b = ((g % BloomHalf) + i * (g >> 30)) % BloomBits
          w((b >> 6).toInt) |= 1L << (b & 63).toInt
        }
        w
      }
      val pow2 = Array.tabulate(64)(i => 1L << i)
      val bitSet = (b: org.apache.spark.sql.Column) =>
        element_at(lit(words), (b / 64).cast("int") + 1)
          .bitwiseAND(element_at(lit(pow2), (b % 64).cast("int") + 1)) =!= lit(0L)
      val probed = shingles(tbl(s, dir, "documents").filter(col("doc_id") >= 20))
        .withColumn("maybe",
          (0 until BloomHashes)
            .map(i => bitSet(hb(i, col("g"))))
            .reduce(_ && _).cast("long"))
      // exact membership via InSet on the bounded test-set literal (the
      // same O(1) hash-set lookup class as the Bloom words) — bias-check
      // only, dropped in the est-only plan
      val res =
        if (estOnly)
          probed.groupBy("doc_id")
            .agg(count(lit(1)).as("n_shingles"),
              sum(col("maybe")).as("n_maybe"))
        else
          probed
            .withColumn("hit", col("g").isInCollection(testG).cast("long"))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_shingles"),
              sum(col("maybe")).as("n_maybe"),
              sum(col("hit")).as("n_true"))
      graft.operators.Caching.materializeAndRelease(res)
  }

  /** Histogram quantile sketch; `estOnly` drops the exact
    * order-statistic ride-along (and with it the 1x1 crossJoin).
    */
  private def quantileQuery(s: SparkSession, dir: String, estOnly: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val uh = tbl(s, dir, "documents")
        .select(size(tokens(col("text"))).cast("long").as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = uh.agg(sum(col("cnt"))).head.getLong(0)
      val ranks = QuantPermilles.map(q => q -> ((q * total + 999L) / 1000L))
      // global windows over the BOUNDED histograms only (single-partition
      // is fine at <= max-length rows — the sketch IS the shuffle payload)
      val cumU = uh.withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("n"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val cumB = uh.select(expr(s"n DIV $QuantBinW").as("bin"), col("cnt"))
        .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val estRow = cumB.agg(
        ranks.head match { case (q, r) =>
          min(when(col("cum") >= r, col("bin"))).as(s"b_$q") },
        ranks.tail.map { case (q, r) =>
          min(when(col("cum") >= r, col("bin"))).as(s"b_$q") }: _*)
      val res =
        if (estOnly)
          estRow.select(expr(s"stack(${QuantPermilles.length}, " +
            QuantPermilles.map(q =>
              s"${q}L, b_$q * $QuantBinW + ${QuantBinW - 1}")
              .mkString(", ") +
            ") as (q_permille, est_hi)"))
        else {
          val exactRow = cumU.agg(
            ranks.head match { case (q, r) =>
              min(when(col("cum") >= r, col("n"))).as(s"e_$q") },
            ranks.tail.map { case (q, r) =>
              min(when(col("cum") >= r, col("n"))).as(s"e_$q") }: _*)
          estRow.crossJoin(exactRow) // 1 row x 1 row
            .select(expr(s"stack(${QuantPermilles.length}, " +
              QuantPermilles.map(q =>
                s"${q}L, b_$q * $QuantBinW + ${QuantBinW - 1}, e_$q")
                .mkString(", ") +
              ") as (q_permille, est_hi, exact_n)"))
        }
      graft.operators.Caching.materializeAndRelease(res, uh)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + distinct tokens + chars.
    "doc_tokens" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_uniq_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"))
    }),

    // BPE-style pretokenization counting: letter runs, digit runs, and
    // single punctuation marks (the GPT-2-pretokenizer shape restricted
    // to an ASCII-safe class so Java and RE2 regex semantics coincide).
    // regexp_extract_all with group 0 matches DuckDB's default.
    "doc_tokens_bpe" -> ((s, dir) => {
      val pieces = regexp_extract_all(
        lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
      tbl(s, dir, "documents").select(
        col("doc_id"),
        size(pieces).cast("long").as("n_bpe_tokens"),
        size(array_distinct(pieces)).cast("long").as("n_uniq_bpe"))
    }),

    // REAL BPE encode — not just pretokenizer counting: the fixed merges
    // table in functions/Bpe.scala applied with the true greedy semantics
    // (lowest-rank adjacent pair first, leftmost occurrence, iterate to
    // exhaustion) produces actual token ids, the thing a training
    // pipeline feeds the model. The encode kernel runs MAP-SIDE
    // (mapPartitions with a per-partition word→ids memo — the
    // HF-tokenizers cache shape; the merges table ships in the jar, no
    // broadcast), so the corpus never shuffles for tokenization; the
    // only shuffle is the per-doc aggregation, with map-side combine.
    // The oracle replays the identical greedy loop as a DuckDB recursive
    // CTE over the distinct words, with the rank/id tables emitted from
    // the same Bpe.Merges.
    "doc_tokenize_bpe" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select(col("doc_id").cast("long"),
          explode(regexp_extract_all(lower(col("text")),
            lit("[a-z]+"), lit(0))).as("w"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val memo = scala.collection.mutable.HashMap
            .empty[String, (Long, Long, Long)]
          it.map { case (docId, w) =>
            val st = memo.getOrElseUpdate(w, {
              val ids = graft.functions.Bpe.encode(w)
              (ids.length.toLong, ids.sum, ids.max)
            })
            (docId, st._1, st._2, st._3)
          }
        }.toDF("doc_id", "n", "s", "mx")
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_ids"), sum(col("s")).as("sum_ids"),
          max(col("mx")).as("max_id"), count(lit(1)).as("n_words"))
    }),

    // Distributed BPE merges TRAINING (the other half of the tokenizer
    // story next to doc_tokenize_bpe's encode): learn the top-K merge
    // rules from the corpus by iterative weighted pair counting with a
    // deterministic argmax tiebreak — see operators/BpeTrain.scala for
    // the scale shape (loop state is the distinct-word table, one
    // corpus shuffle up front, one pair hash-agg + single-row collect
    // per iteration). The oracle replays the identical loop in DuckDB
    // as K unrolled (pairs → argmax → recursive-fold) steps.
    "doc_bpe_train" -> ((s, dir) =>
      graft.operators.BpeTrain.trainOnDocuments(
        s, tbl(s, dir, "documents"), BpeTrainK)),

    // The delta-maintained trainer (BpeTrain.trainIncremental — pair
    // counts built once, then updated only for words containing each
    // merged pair; 5.9× less shuffle at k=100, SCALE_r10 §2) declared
    // as its own query against the SAME unrolled oracle: the learned
    // table is bit-identical to the full recount's by construction
    // (BpeTrainSpec), and this row makes the driver hash-prove it.
    // NOTE (VERDICT_r10 #2): at fixture scale (31-word vocab, k=12) the
    // incremental path is OVERHEAD-BOUND — ~0.3-0.4 s slower than
    // doc_bpe_train in the bench — and that is expected, not a bug to
    // "fix": the delta maintenance only wins when the vocabulary is
    // large enough that most words don't contain the merged pair
    // (5.9× less shuffle at k=100, SCALE_r10 §2). The query is
    // declared for oracle parity of the delta path, not for speed here.
    "doc_bpe_train_inc" -> ((s, dir) =>
      graft.operators.BpeTrain.trainOnDocuments(
        s, tbl(s, dir, "documents"), BpeTrainK, incremental = true)),

    // Winnowing document fingerprints (the rolling-hash scheme used for
    // near-dup detection robust to small edits): hash every 8-char gram
    // of the whitespace-normalized text, take the min hash of each
    // 4-gram window, emit the distinct mins. Pure per-row map work —
    // explode only multiplies output rows, not shuffle input.
    //
    // The gram-hash array is MATERIALIZED as its own projection before
    // the window pass: referencing the hash expression inside the
    // window-min lambda would re-evaluate all ~L md5s per window
    // invocation (L× blow-up — observed as a multi-minute hang), while an
    // attribute reference evaluates once per row.
    "doc_winnow" -> ((s, dir) => {
      val k = 8; val w = 4
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val hash = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long") % 1000000007L
      tbl(s, dir, "documents")
        .filter(length(norm) >= k + w - 1)
        .select(col("doc_id"), norm.as("norm"))
        // the corpus arrives as few file splits but the gram hashing is
        // the heaviest per-row map work in the suite — spread it across
        // all cores (tiny shuffle of (id, text) rows, big parallelism win)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          transform(sequence(lit(1), length(col("norm")) - (k - 1)),
            i => hash(col("norm").substr(i, lit(k)))).as("grams"))
        // projection boundary holds: CollapseProject won't inline a
        // non-cheap expression referenced more than once (size + slice)
        .select(col("doc_id"),
          transform(sequence(lit(1), size(col("grams")) - (w - 1)),
            j => array_min(slice(col("grams"), j, lit(w)))).as("mins"))
        .select(col("doc_id"), explode(array_distinct(col("mins"))).as("fp"))
    }),

    // Quality scoring: length, mean token length, stopword ratio,
    // type-token ratio — all exact-integer-derived doubles.
    "doc_quality" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopArr = array(stopEn.map(lit): _*)
      val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        nTok.as("n_tokens"),
        (length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok)
          .as("mean_token_len"),
        (nStop.cast("double") / nTok).as("stopword_ratio"),
        (size(array_distinct(toks)).cast("double") / nTok).as("type_token_ratio"))
    }),

    // Language-ID heuristic: argmax of per-language marker-word hits.
    // (Deterministic CASE cascade; markers chosen per language.)
    "doc_lang_guess" -> ((s, dir) => {
      val toks = tokens(col("text"))
      def hits(words: Seq[String]) =
        size(filter(toks, t => array_contains(array(words.map(lit): _*), t))).cast("long")
      val en = hits(Seq("the", "a", "and", "of"))
      val es = hits(Seq("el", "la", "de", "y"))
      val de = hits(Seq("der", "die", "und", "das"))
      tbl(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        en.as("en_hits"), es.as("es_hits"), de.as("de_hits"),
        when(en >= es && en >= de, "en")
          .when(es >= de, "es")
          .otherwise("de").as("lang_guess"))
    }),

    // Document fingerprint: md5 of whitespace-normalized lowercase text.
    "doc_fingerprint" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
    }),

    // Exact dedup on a normalized key (first 64 chars, lowercased):
    // hash-groupBy — one shuffle on the key; emit only duplicate clusters.
    "doc_dedup_exact" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy(md5(substring(lower(col("text")), 1, 64)).as("key_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
        .filter(col("n_docs") > 1)
    }),

    // Corpus vocabulary: top-20 tokens by document frequency (token
    // counting at corpus granularity; deterministic tiebreak by token).
    // orderBy+limit compiles to TakeOrderedAndProject (per-partition
    // top-20 then a 20-row driver merge — no global single-partition
    // window over the full vocabulary); the rank is then derived on the
    // 20-row result. The partition key must be NON-FOLDABLE to survive
    // constant folding (a lit() gets optimized out, reviving the
    // single-partition-window warning), so it's an empty substring of a
    // real column — constant per row, opaque to the optimizer.
    "doc_vocab_top" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(substring(col("tok"), 0, 0))
        .orderBy(col("df").desc, col("tok"))
      tbl(s, dir, "documents")
        .select(explode(array_distinct(tokens(col("text")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok"))
        .limit(20)
        .withColumn("rk", row_number().over(w).cast("long"))
    }),

    // Deterministic train/validation/test split — the assignment step of
    // every training-data pipeline. Salted md5 of the doc id → bucket in
    // [0,100): 90/5/5. Pure map-side work (no shuffle); the salt decouples
    // the split from every other hash use of doc_id, and the integer
    // bucket arithmetic is reproduced exactly in the oracle.
    "doc_split" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), splitBucket.as("bucket"))
        .select(col("doc_id"),
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "validation")
            .otherwise("test").as("split"))
    }),

    // Benchmark decontamination: for each "benchmark" doc (doc_id < 20 —
    // stand-in for an eval set), count the training docs sharing at least
    // one word-8-gram. The standard n-gram-overlap decontamination pass
    // (e.g. GPT-3 appendix C): shingle → equi-join on the shingle →
    // distinct (test, train) pairs → count per test doc. Blocking by the
    // 8-gram keeps the join near-linear at corpus scale (an 8-gram is far
    // more selective than the jaccard trigram).
    "doc_contamination" -> ((s, dir) => {
      // grams join on a 60-bit md5-derived BIGINT, not the raw string:
      // identical hash arithmetic on both engines (counts agree even in a
      // collision), and the exchange carries 8 bytes per key instead of a
      // multi-word phrase — the shuffle-width win that matters at 100 TB.
      val h = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val sh = tbl(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"),
          transform(sequence(lit(1), size(col("toks")) - 7),
            i => concat_ws(" ", slice(col("toks"), i, lit(8)))).as("grams"))
        .select(col("doc_id"),
          array_distinct(transform(col("grams"), g => h(g))).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      val test = ex.filter(col("doc_id") < 20)
        .select(col("doc_id").as("test_doc_id"), col("g"))
      val train = ex.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("train_doc_id"), col("g"))
      // the eval side is BOUNDED BY CONTRACT (decontamination checks a
      // benchmark set, orders of magnitude smaller than the corpus) —
      // broadcast it explicitly: its plan descends from the cached
      // corpus-wide shingle table, so Catalyst's size estimate is
      // corpus-scaled and the planner otherwise exchanges the full
      // train-side shingle stream by hash (measured 22.7M records at
      // gen_sf 10; SCALE_r11 §11)
      val res = broadcast(test).join(train, "g")
        .select("test_doc_id", "train_doc_id").distinct()
        .groupBy("test_doc_id")
        .agg(count(lit(1)).as("n_contaminating"),
          min(col("train_doc_id")).as("first_train_doc"))
      graft.operators.Caching.materializeAndRelease(res, sh)
    }),

    // Per-document distinctive terms: top-3 by (tf DESC, df ASC, term ASC)
    // — the TF-IDF ranking with the fp logarithm replaced by the
    // equivalent integer lexicographic order (higher tf, then rarer term),
    // so the result is exact on every engine. Plan: one explode + two
    // hash aggregations + a per-doc window over ≤ vocabulary-sized groups.
    "doc_top_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // ONE exchange for the whole query: the token stream is
      // hash-partitioned by doc_id up front, which satisfies the
      // clustering of every downstream step — the (doc, term) group-by
      // (same-doc rows are co-located), the per-doc window (reuses the
      // partitioning, no re-exchange), and the df join (broadcast, see
      // below). The earlier shape paid three corpus-sized exchanges:
      // group-by hash, a distinct() that recomputed what tf already is
      // (tf HAS one row per (doc, term) — df is a count over it, not
      // over a re-deduplicated token stream), and the window re-shuffle
      // (measured 44.3M records at gen_sf 10 vs 26M tokens; §11).
      val ex = tbl(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .repartition(col("doc_id"))
      val tf = ex.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      // df is vocabulary-sized; decide its join side on the MEASURED
      // count (the Lm.vocabStats rationale — the cached-lineage size
      // estimate is corpus-scaled). Above the cap the planner's
      // sort-merge is the real-vocabulary regime.
      val dfT =
        if (df.count() <= graft.operators.Lm.BroadcastVocabMaxRows)
          broadcast(df)
        else df
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      val res = tf.join(dfT, "term")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
      graft.operators.Caching.materializeAndRelease(res, tf)
    }),

    // Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 —
    // the standard "remove repetitious documents" filters): fraction of
    // word-2-grams occupied by the single most frequent 2-gram, plus the
    // duplicate-token fraction. A spam page repeating one phrase scores
    // near 1.0 on top_2gram_frac; healthy prose sits near 1/n. All counts
    // integer, ratios integer-derived doubles — exact on both engines.
    // Plan: one explode + two hash aggregations (the doc_top_terms shape).
    "doc_repetition" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val ex = tbl(s, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
          explode(transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("g"))
      ex.groupBy("doc_id", "n_tokens", "n_uniq", "g")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n_tokens", "n_uniq")
        .agg(sum(col("c")).as("n_2grams"), max(col("c")).as("top_2gram_n"))
        .select(col("doc_id"),
          col("n_2grams"), col("top_2gram_n"),
          (col("top_2gram_n").cast("double") / col("n_2grams"))
            .as("top_2gram_frac"),
          (lit(1.0) - col("n_uniq").cast("double") / col("n_tokens"))
            .as("dup_token_frac"))
    }),

    // Corpus-level boilerplate segments (the CCNet/RefinedWeb line-dedup
    // signal): text units appearing verbatim in more than one document —
    // cookie banners, navigation chrome, license footers. The unit is a
    // fixed 12-token segment (the synthetic corpus carries no sentence
    // punctuation, so deterministic segmentation stands in for line
    // splits; a real deployment passes its own delimiter). Normalized
    // segment → 60-bit hash → distinct per doc → corpus count. One
    // shuffle on the 8-byte segment hash; at 100 TB this is the classic
    // two-pass line-dedup's first pass (build the boilerplate list).
    // Only FULL 12-token windows count: a trailing partial (down to one
    // token) would let common short tails masquerade as cross-doc
    // boilerplate and inflate n_docs.
    "doc_boilerplate" -> ((s, dir) => {
      val h = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      tbl(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 12)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0L), expr("(size(toks) div 12) - 1")),
          k => concat_ws(" ", slice(col("toks"), (k * 12 + 1).cast("int"), lit(12)))))
          .as("seg"))
        .select(col("doc_id"), h(col("seg")).as("line_hash"))
        .distinct()
        .groupBy("line_hash")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
    }),

    // Deterministic stratified sampling — the corpus-rebalancing step of
    // a data mixture (downsample the over-represented stratum, keep the
    // rest at a higher rate): salted md5 of the doc id → per-mille bucket,
    // compared against a per-language keep rate (en 5%, others 20%).
    // Pure map-side work, replay-stable (same salt convention as
    // doc_split, different salt string so the two assignments are
    // independent), exact integer arithmetic in both engines.
    "doc_sample" -> ((s, dir) => {
      val bucket = conv(substring(md5(
        concat(lit("sample:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 1000L
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") <
          when(col("lang") === "en", 50L).otherwise(200L))
        .select(col("doc_id"), col("lang"))
    }),

    // N-gram (word-3-gram) Jaccard near-dup pairs, blocked by source.
    // explode shingles → self-join on (source, shingle) → |∩| per pair;
    // |∪| = n1 + n2 − |∩|; keep pairs over threshold.
    "doc_ngram_jaccard" -> ((s, dir) => {
      // shingles join on the 60-bit md5 hash (same trick + rationale as
      // doc_contamination): |∩|/|∪| depend only on equality, and the hash
      // is computed identically in the oracle, so the output is unchanged
      // while the self-join exchanges 8-byte keys.
      val h = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val docs = tbl(s, dir, "documents")
      val shingled = docs
        .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("source"),
          transform(sequence(lit(1), size(col("toks")) - 2),
            i => concat_ws(" ", slice(col("toks"), i, lit(3)))).as("grams"))
        .select(col("doc_id"), col("source"),
          array_distinct(transform(col("grams"), g => h(g))).as("shingles"))
        // both sides of the pair self-join reuse this; don't re-shingle
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = shingled.select(col("doc_id"), col("source"), explode(col("shingles")).as("sh"))
      // Document-frequency cap on the blocking key (part of the
      // operator CONTRACT, mirrored in the oracle — the minhash
      // DefaultMaxBucket discipline applied to exact Jaccard): a
      // shingle shared by m docs emits m² pair rows, so one piece of
      // per-source boilerplate makes the join quadratic (measured:
      // gen_sf 10's 48-word vocabulary drove 536M candidate rows /
      // 7 GB for 3,086 true pairs). Shingles in more than
      // [[JaccardDfCap]] docs of a source carry no dedup signal — they
      // are the idf-stopword class — and are dropped from BOTH the
      // intersection AND the union (n_sh recounts kept shingles), so
      // the Jaccard stays EXACT over the filtered shingle space. The
      // over-cap key set is bounded by occurrences/cap and
      // structurally rare on natural text (the substring_dup hot-gram
      // argument), so it broadcasts; at the driver fixtures no source
      // reaches cap+1 docs and the filter is provably inert (hashes
      // unchanged).
      val hot = ex.groupBy("source", "sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > JaccardDfCap)
        .select("source", "sh")
      val kept = ex.join(broadcast(hot), Seq("source", "sh"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = kept.select(col("doc_id").as("doc_a"), col("source"), col("sh"))
      val b = kept.select(col("doc_id").as("doc_b"), col("source"), col("sh"))
      val inter = a.join(b, Seq("source", "sh"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_inter"))
      // the per-doc shingle-count lookups are big⋈small joins on a doc id;
      // a doc appearing in many near-dup pairs is a hot key, so they run
      // SALTED (Skew.saltedJoin spreads each hot doc id over `factor`
      // shuffle partitions; the counts side replicates ×factor — it is
      // one row per doc, dimension-sized). Result rows are identical to
      // the plain join; only the partitioning changes. doc_b/doc_a as the
      // salt disambiguator keeps partition assignment replay-stable.
      val withA = graft.operators.Skew.saltedJoin(
        inter, counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"),
        "doc_a", factor = 8, bigSaltCol = Some("doc_b"))
      val withB = graft.operators.Skew.saltedJoin(
        withA, counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"),
        "doc_b", factor = 8, bigSaltCol = Some("doc_a"))
      val res = withB
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= 0.2)
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          (col("n_a") + col("n_b") - col("n_inter")).as("n_union"))
      graft.operators.Caching.materializeAndRelease(res, shingled, kept)
    }),

    // PII scrubbing — the redaction pass every training-data pipeline
    // runs before anything else. The corpus is synthetic (no real PII),
    // so the query INJECTS deterministic addresses/numbers first
    // (fixture-in-query, same convention as mm_* and gun_*), then
    // redacts with patterns drawn from the Java∩RE2 regex subset
    // (char classes, +, {m,}, no lookaround — identical semantics in
    // Spark's Java regex and DuckDB's RE2; Spark regexp_replace is
    // replace-all by default, the oracle passes the 'g' flag).
    // Pure per-row map work — no shuffle; at 100 TB this is the
    // cheapest pass in the pipeline and must stay scan-shaped.
    "doc_pii_scrub" -> ((s, dir) => {
      val body = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or admin@test.org now"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      val clean = regexp_replace(
        regexp_replace(body, PiiEmailPat, "<EMAIL>"),
        PiiPhonePat, "<PHONE>")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(body, lit(PiiEmailPat), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(body, lit(PiiPhonePat), lit(0)))
          .cast("long").as("n_phones"),
        length(clean).cast("long").as("clean_len"),
        md5(clean).as("clean_hash"))
    }),

    // Count-min-sketch heavy hitters — the frequency-sketch member of
    // the sketch family (MinHash = set resemblance, SimHash = vector
    // similarity, CMS = frequency). d=4 rows × w=64 buckets, bucket =
    // md5-derived 60-bit hash mod w (integer-exact, the repo's standard
    // cross-engine hash). The sketch is O(d·w) cells AFTER map-side
    // combine — the point at 100 TB: term frequencies without a
    // vocabulary-wide shuffle; only the fixed probe set (a driver-side
    // literal, broadcast) is ever looked up. est = min over rows of the
    // probed bucket (classic CMS upper bound); the true count (a
    // filtered, probe-only aggregation — small by construction) rides
    // along so the overestimate bias is visible in the output.
    "doc_countmin_heavy" -> (countminQuery(_, _, estOnly = false)),
    // PRODUCTION est-only variant: the plan the 100 TB user copies — the
    // sketch pass alone, no second corpus scan for the exact ride-along
    // (which exists in the declared query for bias checking only).
    // Applies to the whole family: *_est plans are asserted exact-free
    // in PlanHygieneSpec.
    "doc_countmin_heavy_est" -> (countminQuery(_, _, estOnly = true)),

    // HyperLogLog distinct-count — the CARDINALITY member of the sketch
    // family (MinHash resemblance / SimHash similarity / CMS frequency /
    // HLL cardinality / Bloom membership), over the corpus's 8-token
    // SHINGLE hashes (tens of thousands distinct — the vocabulary is ~30
    // words, not worth sketching). 64 registers; register = low 6 bits
    // of the md5-derived 60-bit shingle hash, rank = 1 + trailing zeros
    // of the remaining bits (bin()/rtrim string arithmetic — identical
    // builtins on both engines), capped at 31 so every 2^x below fits a
    // BIGINT exactly. The estimate stays on an integer lattice:
    // S = Σ 2^(maxM − Mj) over all 64 registers (exact shifts,
    // order-free), est_q = (709·m²·2^maxM) div S — Flajolet's
    // α_64·m²/Σ2^−M scaled by 1000, floor division. The small-range
    // branch (V = zero registers > 0 and raw E < 2.5m) switches to
    // linear counting m·ln(m/V); its 64 possible values are PRECOMPUTED
    // in Scala and embedded as the same integer table in both engines,
    // so the fp logarithm never crosses the engine boundary. Scale
    // shape: one map-side hash pass + a 64-group max — the sketch IS
    // the shuffle payload; true distinct (a full shuffle) rides along
    // for the bias check only.
    "doc_hll_distinct" -> (hllQuery(_, _, estOnly = false)),
    // est-only HLL: no countDistinct — the full-distinct shuffle is the
    // exact cost the sketch exists to avoid at 100 TB (and the single
    // use of the shingle stream also drops the persist)
    "doc_hll_distinct_est" -> (hllQuery(_, _, estOnly = true)),

    // Bloom-filter membership probe — the shape of shuffle-free
    // decontamination at 100 TB: the test set's 8-token shingles are
    // folded into a 16384-bit, 4-hash Bloom filter (distinct set bits —
    // bounded by the bit width, a driver-side index parameter like the
    // centroid tables), packed into 256 longs, and every training shingle
    // probes it MAP-SIDE with an O(1) word>>offset&1 bit test against the
    // broadcast literal — no shuffle touches the corpus until the tiny
    // per-doc count aggregation. The exact
    // semi-join count rides along, so the output exposes the filter's
    // false-positive overcount per doc (n_maybe ≥ n_true always; the
    // fp rate is the Bloom tradeoff being demonstrated).
    "doc_bloom_probe" -> (bloomQuery(_, _, estOnly = false)),
    "doc_bloom_probe_est" -> (bloomQuery(_, _, estOnly = true)),

    // Histogram quantile sketch — the QUANTILE member of the sketch
    // family (MinHash resemblance / SimHash similarity / CMS frequency /
    // HLL cardinality / Bloom membership / histogram quantiles): the
    // standard length-cutoff tool at 100 TB, where an exact global sort
    // per percentile is off the table. The corpus is scanned ONCE into a
    // per-length count (bounded by the longest document — a data
    // property, not corpus size); every later step operates on that
    // bounded table: the fixed-width binned histogram (the sketch — its
    // size is bin-count-bounded regardless of the length distribution),
    // cumulative counts via a window over the handful of sketch rows,
    // and min-bin-over-threshold per requested permille. est_hi is the
    // bin's upper bound, so est_hi >= exact_n always with error < the
    // bin width — the sketch tradeoff visible next to the exact order
    // statistic, which rides along for the bias check (CMS/HLL/Bloom
    // convention). Integer lattice throughout: permille thresholds via
    // ceil-division (q*N + 999) DIV 1000, no fp interpolation crossing
    // the engine boundary (percentile_cont at q=0.99 would).
    "doc_length_quantiles" -> (quantileQuery(_, _, estOnly = false)),
    "doc_length_quantiles_est" -> (quantileQuery(_, _, estOnly = true)),

    // Sequence packing (concat-and-chunk) — the final assignment step of
    // an LLM training pipeline: documents laid end-to-end in doc_id
    // order, sliced into fixed 512-token context windows. The global
    // running sum runs as a distributed two-pass prefix sum
    // (operators/Packing.scala) — range-partition, per-partition totals
    // to the driver (O(#partitions)), base offsets broadcast back,
    // parallel within-partition windows — NOT a single-partition global
    // window. Result is bit-identical to the naive form for any
    // partition count, so the oracle is the plain SUM() OVER (ORDER BY).
    "doc_pack_chunks" -> ((s, dir) => {
      val base = tbl(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Packing.packChunks(base, "doc_id", "n_tokens", PackBudget)
        .select("doc_id", "n_tokens", "start_off", "chunk_first",
          "chunk_last", "n_chunks")
    }),

    // Stratified sampling with exact per-stratum quotas: deterministic
    // salted-hash rank within each language, keep the quota lowest. The
    // per-stratum global rank is computed in two phases — a LOCAL
    // window over (lang, physical partition) prunes each partition to
    // its own top-quota first, so the per-lang global window (one
    // shuffle on lang) sees ≤ quota·#partitions rows per stratum
    // instead of the whole stratum. Exact: a global top-q survivor is a
    // local top-q survivor in its own partition. At 100 TB this is the
    // difference between a bounded window input and sorting every
    // stratum end-to-end.
    "doc_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hk = conv(substring(md5(
        concat(lit("strat:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      val local = Window.partitionBy(col("lang"), col("_pid"))
        .orderBy(col("hk"), col("doc_id"))
      val global = Window.partitionBy(col("lang"))
        .orderBy(col("hk"), col("doc_id"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), hk.as("hk"))
        .withColumn("_pid", spark_partition_id())
        .withColumn("lrk", row_number().over(local))
        .filter(col("lrk") <= StratQuota)
        .withColumn("rk", row_number().over(global).cast("long"))
        .filter(col("rk") <= StratQuota)
        .select("lang", "rk", "doc_id", "hk")
    }),

    // BM25 retrieval against a fixed probe-term set, scored entirely on
    // an integer lattice. The fp-unfriendly pieces are replaced by
    // exact integer forms shared with the oracle:
    //   idf_q  = bit_length((N - df + 1)·65536 DIV (df + 1)) — a
    //            monotone floor-log2 quantization of the Robertson idf
    //            (length(bin(x)) on both engines);
    //   tf_q   = (44·T·tf·10^6) DIV (20·T·tf + 6·T + 18·dl·N) — the
    //            k1=1.2, b=0.75 saturation term with avgdl = T/N kept
    //            rational (all fractions cleared by 20·T), scaled 10^6;
    //   score_q = idf_q · tf_q.
    // Long headroom: 44·T·tf·10^6 at tf≤64 needs T ≤ 3.2e9 — a ~10 TB
    // token stream per job before the scale constant must drop to 10^3.
    // Plan: explode → filter to the broadcast probe list (map-side) →
    // two hash aggs (tf, df) → broadcast joins of the tiny df/totals
    // tables → per-term top-5 window over ≤ corpus-matching rows.
    // Absent probe terms (df = 0) simply emit no rows.
    "doc_bm25_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val probesArr = array(BmProbes.map(lit): _*)
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
          col("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val totals = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(array_contains(probesArr, col("term")))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), Seq("term"))
        .crossJoin(broadcast(totals))
        .withColumn("idf_q",
          length(bin(expr("(n - df + 1) * 65536L DIV (df + 1)"))).cast("long"))
        .withColumn("tf_q", expr(
          "(44L * t * tf * 1000000L) DIV (20L * t * tf + 6L * t + 18L * dl * n)"))
        .withColumn("score_q", col("idf_q") * col("tf_q"))
      // same two-phase top-k as doc_sample_stratified: local per-partition
      // prune bounds the per-term global window input to 5·#partitions.
      val local = Window.partitionBy(col("term"), col("_pid"))
        .orderBy(col("score_q").desc, col("doc_id"))
      val w = Window.partitionBy(col("term"))
        .orderBy(col("score_q").desc, col("doc_id"))
      val res = scored
        .withColumn("_pid", spark_partition_id())
        .withColumn("lrk", row_number().over(local))
        .filter(col("lrk") <= 5)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("term", "rank", "doc_id", "tf", "dl", "idf_q", "score_q")
      graft.operators.Caching.materializeAndRelease(res, docs)
    }),

    // EXACT substring-run dedup with the Dedup.DefaultMaxBucket hot-gram
    // guard — semantics, scale shape, and the representative-linking rule
    // documented on [[graft.operators.Dedup.substringDupPairs]]; the cap
    // is mirrored verbatim in the oracle below and exercised with a
    // flooded-gram fixture in DedupSkewSpec.
    "doc_substring_dup" -> ((s, dir) =>
      graft.operators.Dedup.substringDupPairs(
        tbl(s, dir, "documents"), "doc_id", "text")),

    // Source-mixing weights for a training run: per-source token counts →
    // temperature-flattened sampling weight ∝ √tokens (the standard
    // α = 0.5 rebalance), held on the integer lattice: isqrt via
    // floor∘sqrt (exact for counts < 2^52 — IEEE sqrt is correctly
    // rounded, and the nearest integer boundary is > ½ulp away), permille
    // by integer division. One hash agg over the corpus + a broadcast of
    // the per-source totals (#sources rows).
    "doc_mix_weights" -> ((s, dir) => {
      val src = tbl(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
        .withColumn("isq", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      val tot = src.agg(sum(col("isq")).as("tot"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("1000 * isq div tot").as("weight_permille"))
    }),

    // CCNet-shape LM quality filter: a unigram LM with add-one smoothing
    // trained ON the corpus, then every doc scored by its mean token
    // surprisal — the log2-perplexity signal CCNet/Gopher filter on.
    // All arithmetic on the exact integer lattice (surprisal in 256ths
    // of a bit via the linear-interpolated integer log2:
    // s(q) = 256·⌊log2 q⌋ + (256q >> ⌊log2 q⌋) − 256, q = (T+V)·2^16
    // DIV (cnt+1)); no fp logarithm ever crosses the engine boundary,
    // and the per-doc SUM of Long surprisals is summation-order-free.
    // Plan: the canonical two-pass LM shape, exactly TWO corpus scans.
    // Pass 1 builds the vocab table directly (explode → one tok-keyed
    // hash agg with map-side combine) and PERSISTS it — the vocabulary
    // is the small side (≪ corpus) and every downstream consumer
    // (totals, surprisal, the scoring join) reads the cache instead of
    // re-scanning the corpus (measured: the un-persisted diamond
    // re-ran the build once per consumer — AQE stage reuse caught only
    // 2 of 4 scans). Pass 2 scores: explode → join the surprisal table
    // on tok (AQE broadcasts it while it fits; sort-merge at
    // real-vocabulary scale) → one per-doc agg with map-side combine.
    // Long headroom: 256·q ≤ (T+V)·2^24 keeps the shift exact through
    // ~5·10^11 corpus tokens per job.
    // Scoring + lattice live in [[graft.operators.Lm]] — shared
    // verbatim with the frozen-snapshot path ([[Lm.saveModel]] /
    // [[graft.streaming.StreamingLm]]) so batch and at-ingest scoring
    // cannot drift. T + V enters as ONE scalar subquery over the
    // persisted vocab view (its own tiny job, result inlined) — no
    // 1-row crossJoin, so the plan is BNLJ-free without a
    // PlanHygieneSpec allowlist entry (VERDICT_r10 #8).
    "doc_lm_surprisal" -> ((s, dir) => {
      import graft.operators.Lm
      val rows = Lm.tokenStream(tbl(s, dir, "documents"))
      val lm = Lm.unigrams(rows)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ONE cache-materializing job ([[Lm.vocabStats]]): T + V become
      // literals (no per-consumer scalar-subquery job) and the scoring
      // join broadcasts on the MEASURED vocab size — Catalyst's
      // estimate scales with the corpus and AQE cannot re-plan across
      // the cached relation, so at gen_sf 10 the un-hinted join
      // shuffled the full 26M-row token stream for a 48-row model
      // (SCALE_r11 §10)
      val (_, _, tv, bc) = Lm.vocabStats(lm)
      val res = Lm.scoreUnigram(rows, Lm.surprisalTable(lm, tv), tv,
        broadcastModel = bc)
      graft.operators.Caching.materializeAndRelease(res, lm)
    }),

    // DSIR importance weights (Xie et al., "Data Selection for Language
    // Models via Importance Resampling", 2023): hashed-bigram feature
    // counts, target distribution = the DsirTarget source slice, raw =
    // the whole corpus; per-doc log importance weight
    // log2(p_tgt/p_raw) = Σ_b tf_b · (s_raw(b) − s_tgt(b)) on the same
    // 256ths-of-a-bit integer-log2 lattice as doc_lm_surprisal (add-one
    // smoothing over the bucket space). THE scale property is the
    // hashing: both distributions live in a FIXED B = 4096-bucket space
    // regardless of corpus size, so the model is two B-row aggregates
    // over the already-reduced (doc,bucket) table and scoring is a
    // broadcast join — per-doc work never shuffles anything wider than
    // the (doc_id,bucket) combine no matter how large the corpus.
    // Bigram LM with STUPID BACKOFF (Brants et al., "Large Language
    // Models in Machine Translation", 2007) — the web-scale LM scoring
    // shape: a token after a seen (prev, cur) bigram pays the exact
    // conditional surprisal log2(cnt(prev)/cnt(prev,cur)); an unseen
    // continuation backs off to the unigram add-one lattice plus the
    // fixed backoff penalty log2(1/0.4) ≈ 338/256 bits (the integer
    // constant IS the contract — no fp crosses the engine boundary);
    // position 0 scores unigram-only. The model trains on the TRAIN
    // slice of doc_split's deterministic 90/5/5 assignment (same salted
    // md5 bucket) and scores ALL docs — held-out semantics, so unseen
    // continuations (and unseen tokens, via add-one) genuinely occur in
    // the validation/test slices and the backoff branch is live. Three
    // corpus scans by design (unigram build, bigram build, scoring —
    // the models have different keys and persisting the corpus-sized
    // token stream to merge them costs more than the scan); the unigram
    // table is persisted (three consumers: totals, prev-count join,
    // cur-score join), the bigram table feeds its single consumer
    // straight. Scoring joins the token stream to the bigram model on
    // the (prev, cur) STRING key — exact, shuffle-joinable at any
    // scale — then one per-doc combine.
    // Training, lattice, and scoring live in [[graft.operators.Lm]]
    // (shared verbatim with the frozen-snapshot / streaming path);
    // the query owns the train-slice selection ([[splitBucket]]) and
    // the scalar-subquery totals (VERDICT_r10 #8 — no 1-row crossJoin).
    "doc_lm_backoff" -> ((s, dir) => {
      import graft.operators.Lm
      val rows = Lm.tokenStream(tbl(s, dir, "documents"))
      val trainRows = rows.filter(splitBucket < 90)
      val uni = Lm.unigrams(trainRows)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // measured totals + broadcast decision (the doc_lm_surprisal
      // rationale) — the two unigram scoring joins carry the same
      // cached-estimate exposure
      val (_, _, tv, bc) = Lm.vocabStats(uni)
      val res = Lm.scoreBackoff(rows, uni, Lm.bigrams(trainRows), tv,
        broadcastModel = bc)
      graft.operators.Caching.materializeAndRelease(res, uni)
    }),

    // Pass 1: BOTH distributions from one B-row aggregation (the
    // target count is a conditional sum), persisted — 4096 rows, so
    // every consumer reads the cache and the corpus is scanned once.
    // Pass 2: score — the weight table is ≤ B rows by construction, so
    // the join is ALWAYS a broadcast and the only shuffle is the
    // per-doc combine. The lattice lives in [[graft.operators.Dsir]],
    // shared verbatim with the streaming scorer ([[StreamingDsir]]).
    "doc_dsir_weights" -> ((s, dir) => {
      import graft.operators.Dsir
      val docs = tbl(s, dir, "documents")
      val model = Dsir.model(Dsir.bigramBuckets(docs), DsirTarget)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val res = Dsir.score(docs, Dsir.weights(model))
      graft.operators.Caching.materializeAndRelease(res, model)
    }),

    // The COMPOSED curation pipeline (VERDICT_r10 next-round #7): the
    // stages exist as separate declared queries; this runs them as ONE
    // flow so stage composition itself — column contracts at each
    // boundary, cache ownership across operators, hash/salt reuse — is
    // under the oracle. train-split (the shared [[splitBucket]]) →
    // PII scrub (doc_pii_scrub's injection + Java∩RE2 redaction;
    // downstream stages run on the SCRUBBED text) → LM quality filter
    // (unigram [[Lm]] kernels trained on the scrubbed train slice;
    // keep docs at or below the corpus mean bits-per-token — the
    // CCNet-style "keep the low-perplexity side", the threshold a
    // scalar subquery, not a magic constant) → exact near-dup dedup
    // (doc_dedup_exact's normalized 64-char key on the CLEAN text,
    // keep lowest doc_id) → sequence packing (the doc_pack_chunks
    // two-pass prefix sum over survivors). Scale shape: each stage
    // keeps its declared plan — map-side scrub, two-scan LM, one
    // key shuffle for dedup, O(#partitions) driver merge for the
    // pack — composition adds no new global step.
    "doc_pipeline_e2e" -> ((s, dir) => {
      import graft.operators.Lm
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.storage.StorageLevel
      val train = tbl(s, dir, "documents").filter(splitBucket < 90)
      val body = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or admin@test.org now"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      // key_hash (the doc_dedup_exact 64-char normalized key) is computed
      // HERE, once per doc on the scrubbed text, instead of after the
      // dedup join (round 21, guide §2.3 "project before the exchange"):
      // the join below then carries only (doc_id, key_hash) — the text
      // column never crosses the dedup exchange. Same md5 over the same
      // clean text, so the surviving set (and the oracle hash) is
      // unchanged.
      val cleanDf = train.select(col("doc_id"),
        regexp_replace(regexp_replace(body, PiiEmailPat, "<EMAIL>"),
          PiiPhonePat, "<PHONE>").as("text"))
        .withColumn("key_hash", md5(substring(lower(col("text")), 1, 64)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val rows = Lm.tokenStream(cleanDf)
      val uni = Lm.unigrams(rows).persist(StorageLevel.MEMORY_AND_DISK)
      val (_, _, tv, bc) = Lm.vocabStats(uni)
      val scored = Lm.scoreUnigram(rows, Lm.surprisalTable(uni, tv), tv,
        broadcastModel = bc)
        .persist(StorageLevel.MEMORY_AND_DISK)
      scored.createOrReplaceTempView("graft_pipe_scored")
      val kept = scored.filter(col("ppl_bits_q") <=
        expr("(select sum(nll_q) div sum(n_tokens) from graft_pipe_scored)"))
      val wDedup = Window.partitionBy(col("key_hash")).orderBy(col("doc_id"))
      val deduped = kept.join(cleanDf.select("doc_id", "key_hash"), "doc_id")
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .select("doc_id", "n_tokens")
      val res = graft.operators.Packing
        .packChunks(deduped, "doc_id", "n_tokens", PackBudget)
        .select("doc_id", "n_tokens", "start_off", "chunk_first",
          "chunk_last", "n_chunks")
      graft.operators.Caching.materializeAndRelease(res, cleanDf, uni, scored)
    }),

    // Contrastive LM quality scoring (the CCNet discipline, Wenzek et
    // al. 2020: score each doc under an in-domain LM AND a general LM —
    // the DIFFERENCE cancels doc-length and common-token effects and
    // ranks docs by domain fit, which a single-model perplexity can't):
    // target model = add-one unigram on the DsirTarget source slice,
    // general model = the same on the whole corpus, both on the shared
    // 256ths-of-a-bit integer-log2 lattice. Plan: ONE corpus scan
    // builds the reduced (doc_id, source, tok, tf) table (persisted);
    // both models, both surprisal tables, and the scoring join all read
    // that cache — the corpus is never rescanned. Tokens outside the
    // target vocabulary pay the add-one unseen surprisal (a LIVE branch
    // here: the target slice is ~1/20th of the corpus). Totals enter as
    // scalar subqueries (the VERDICT_r10 #8 discipline — no 1-row
    // crossJoin). Output keeps both nll sums so the contrast is
    // oracle-checked end to end; contrast_bits_q = per-token bits under
    // general − per-token bits under target (positive ⇒ the target
    // model finds the doc more predictable ⇒ in-domain — the keep
    // signal). Both div operands are non-negative, so Spark `div` and
    // DuckDB `//` agree.
    "doc_lm_contrast" -> ((s, dir) => {
      import graft.operators.Lm
      import org.apache.spark.storage.StorageLevel
      val tf = tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val lmAll = tf.groupBy("tok").agg(sum(col("tf")).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val lmTgt = tf.filter(col("source") === DsirTarget)
        .groupBy("tok").agg(sum(col("tf")).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // measured totals-as-literals + broadcast decisions for both
      // models (the doc_lm_surprisal rationale): without the hint each
      // scoring join re-exchanges the tf table by tok
      val (_, _, tvAll, bAll) = Lm.vocabStats(lmAll)
      val (_, _, tvTgt, bTgt) = Lm.vocabStats(lmTgt)
      def hinted(df: DataFrame, b: Boolean) = if (b) broadcast(df) else df
      val res = tf
        .join(hinted(Lm.surprisalTable(lmAll, tvAll)
          .withColumnRenamed("s_q", "s_all"), bAll), Seq("tok"))
        .join(hinted(Lm.surprisalTable(lmTgt, tvTgt)
          .withColumnRenamed("s_q", "s_tgt"), bTgt), Seq("tok"), "left")
        .withColumn("s_tgt",
          coalesce(col("s_tgt"), expr(Lm.sQSql(s"(($tvTgt) * 65536)"))))
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_tokens"),
          sum(col("tf") * col("s_all")).as("nll_all_q"),
          sum(col("tf") * col("s_tgt")).as("nll_tgt_q"))
        .withColumn("contrast_bits_q",
          expr("nll_all_q div n_tokens - nll_tgt_q div n_tokens"))
        .select("doc_id", "n_tokens", "nll_all_q", "nll_tgt_q",
          "contrast_bits_q")
      graft.operators.Caching.materializeAndRelease(res, tf, lmAll, lmTgt)
    }),

    // Temperature-scaled source sampling (the mT5/XLM-R mixing rule
    // with α = 1/2: p(source) ∝ n^α up-weights tail sources and
    // down-weights the head) — doc_mix_weights COMPUTES the mixture,
    // this APPLIES it: per-source doc counts → integer-sqrt weights
    // (the doc_mix_weights lattice) → a 10%-of-corpus doc budget split
    // across sources by weight → per-source keep-rate in permille →
    // a deterministic salted-md5 coin per doc (the doc's identity IS
    // the randomness — the sample is reproducible across runs and
    // engines, no RNG). Scale shape: ONE per-source count aggregate;
    // everything after is arithmetic on a #sources-row table broadcast
    // into a map-side filter — no corpus shuffle at any scale.
    "doc_temperature_sample" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val src = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("isq",
          floor(sqrt(col("n_docs").cast("double"))).cast("long"))
      src.createOrReplaceTempView("graft_tsamp_src")
      val rate = src
        .withColumn("quota", expr(
          "(select sum(n_docs) from graft_tsamp_src) div 10" +
            " * isq div (select sum(isq) from graft_tsamp_src)"))
        .withColumn("rate_permille",
          least(lit(1000L), expr("1000 * quota div n_docs")))
        .select("source", "rate_permille")
      docs.select(col("doc_id"), col("source"))
        .join(broadcast(rate), Seq("source"))
        .filter(
          conv(substring(md5(concat(lit("tsamp:"),
            col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
            % 1000L < col("rate_permille"))
        .select("doc_id", "source", "rate_permille")
    }),

    // Corpus profiling — the before/after-stage diagnostic a curation
    // run records at every pipeline boundary: per-source doc counts,
    // empty-doc count, distinct languages, char-length min/max/mean,
    // token totals and mean tokens per doc. ONE pass: a map-side
    // projection (token count = size(split()) — the row never widens,
    // no explode) into a single per-source hash aggregate with map-side
    // combine; integer means (both div operands non-negative).
    "doc_profile" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("source"), col("lang"),
          length(col("text")).cast("long").as("chars"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long")
            .as("toks"),
          when(length(trim(col("text"))) === 0, 1L).otherwise(0L)
            .as("empty"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("empty")).as("n_empty"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("chars")).as("len_min"),
          max(col("chars")).as("len_max"),
          sum(col("chars")).as("chars_total"),
          sum(col("toks")).as("toks_total"))
        .withColumn("len_mean", expr("chars_total div n_docs"))
        .withColumn("toks_mean", expr("toks_total div n_docs"))),

    // Deterministic shuffle-shard export — the training-data writer's
    // last step: every doc gets a reproducible pseudo-random position
    // (salted 60-bit md5 — the doc's identity is the randomness, so
    // the export is stable across runs and engines), the hash's top 6
    // bits pick 1 of 64 shards, and position-in-shard is a
    // PARTITION-LOCAL window. This is the scale-correct shape: a
    // global ORDER BY hash would funnel the corpus through one task;
    // hash-range sharding (uniform by construction) + per-shard
    // row_number keeps every step partition-parallel — shard is the
    // write.partitionBy key of a real export, pos the in-file order.
    "doc_shuffle_export" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          conv(substring(md5(concat(lit("shuf:"),
            col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
            .as("h"))
        .withColumn("shard", shiftright(col("h"), 54))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .select("shard", "pos", "doc_id")
    }),

    // Gopher-style rule battery (Rae et al. 2021 §A1.1 — the per-rule
    // diagnostic form every modern curation run records, e.g. Dolma's
    // attribute files): each rule is a pass/fail flag PLUS a combined
    // keep, so downstream ablations can re-weight individual rules
    // without re-scanning the corpus. Rules live on this corpus (the
    // fixture is punctuation-free, so the symbol/bullet/ellipsis rules
    // are vacuous and omitted): token-count bounds, mean-word-length
    // bounds, >= 2 distinct stopwords, duplicate-token fraction cap.
    // All comparisons are cross-multiplied INTEGER forms (2·chars >=
    // 9·tokens, not chars/tokens >= 4.5) — exact on both engines, no fp
    // ratio ever materializes. Thresholds are fixture-calibrated so
    // both branches of every rule are exercised (the CmProbes
    // discipline); a deployment passes its own. Pure map-side work:
    // one scan, no shuffle, no explode (array sizes only).
    "doc_gopher_rules" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val n = size(toks).cast("long")
      val u = size(array_distinct(toks)).cast("long")
      val cns = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
      val stopArr = array(stopEn.map(lit): _*)
      val nStop = size(array_distinct(
        filter(toks, t => array_contains(stopArr, t)))).cast("long")
      tbl(s, dir, "documents")
        .select(col("doc_id"), n.as("n_tokens"),
          (n >= 20L && n <= 100000L).cast("long").as("r_wc"),
          (cns * 2L >= n * 9L && cns <= n * 10L).cast("long").as("r_mwl"),
          (nStop >= 2L).cast("long").as("r_stop"),
          ((n - u) * 100L <= n * 65L).cast("long").as("r_dup"))
        .withColumn("keep",
          (col("r_wc") + col("r_mwl") + col("r_stop") + col("r_dup") === 4L)
            .cast("long"))
    }),

    // C4-style segment dedup APPLIED (Raffel et al. 2020 §2.2
    // "deduplicate three-sentence spans"; doc_boilerplate only LISTS
    // the cross-doc segments — this removes them): every 12-token
    // segment keeps its globally FIRST occurrence (ordered by doc_id,
    // then position — deterministic, replay-stable) and later copies
    // are dropped; per doc the kept/removed counts are the curation
    // record. Plan: segment → 60-bit hash → ONE shuffle on the 8-byte
    // hash; the first-occurrence window runs per hash group (group
    // size = the duplication factor, small by construction — a flooded
    // segment IS boilerplate and still costs only its own group), then
    // one per-doc combine. The same two-pass line-dedup shape CCNet
    // runs at web scale, with the removal pass fused into the window.
    "doc_line_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // segmentation kernel shared with the at-ingest path
      // ([[graft.streaming.StreamingLineDedup]]) — one definition of
      // what a segment is, so batch and stream cannot drift
      val segs = graft.operators.Dedup.segments(
        tbl(s, dir, "documents"), "doc_id", "text")
      val w = Window.partitionBy(col("line_hash"))
        .orderBy(col("doc_id"), col("seg_idx"))
      segs.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
        .withColumn("n_removed", col("n_segs") - col("n_kept"))
        .select("doc_id", "n_segs", "n_kept", "n_removed")
    }),

    // CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): the
    // corpus is split per LANGUAGE into perplexity terciles — "head"
    // (most fluent third) trains the flagship model, "tail" is held
    // for ablation. Scoring is doc_lm_surprisal's unigram [[Lm]]
    // kernel verbatim; the tercile thresholds come from a per-language
    // HISTOGRAM of the integer score (the quantileQuery discipline:
    // never a global sort over docs — the histogram is bounded by
    // distinct score values, its cumsum window runs over that bounded
    // table, and the resulting #langs-row threshold table broadcasts
    // into a map-side bucket assign). Equal scores land in the same
    // bucket on both engines — the integer lattice leaves no
    // fp-boundary ambiguity for a doc to straddle.
    "doc_ccnet_bucket" -> ((s, dir) => {
      import graft.operators.Lm
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.storage.StorageLevel
      val docs = tbl(s, dir, "documents")
      val rows = Lm.tokenStream(docs)
      val lm = Lm.unigrams(rows).persist(StorageLevel.MEMORY_AND_DISK)
      val (_, _, tv, bc) = Lm.vocabStats(lm)
      val sl = Lm.scoreUnigram(rows, Lm.surprisalTable(lm, tv), tv,
        broadcastModel = bc)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "ppl_bits_q")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hist = sl.groupBy("lang", "ppl_bits_q").agg(count(lit(1)).as("c"))
      val thr = hist
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("lang").orderBy("ppl_bits_q")))
        .withColumn("total", sum(col("c")).over(Window.partitionBy("lang")))
        .groupBy("lang")
        .agg(
          min(when(col("cum") * 3 >= col("total"), col("ppl_bits_q"))).as("t1"),
          min(when(col("cum") * 3 >= col("total") * 2, col("ppl_bits_q"))).as("t2"))
      val res = sl.join(broadcast(thr), "lang")
        .select(col("doc_id"), col("lang"), col("ppl_bits_q"),
          when(col("ppl_bits_q") <= col("t1"), "head")
            .when(col("ppl_bits_q") <= col("t2"), "middle")
            .otherwise("tail").as("bucket"))
      graft.operators.Caching.materializeAndRelease(res, lm, sl)
    }),

    // Per-document token-entropy quality signal (the Shannon diversity
    // score entropy-based spam/keyword-stuffing filters threshold on —
    // a doc repeating one phrase has entropy near 0, healthy prose
    // near log2 of its vocabulary): H = Σ_tok (tf/n)·log2(n/tf), held
    // in 256ths of a bit on the SAME interpolated integer-log2 lattice
    // as the LM scorers ([[Lm.sQSql]] — n·2^16 div tf ≥ 2^16, so every
    // odds value is in lattice range and the contribution is ≥ 0).
    // Complements doc_repetition (top-2-gram mass) with the full
    // distributional signal. Plan: explode → one (doc,tok) hash agg
    // with map-side combine (n rides along map-side — no second scan,
    // no window) → one per-doc combine. Long headroom: tf·s_q <
    // n·256·log2(n) keeps per-doc sums far under 2^63 at any doc size.
    "doc_token_entropy" -> ((s, dir) => {
      val ex = tbl(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
          explode(col("toks")).as("tok"))
      ex.groupBy("doc_id", "n_tokens", "tok").agg(count(lit(1)).as("tf"))
        .withColumn("q", expr("n_tokens * 65536 div tf"))
        .withColumn("s_q", expr(graft.operators.Lm.sQSql("q")))
        .groupBy("doc_id", "n_tokens")
        .agg(count(lit(1)).as("n_uniq"),
          sum(col("tf") * col("s_q")).as("hsum_q"))
        .withColumn("ent_q", expr("hsum_q div n_tokens"))
        .select("doc_id", "n_tokens", "n_uniq", "ent_q")
    })
  )

  /** Java∩RE2 PII patterns (shared verbatim with the oracle). */
  private val PiiEmailPat = graft.operators.Pii.EmailPat
  private val PiiPhonePat = graft.operators.Pii.PhonePat

  /** Linear-counting table for the HLL small-range branch:
    * floor(1000·64·ln(64/V)) for V ∈ 1..64, computed ONCE here and
    * embedded verbatim in both the Spark result (driver arithmetic) and
    * the generated oracle SQL — the logarithm never crosses the engine
    * boundary, so the lattice rule holds even on the fp branch.
    */
  private val HllLinTable: Map[Int, Long] =
    (1 to 64).map(v =>
      v -> math.floor(1000.0 * 64 * math.log(64.0 / v)).toLong).toMap

  /** Bloom geometry: 16384 bits × 4 hashes — sized so the ~1k-shingle
    * test set loads the filter to ~23% (measured fp 0.15% with the KM
    * double-hash probes), visible but small.
    */
  private val BloomBits = 16384
  private val BloomHashes = 4
  /** Kirsch-Mitzenmacher split point for the 60-bit shingle hash:
    * h1 = g mod 2^30 (low half), h2 = g div 2^30 (high half), probe
    * position i = (h1 + i·h2) mod BloomBits. Shared verbatim with the
    * oracle.
    */
  private val BloomHalf = 1L << 30
  /** Histogram-quantile sketch: bin width in tokens, and the requested
    * percentiles as integer permilles (integer-lattice thresholds).
    */
  private val QuantBinW = 16L
  private val QuantPermilles = Seq(250L, 500L, 750L, 900L, 990L)

  /** Packing context-window budget (tokens): small enough that the
    * sf0.01 corpus (27k tokens) spans ~53 chunks and many docs straddle
    * a boundary, exercising the multi-chunk branch.
    */
  private val PackBudget = 512L

  /** Stratified-sampling per-stratum quota (smallest sf0.01 stratum has
    * 64 docs, so every stratum fills its quota).
    */
  private val StratQuota = 10

  /** BM25 probe terms: df spread from rare ("dup", df≈25 at sf0.01) to
    * near-universal ("batch", df≈402), plus one absent term exercising
    * the no-rows path.
    */
  private val BmProbes = Seq("dup", "key", "batch", "the", "vector",
    "zzz-absent")

  /** CMS geometry + fixed probe set (drawn from the fixture vocabulary
    * plus two absent terms so the 0-estimate path is exercised).
    */
  private val CmDepth = 4
  private val CmWidth = 64
  private val CmProbes = Seq("spark", "table", "row", "value", "scan",
    "key", "agg", "fast", "slow", "batch", "window", "merge", "join",
    "filter", "data", "column", "query", "the", "zzz-absent", "qqq-absent")

  private val tokensSql = "string_split_regex(lower(trim(text)), '\\s+')"

  /** DuckDB mirror of the 256ths-of-a-bit interpolated integer log2
    * (shared lattice of doc_lm_surprisal / doc_lm_backoff /
    * doc_dsir_weights): 256·⌊log2 q⌋ + (256q >> ⌊log2 q⌋) − 256, minus
    * 4096 for the 2^16 odds scale.
    */
  private def latSql(q: String): String =
    s"(256 * (length(bin($q)) - 1) + (($q * 256) >> (length(bin($q)) - 1)) - 4352)"

  /** THE train/validation/test assignment bucket in [0,100): salted md5
    * of the doc id, 60-bit prefix, mod 100. One definition shared by
    * `doc_split` and `doc_lm_backoff` (the oracles mirror it through
    * [[strHashSql]] with the same `"split:"` salt) so a salt or width
    * change cannot silently diverge held-out semantics between the
    * split assignment and the LM's train-slice filter.
    */
  private def splitBucket: Column =
    conv(substring(md5(
      concat(lit("split:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 100L

  /** Oracle-side mirror of [[splitBucket]] — same salt, same hash. */
  private def splitBucketSql: String =
    strHashSql("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"

  /** DuckDB mirror of the 60-bit md5-prefix hash (no base-16 conv there). */
  private def strHashSql(e: String): String = {
    val terms = (1 to 15).map { kk =>
      val pow = java.lang.Long.parseLong("1" + "0" * (15 - kk), 16)
      s"(strpos('0123456789abcdef', substr(md5($e), $kk, 1)) - 1) * ${pow}::BIGINT"
    }
    "(" + terms.mkString(" + ") + ")"
  }

  /** Merges learned by `doc_bpe_train` (bounds the unrolled oracle). */
  private val BpeTrainK = 12

  /** DSIR feature-space size (see [[graft.operators.Dsir.Buckets]] —
    * referenced so the oracle SQL can never drift from the operator)
    * and the source slice standing in as the target domain.
    */
  private val DsirBuckets = graft.operators.Dsir.Buckets
  private val DsirTarget = "src0"


  /** Document-frequency cap for `doc_ngram_jaccard`'s blocking shingle
    * (per source): shingles in more than this many docs are the
    * idf-stopword class — no dedup signal, quadratic join cost — and
    * are excluded from intersection AND union (exact Jaccard over the
    * filtered space). Part of the operator contract, mirrored verbatim
    * in the oracle. 256 > the driver fixtures' per-source doc counts,
    * so the filter is inert there (hashes unchanged); JaccardCapSpec
    * floods a shingle past the cap to pin the live path.
    * `final` (a compile-time constant) and declared BEFORE the oracle
    * map — oraclesBase interpolates it at object init, and a plain val
    * declared after it would still read 0 there.
    */
  final val JaccardDfCap = 256

  private val oraclesBase: Map[String, String] = Map(
    "doc_bpe_train" -> graft.operators.BpeTrain.oracleSql(BpeTrainK),
    "doc_bpe_train_inc" -> graft.operators.BpeTrain.oracleSql(BpeTrainK),
    // Independent replay of the greedy BPE loop: per distinct word, a
    // recursive CTE holds the symbol list, finds the lowest-rank
    // adjacent pair (leftmost via list_position's first-match), merges
    // it, and recurses until no pair is in the table; the rank/id CASE
    // tables are generated from the same Bpe.Merges the engine compiles
    // in. Terminal states are the rows where no merge applies.
    "doc_tokenize_bpe" -> {
      val rankLambda =
        s"list_transform(range(1, len(syms)), i -> ${
          graft.functions.Bpe.rankCaseSql("syms[i]", "syms[i + 1]")})"
      s"""WITH RECURSIVE
          wtok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents),
          words AS (SELECT DISTINCT w FROM wtok),
          enc AS (
            SELECT w, string_split(w, '') AS syms FROM words
            UNION ALL
            SELECT w,
                   syms[1:besti - 1]
                     || [syms[besti] || syms[besti + 1]]
                     || syms[besti + 2:] AS syms
            FROM (
              SELECT w, syms, list_min(pr) AS minr,
                     list_position(pr, list_min(pr)) AS besti
              FROM (SELECT w, syms, $rankLambda AS pr FROM enc))
            WHERE minr < ${graft.functions.Bpe.NoRank}),
          fin AS (
            SELECT w, syms FROM (
              SELECT w, syms, list_min($rankLambda) AS minr FROM enc)
            WHERE minr IS NULL OR minr >= ${graft.functions.Bpe.NoRank}),
          wst AS (
            SELECT w,
                   CAST(len(ids) AS BIGINT) AS n,
                   CAST(list_aggregate(ids, 'sum') AS BIGINT) AS s,
                   CAST(list_aggregate(ids, 'max') AS BIGINT) AS mx
            FROM (SELECT w, list_transform(syms,
                    y -> ${graft.functions.Bpe.idCaseSql("y")}) AS ids
                  FROM fin))
          SELECT t.doc_id,
                 CAST(SUM(ws.n) AS BIGINT) AS n_ids,
                 CAST(SUM(ws.s) AS BIGINT) AS sum_ids,
                 CAST(MAX(ws.mx) AS BIGINT) AS max_id,
                 COUNT(*) AS n_words
          FROM wtok t JOIN wst ws USING (w)
          GROUP BY t.doc_id"""
    },
    "doc_pii_scrub" ->
      s"""WITH body AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com or admin@test.org now'
                        ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                        THEN ' call 555-'
                             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS b
            FROM documents),
          clean AS (
            SELECT doc_id, b,
                   regexp_replace(regexp_replace(b,
                     '$PiiEmailPat', '<EMAIL>', 'g'),
                     '$PiiPhonePat', '<PHONE>', 'g') AS c
            FROM body)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(b, '$PiiEmailPat')) AS BIGINT)
                   AS n_emails,
                 CAST(len(regexp_extract_all(b, '$PiiPhonePat')) AS BIGINT)
                   AS n_phones,
                 CAST(length(c) AS BIGINT) AS clean_len,
                 md5(c) AS clean_hash
          FROM clean""",
    // Same bounded-histogram construction: one per-length count, the
    // 16-wide binned sketch + cumulative windows over it, ceil-division
    // permille thresholds, min-over-threshold per quantile. est_hi is
    // the matched bin's inclusive upper bound.
    "doc_length_quantiles" ->
      s"""WITH lens AS (SELECT CAST(len($tokensSql) AS BIGINT) AS n
            FROM documents),
          uh   AS (SELECT n, COUNT(*) AS cnt FROM lens GROUP BY n),
          cumu AS (SELECT n, SUM(cnt) OVER (ORDER BY n) AS cum FROM uh),
          hist AS (SELECT n // $QuantBinW AS bin, SUM(cnt) AS cnt
                   FROM uh GROUP BY 1),
          cumb AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum
                   FROM hist),
          tot  AS (SELECT SUM(cnt) AS t FROM uh),
          q    AS (SELECT CAST(unnest([${QuantPermilles.mkString(", ")}])
                     AS BIGINT) AS q_permille)
          SELECT q.q_permille,
                 CAST((SELECT MIN(bin) FROM cumb
                       WHERE cum >= (q.q_permille * tot.t + 999) // 1000)
                   * $QuantBinW + ${QuantBinW - 1} AS BIGINT) AS est_hi,
                 CAST((SELECT MIN(n) FROM cumu
                       WHERE cum >= (q.q_permille * tot.t + 999) // 1000)
                   AS BIGINT) AS exact_n
          FROM q, tot""",
    "doc_countmin_heavy" -> {
      val probeValues = CmProbes.map(p => s"('$p')").mkString(", ")
      val probeIn = CmProbes.map(p => s"'$p'").mkString(", ")
      s"""WITH toks AS (SELECT unnest($tokensSql) AS tok FROM documents),
          cells AS (
            SELECT r, ${strHashSql("'cm:' || CAST(r AS VARCHAR) || ':' || tok")}
                     % $CmWidth AS bucket
            FROM toks, generate_series(0, ${CmDepth - 1}) t(r)),
          sketch AS (
            SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM cells GROUP BY 1, 2),
          probes(term) AS (VALUES $probeValues),
          pb AS (
            SELECT term, r,
                   ${strHashSql("'cm:' || CAST(r AS VARCHAR) || ':' || term")}
                     % $CmWidth AS bucket
            FROM probes, generate_series(0, ${CmDepth - 1}) t(r)),
          est AS (
            SELECT term, CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est_count
            FROM pb LEFT JOIN sketch s USING (r, bucket) GROUP BY term),
          truth AS (
            SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS true_count
            FROM toks WHERE tok IN ($probeIn) GROUP BY 1)
          SELECT e.term, e.est_count,
                 CAST(COALESCE(t.true_count, 0) AS BIGINT) AS true_count
          FROM est e LEFT JOIN truth t USING (term)"""
    },
    "doc_repetition" ->
      s"""WITH ex AS (
            SELECT doc_id,
                   len($tokensSql) AS n_tokens,
                   len(list_distinct($tokensSql)) AS n_uniq,
                   unnest(list_transform(
                     generate_series(1, len($tokensSql) - 1),
                     i -> array_to_string(($tokensSql)[i:i+1], ' '))) AS g
            FROM documents WHERE len($tokensSql) >= 2),
          gc AS (
            SELECT doc_id, n_tokens, n_uniq, g, COUNT(*) AS c
            FROM ex GROUP BY 1, 2, 3, 4)
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_2grams,
                 CAST(MAX(c) AS BIGINT) AS top_2gram_n,
                 CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
                   AS top_2gram_frac,
                 1 - CAST(n_uniq AS DOUBLE) / n_tokens AS dup_token_frac
          FROM gc GROUP BY doc_id, n_tokens, n_uniq""",
    "doc_boilerplate" ->
      s"""WITH raw AS (
            SELECT doc_id,
                   unnest(list_transform(
                     generate_series(0, (len($tokensSql) // 12) - 1),
                     k -> array_to_string(
                       ($tokensSql)[k*12+1 : k*12+12], ' '))) AS seg
            FROM documents WHERE len($tokensSql) >= 12),
          ln AS (
            SELECT DISTINCT doc_id, ${strHashSql("seg")} AS line_hash
            FROM raw)
          SELECT line_hash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
          FROM ln GROUP BY 1 HAVING COUNT(*) > 1""",
    "doc_sample" ->
      s"""SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   ${strHashSql("'sample:' || CAST(doc_id AS VARCHAR)")} % 1000 AS b
            FROM documents)
          WHERE b < CASE WHEN lang = 'en' THEN 50 ELSE 200 END""",
    "doc_split" ->
      s"""SELECT doc_id,
                 CASE WHEN b < 90 THEN 'train'
                      WHEN b < 95 THEN 'validation'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id, $splitBucketSql AS b
                FROM documents)""",
    "doc_hll_distinct" -> {
      val linValues = (1 to 64)
        .map(v => s"($v, ${HllLinTable(v)})").mkString(", ")
      s"""WITH hs AS (
            SELECT ${strHashSql("g")} AS h FROM (
              SELECT unnest(list_transform(
                       list_transform(
                         generate_series(1, len($tokensSql) - 7),
                         i -> array_to_string($tokensSql[i:i+7], ' ')),
                       x -> x)) AS g
              FROM documents WHERE len($tokensSql) >= 8)),
          rr AS (SELECT h % 64 AS j, h >> 6 AS w FROM hs),
          rk AS (SELECT j,
                   CASE WHEN w = 0 THEN 31
                        ELSE LEAST(31, 1 + (length(bin(w))
                               - length(rtrim(bin(w), '0')))) END AS rank
                 FROM rr),
          regs AS (SELECT i AS j, CAST(COALESCE(mx, 0) AS BIGINT) AS m
                   FROM range(0, 64) t(i)
                   LEFT JOIN (SELECT j, MAX(rank) AS mx FROM rk GROUP BY j) r
                     ON r.j = i),
          ag AS (SELECT CAST(MAX(m) AS BIGINT) AS m_max,
                        CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
                          AS v_zero
                 FROM regs),
          sq AS (SELECT CAST(SUM(1::BIGINT << CAST((SELECT m_max FROM ag) - m AS INTEGER))
                   AS BIGINT) AS s_scaled FROM regs),
          lin(v, lq) AS (VALUES $linValues),
          est AS (SELECT CAST((709 * 64 * 64
                     * (1::BIGINT << CAST((SELECT m_max FROM ag) AS INTEGER)))
                     // (SELECT s_scaled FROM sq) AS BIGINT) AS est_q)
          SELECT (SELECT m_max FROM ag) AS m_max,
                 (SELECT s_scaled FROM sq) AS s_scaled,
                 (SELECT est_q FROM est) AS est_q,
                 (SELECT v_zero FROM ag) AS v_zero,
                 CAST(CASE WHEN (SELECT v_zero FROM ag) > 0
                            AND (SELECT est_q FROM est) < 2500 * 64
                      THEN (SELECT lq FROM lin WHERE v = (SELECT v_zero FROM ag))
                      ELSE (SELECT est_q FROM est) END AS BIGINT) AS est_final_q,
                 (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) FROM hs)
                   AS true_distinct""" },
    "doc_bloom_probe" ->
      s"""WITH shs AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                     generate_series(1, len($tokensSql) - 7),
                     i -> array_to_string($tokensSql[i:i+7], ' ')))) AS gs
            FROM documents WHERE len($tokensSql) >= 8),
          sh AS (SELECT doc_id, ${strHashSql("gs")} AS g FROM shs),
          test AS (SELECT DISTINCT g FROM sh WHERE doc_id < 20),
          bits AS (
            SELECT DISTINCT
              ((g % $BloomHalf) + t.i * (g // $BloomHalf)) % $BloomBits AS b
            FROM test, range(0, $BloomHashes) t(i)),
          probe AS (
            SELECT doc_id, g,
              CASE WHEN
                ((g % $BloomHalf) + 0 * (g // $BloomHalf)) % $BloomBits IN (SELECT b FROM bits)
                AND ((g % $BloomHalf) + 1 * (g // $BloomHalf)) % $BloomBits IN (SELECT b FROM bits)
                AND ((g % $BloomHalf) + 2 * (g // $BloomHalf)) % $BloomBits IN (SELECT b FROM bits)
                AND ((g % $BloomHalf) + 3 * (g // $BloomHalf)) % $BloomBits IN (SELECT b FROM bits)
              THEN 1 ELSE 0 END AS maybe,
              CASE WHEN g IN (SELECT g FROM test) THEN 1 ELSE 0 END AS hit
            FROM sh WHERE doc_id >= 20)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(SUM(maybe) AS BIGINT) AS n_maybe,
                 CAST(SUM(hit) AS BIGINT) AS n_true
          FROM probe GROUP BY doc_id""",
    // Plain global window — the Spark side's two-pass prefix sum is
    // bit-identical by construction. (// is floor division; all cum
    // values are ≥ 1 because the tokenizer never yields 0 tokens, so
    // floor == truncate and the DIV/`//` semantics coincide.)
    "doc_pack_chunks" ->
      s"""WITH d AS (SELECT doc_id,
                   CAST(len($tokensSql) AS BIGINT) AS n_tokens
            FROM documents),
          c AS (SELECT doc_id, n_tokens,
                  SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM d)
          SELECT doc_id, n_tokens,
                 CAST(cum - n_tokens AS BIGINT) AS start_off,
                 CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS chunk_first,
                 CAST(CASE WHEN n_tokens = 0
                   THEN (cum - n_tokens) // $PackBudget - 1
                   ELSE (cum - 1) // $PackBudget END AS BIGINT) AS chunk_last,
                 CAST(CASE WHEN n_tokens = 0 THEN 0
                   ELSE GREATEST((cum - 1) // $PackBudget
                     - (cum - n_tokens) // $PackBudget + 1, 0) END AS BIGINT)
                   AS n_chunks
          FROM c""",
    "doc_sample_stratified" ->
      s"""SELECT lang, rk, doc_id, hk FROM (
            SELECT lang, doc_id, hk,
                   CAST(row_number() OVER (PARTITION BY lang
                     ORDER BY hk, doc_id) AS BIGINT) AS rk
            FROM (SELECT doc_id, lang,
                    ${strHashSql("'strat:' || CAST(doc_id AS VARCHAR)")} AS hk
                  FROM documents))
          WHERE rk <= $StratQuota""",
    "doc_bm25_topk" -> {
      val probeIn = BmProbes.map(p => s"'$p'").mkString(", ")
      s"""WITH docs AS (
            SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS dl,
                   $tokensSql AS toks
            FROM documents),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(dl) AS BIGINT) AS t FROM docs),
          tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
                 FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs)
                 WHERE term IN ($probeIn)
                 GROUP BY doc_id, dl, term),
          df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                 FROM tf GROUP BY term),
          scored AS (
            SELECT tf.term, tf.doc_id, tf.tf, tf.dl,
                   CAST(length(bin((n - df + 1) * 65536 // (df + 1)))
                     AS BIGINT) AS idf_q,
                   CAST((44 * t * tf * 1000000)
                     // (20 * t * tf + 6 * t + 18 * dl * n) AS BIGINT)
                     AS tf_q
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN tot)
          SELECT term, rank, doc_id, tf, dl, idf_q,
                 CAST(idf_q * tf_q AS BIGINT) AS score_q
          FROM (SELECT *,
                  CAST(row_number() OVER (PARTITION BY term
                    ORDER BY idf_q * tf_q DESC, doc_id) AS BIGINT) AS rank
                FROM scored)
          WHERE rank <= 5""" },
    "doc_contamination" ->
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     list_transform(
                       generate_series(1, len($tokensSql) - 7),
                       i -> array_to_string($tokensSql[i:i+7], ' ')),
                     g -> ${strHashSql("g")})) AS grams
            FROM documents WHERE len($tokensSql) >= 8),
          ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
          pairs AS (
            SELECT DISTINCT t.doc_id AS test_doc_id, r.doc_id AS train_doc_id
            FROM ex t JOIN ex r ON t.g = r.g
            WHERE t.doc_id < 20 AND r.doc_id >= 20)
          SELECT test_doc_id, COUNT(*) AS n_contaminating,
                 MIN(train_doc_id) AS first_train_doc
          FROM pairs GROUP BY 1""",
    "doc_top_terms" ->
      s"""WITH ex AS (
            SELECT doc_id, unnest($tokensSql) AS term FROM documents),
          tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
          df AS (SELECT term, COUNT(*) AS df
                 FROM (SELECT DISTINCT doc_id, term FROM ex) GROUP BY 1)
          SELECT doc_id, term, tf, df, rank FROM (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   row_number() OVER (
                     PARTITION BY tf.doc_id
                     ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rank
            FROM tf JOIN df ON tf.term = df.term)
          WHERE rank <= 3""",
    "doc_tokens_bpe" ->
      """SELECT doc_id,
                len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                  AS n_bpe_tokens,
                len(list_distinct(
                  regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')))
                  AS n_uniq_bpe
         FROM documents""",
    "doc_winnow" ->
      s"""WITH norm AS (
            SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
            FROM documents),
          grams AS (
            SELECT doc_id,
                   list_transform(generate_series(1, length(t) - 7),
                     i -> ${strHashSql("substr(t, i, 8)")} % 1000000007) AS hs
            FROM norm WHERE length(t) >= 11)
          SELECT doc_id, unnest(list_distinct(
                   list_transform(generate_series(1, len(hs) - 3),
                     j -> list_min(hs[j:j+3])))) AS fp
          FROM grams""",
    "doc_tokens" ->
      s"""SELECT doc_id,
                 len($tokensSql) AS n_tokens,
                 len(list_distinct($tokensSql)) AS n_uniq_tokens,
                 length(text) AS n_chars_actual
          FROM documents""",
    "doc_quality" ->
      s"""SELECT doc_id,
                 len($tokensSql) AS n_tokens,
                 CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                   / len($tokensSql) AS mean_token_len,
                 CAST(len(list_filter($tokensSql,
                   t -> t IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
                   / len($tokensSql) AS stopword_ratio,
                 CAST(len(list_distinct($tokensSql)) AS DOUBLE)
                   / len($tokensSql) AS type_token_ratio
          FROM documents""",
    "doc_lang_guess" ->
      s"""SELECT doc_id, lang, en_hits, es_hits, de_hits,
                 CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
                      WHEN es_hits >= de_hits THEN 'es'
                      ELSE 'de' END AS lang_guess
          FROM (SELECT doc_id, lang,
                 len(list_filter($tokensSql, t -> t IN ('the','a','and','of'))) AS en_hits,
                 len(list_filter($tokensSql, t -> t IN ('el','la','de','y'))) AS es_hits,
                 len(list_filter($tokensSql, t -> t IN ('der','die','und','das'))) AS de_hits
                FROM documents)""",
    "doc_fingerprint" ->
      """SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
         FROM documents""",
    "doc_vocab_top" ->
      s"""SELECT tok, df, rk FROM (
            SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS rk
            FROM (SELECT tok, COUNT(*) AS df
                  FROM (SELECT doc_id, unnest(list_distinct($tokensSql)) AS tok
                        FROM documents)
                  GROUP BY tok))
          WHERE rk <= 20""",
    "doc_dedup_exact" ->
      """SELECT md5(substr(lower(text), 1, 64)) AS key_hash,
                COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
         FROM documents GROUP BY 1 HAVING COUNT(*) > 1""",
    "doc_ngram_jaccard" ->
      s"""WITH shingled AS (
            SELECT doc_id, source,
                   list_distinct(list_transform(
                     list_transform(
                       generate_series(1, len($tokensSql) - 2),
                       i -> array_to_string($tokensSql[i:i+2], ' ')),
                     g -> ${strHashSql("g")})) AS shingles
            FROM documents
            WHERE len($tokensSql) >= 3),
          ex AS (SELECT doc_id, source, unnest(shingles) AS sh FROM shingled),
          hot AS (SELECT source, sh FROM (
                    SELECT source, sh, COUNT(*) AS df
                    FROM ex GROUP BY source, sh)
                  WHERE df > $JaccardDfCap),
          kept AS (SELECT ex.doc_id, ex.source, ex.sh
                   FROM ex ANTI JOIN hot
                     ON ex.source = hot.source AND ex.sh = hot.sh),
          counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM kept a JOIN kept b ON a.source = b.source AND a.sh = b.sh
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, n_inter, ca.n_sh + cb.n_sh - n_inter AS n_union
          FROM inter
          JOIN counts ca ON ca.doc_id = doc_a
          JOIN counts cb ON cb.doc_id = doc_b
          WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.2"""
  )



  /** The est-only variants share the full queries' oracles, projected to
    * the est columns — the ORACLE may run the exact passes (its cost is
    * a test-time concern only); what matters is that the SPARK plans of
    * the `_est` queries contain none (PlanHygieneSpec).
    */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "doc_countmin_heavy_est" ->
      s"SELECT term, est_count FROM (${oraclesBase("doc_countmin_heavy")})",
    "doc_hll_distinct_est" ->
      ("SELECT m_max, s_scaled, est_q, v_zero, est_final_q FROM (" +
        oraclesBase("doc_hll_distinct") + ")"),
    "doc_bloom_probe_est" ->
      s"SELECT doc_id, n_shingles, n_maybe FROM (${oraclesBase("doc_bloom_probe")})",
    "doc_length_quantiles_est" ->
      s"SELECT q_permille, est_hi FROM (${oraclesBase("doc_length_quantiles")})",
    "doc_substring_dup" ->
      s"""WITH norm AS (
            SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
            FROM documents WHERE length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) >= 24),
          allg AS (
            SELECT DISTINCT doc_id, substr(t, i, 24) AS g
            FROM norm, LATERAL (SELECT unnest(generate_series(1, length(t) - 23)) AS i)),
          tiles AS (
            SELECT DISTINCT doc_id AS doc_b, substr(t, (j-1)*24 + 1, 24) AS g
            FROM norm, LATERAL (SELECT unnest(generate_series(1, length(t) // 24)) AS j)),
          sizes AS (
            SELECT g, COUNT(*) AS na, MIN(doc_id) AS rep FROM allg GROUP BY g),
          pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_b
            FROM allg a JOIN tiles b USING (g) JOIN sizes s USING (g)
            WHERE s.na <= ${graft.operators.Dedup.DefaultMaxBucket}
              AND a.doc_id < b.doc_b
            UNION ALL
            SELECT s.rep AS doc_a, a.doc_id AS doc_b
            FROM allg a JOIN sizes s USING (g)
            WHERE s.na > ${graft.operators.Dedup.DefaultMaxBucket}
              AND a.doc_id <> s.rep
              AND g IN (SELECT g FROM tiles))
          SELECT doc_a, doc_b, COUNT(*) AS n_shared
          FROM pairs GROUP BY 1, 2""",
    "doc_mix_weights" ->
      s"""WITH src AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(len($tokensSql)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source),
          w AS (SELECT source, n_docs, n_tokens,
                       CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS isq
                FROM src)
          SELECT source, n_docs, n_tokens,
                 CAST(1000 * isq // (SELECT SUM(isq) FROM w) AS BIGINT) AS weight_permille
          FROM w""",
    "doc_lm_surprisal" ->
      s"""WITH tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
            GROUP BY doc_id, tok),
          lm AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt
                 FROM tf GROUP BY tok),
          tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t,
                         CAST(COUNT(*) AS BIGINT) AS v FROM lm),
          sur AS (
            SELECT tok,
                   CAST(256 * (length(bin(q)) - 1)
                     + ((q * 256) >> (length(bin(q)) - 1)) - 4352
                     AS BIGINT) AS s_q
            FROM (SELECT tok, (t + v) * 65536 // (cnt + 1) AS q
                  FROM lm CROSS JOIN tot))
          SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
                 CAST(SUM(tf.tf * s.s_q) AS BIGINT) AS nll_q,
                 CAST(SUM(tf.tf * s.s_q) // SUM(tf.tf) AS BIGINT) AS ppl_bits_q
          FROM tf JOIN sur s USING (tok)
          GROUP BY tf.doc_id""",
    "doc_lm_backoff" ->
      s"""WITH docs AS (SELECT doc_id, $tokensSql AS toks FROM documents),
          rws AS (
            SELECT doc_id, i - 1 AS pos,
                   CASE WHEN i >= 2 THEN toks[i - 1] END AS prev,
                   toks[i] AS cur
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)),
          tr AS (
            SELECT * FROM rws
            WHERE $splitBucketSql < 90),
          uni AS (SELECT cur AS tok, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM tr GROUP BY cur),
          tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t,
                         CAST(COUNT(*) AS BIGINT) AS v FROM uni),
          big AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cnt_bi
                  FROM tr WHERE prev IS NOT NULL GROUP BY prev, cur),
          scored AS (
            SELECT r.doc_id,
                   CASE WHEN b.cnt_bi IS NOT NULL
                     THEN ${latSql("(up.cnt * 65536 // b.cnt_bi)")}
                     ELSE (CASE WHEN r.prev IS NULL THEN 0 ELSE 338 END)
                          + ${latSql("((t + v) * 65536 // (COALESCE(uc.cnt, 0) + 1))")}
                   END AS s_q
            FROM rws r
            LEFT JOIN uni uc ON uc.tok = r.cur
            LEFT JOIN uni up ON up.tok = r.prev
            LEFT JOIN big b ON b.prev = r.prev AND b.cur = r.cur
            CROSS JOIN tot)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(s_q) AS BIGINT) AS nll_q,
                 CAST(SUM(s_q) // COUNT(*) AS BIGINT) AS ppl_bits_q
          FROM scored GROUP BY doc_id""",
    "doc_dsir_weights" ->
      s"""WITH toks AS (
            SELECT doc_id, source, $tokensSql AS toks FROM documents
            WHERE len($tokensSql) >= 2),
          grams AS (
            SELECT doc_id, source,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])) AS gram
            FROM toks),
          tf AS (
            SELECT doc_id, source, ${strHashSql("gram")} % $DsirBuckets AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM grams GROUP BY 1, 2, 3),
          raw AS (SELECT bucket, CAST(SUM(tf) AS BIGINT) AS cnt_r
                  FROM tf GROUP BY bucket),
          tgt AS (SELECT bucket, CAST(SUM(tf) AS BIGINT) AS cnt_t
                  FROM tf WHERE source = '$DsirTarget' GROUP BY bucket),
          model AS (
            SELECT r.bucket, r.cnt_r, COALESCE(t.cnt_t, 0) AS cnt_t
            FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket),
          tot AS (SELECT CAST(SUM(cnt_r) AS BIGINT) AS tr,
                         CAST(SUM(cnt_t) AS BIGINT) AS tt FROM model),
          scored AS (
            SELECT bucket,
                   (256 * (length(bin(qr)) - 1) + ((qr * 256) >> (length(bin(qr)) - 1)) - 4352)
                 - (256 * (length(bin(qt)) - 1) + ((qt * 256) >> (length(bin(qt)) - 1)) - 4352)
                   AS dw_q
            FROM (SELECT bucket,
                    (tr + $DsirBuckets) * 65536 // (cnt_r + 1) AS qr,
                    (tt + $DsirBuckets) * 65536 // (cnt_t + 1) AS qt
                  FROM model CROSS JOIN tot))
          SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
                 CAST(SUM(tf.tf * s.dw_q) AS BIGINT) AS logw_q
          FROM tf JOIN scored s USING (bucket)
          GROUP BY tf.doc_id""",
    // The staged pipeline replayed stage-for-stage: split filter →
    // scrub (doc_pii_scrub's CTEs) → unigram-LM score over the CLEAN
    // text → keep ppl ≤ corpus mean bits-per-token → normalized-key
    // dedup keep-lowest-id → the doc_pack_chunks prefix-sum tail.
    "doc_pipeline_e2e" ->
      s"""WITH tr AS (
            SELECT doc_id, text FROM documents WHERE $splitBucketSql < 90),
          body AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com or admin@test.org now'
                        ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                        THEN ' call 555-'
                             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS b
            FROM tr),
          clean AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(b,
                     '$PiiEmailPat', '<EMAIL>', 'g'),
                     '$PiiPhonePat', '<PHONE>', 'g') AS c
            FROM body),
          tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                    unnest(string_split_regex(lower(trim(c)), '\\s+')) AS tok
                  FROM clean)
            GROUP BY doc_id, tok),
          lm AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt
                 FROM tf GROUP BY tok),
          tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t,
                         CAST(COUNT(*) AS BIGINT) AS v FROM lm),
          sur AS (
            SELECT tok, ${latSql("q")} AS s_q
            FROM (SELECT tok, (t + v) * 65536 // (cnt + 1) AS q
                  FROM lm CROSS JOIN tot)),
          scored AS (
            SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
                   CAST(SUM(tf.tf * s.s_q) AS BIGINT) AS nll_q,
                   CAST(SUM(tf.tf * s.s_q) // SUM(tf.tf) AS BIGINT)
                     AS ppl_bits_q
            FROM tf JOIN sur s USING (tok)
            GROUP BY tf.doc_id),
          thr AS (SELECT CAST(SUM(nll_q) AS BIGINT)
                       // CAST(SUM(n_tokens) AS BIGINT) AS th FROM scored),
          kept AS (
            SELECT s.doc_id, s.n_tokens FROM scored s, thr
            WHERE s.ppl_bits_q <= th),
          dedup AS (
            SELECT doc_id, n_tokens FROM (
              SELECT k.doc_id, k.n_tokens,
                     row_number() OVER (
                       PARTITION BY md5(substring(lower(c.c), 1, 64))
                       ORDER BY k.doc_id) AS rn
              FROM kept k JOIN clean c USING (doc_id))
            WHERE rn = 1),
          cum AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM dedup)
          SELECT doc_id, n_tokens,
                 CAST(cum - n_tokens AS BIGINT) AS start_off,
                 CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS chunk_first,
                 CAST(CASE WHEN n_tokens = 0
                   THEN (cum - n_tokens) // $PackBudget - 1
                   ELSE (cum - 1) // $PackBudget END AS BIGINT) AS chunk_last,
                 CAST(CASE WHEN n_tokens = 0 THEN 0
                   ELSE GREATEST((cum - 1) // $PackBudget
                     - (cum - n_tokens) // $PackBudget + 1, 0) END AS BIGINT)
                   AS n_chunks
          FROM cum""",
    "doc_lm_contrast" ->
      s"""WITH tf AS (
            SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, source, unnest($tokensSql) AS tok
                  FROM documents)
            GROUP BY 1, 2, 3),
          lm_all AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt
                     FROM tf GROUP BY tok),
          lm_tgt AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt
                     FROM tf WHERE source = '$DsirTarget' GROUP BY tok),
          ta AS (SELECT CAST(SUM(cnt) + COUNT(*) AS BIGINT) AS tv
                 FROM lm_all),
          tt AS (SELECT CAST(SUM(cnt) + COUNT(*) AS BIGINT) AS tv
                 FROM lm_tgt),
          sa AS (SELECT tok, CAST(${latSql("q")} AS BIGINT) AS s_all
                 FROM (SELECT tok,
                         (SELECT tv FROM ta) * 65536 // (cnt + 1) AS q
                       FROM lm_all)),
          st AS (SELECT tok, CAST(${latSql("q")} AS BIGINT) AS s_tgt
                 FROM (SELECT tok,
                         (SELECT tv FROM tt) * 65536 // (cnt + 1) AS q
                       FROM lm_tgt)),
          sc AS (
            SELECT tf.doc_id, tf.tf, a.s_all,
                   COALESCE(t.s_tgt,
                     ${latSql("((SELECT tv FROM tt) * 65536)")}) AS s_tgt
            FROM tf JOIN sa a USING (tok) LEFT JOIN st t USING (tok))
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                 CAST(SUM(tf * s_all) AS BIGINT) AS nll_all_q,
                 CAST(SUM(tf * s_tgt) AS BIGINT) AS nll_tgt_q,
                 CAST(SUM(tf * s_all) // SUM(tf)
                      - SUM(tf * s_tgt) // SUM(tf) AS BIGINT)
                   AS contrast_bits_q
          FROM sc GROUP BY doc_id""",
    "doc_temperature_sample" ->
      s"""WITH src AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source),
          w AS (SELECT source, n_docs,
                       CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
                         AS isq
                FROM src),
          r AS (SELECT source, n_docs,
                       ((SELECT SUM(n_docs) FROM src) // 10 * isq
                        // (SELECT SUM(isq) FROM w)) AS quota
                FROM w),
          rt AS (SELECT source,
                        CAST(LEAST(1000, 1000 * quota // n_docs) AS BIGINT)
                          AS rate_permille
                 FROM r)
          SELECT d.doc_id, d.source, rt.rate_permille
          FROM documents d JOIN rt USING (source)
          WHERE ${strHashSql("'tsamp:' || CAST(doc_id AS VARCHAR)")} % 1000
                < rt.rate_permille""",
    "doc_profile" ->
      s"""SELECT source,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_empty,
            CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
            CAST(MIN(length(text)) AS BIGINT) AS len_min,
            CAST(MAX(length(text)) AS BIGINT) AS len_max,
            CAST(SUM(length(text)) AS BIGINT) AS chars_total,
            CAST(SUM(len($tokensSql)) AS BIGINT) AS toks_total,
            CAST(SUM(length(text)) // COUNT(*) AS BIGINT) AS len_mean,
            CAST(SUM(len($tokensSql)) // COUNT(*) AS BIGINT) AS toks_mean
          FROM documents GROUP BY source""",
    "doc_shuffle_export" ->
      s"""WITH h AS (
            SELECT doc_id,
                   ${strHashSql("'shuf:' || CAST(doc_id AS VARCHAR)")} AS h
            FROM documents)
          SELECT CAST(h >> 54 AS BIGINT) AS shard,
                 CAST(row_number() OVER (PARTITION BY (h >> 54)
                   ORDER BY h, doc_id) AS BIGINT) AS pos,
                 doc_id
          FROM h""",
    "doc_gopher_rules" ->
      s"""WITH t AS (
            SELECT doc_id,
                   CAST(len($tokensSql) AS BIGINT) AS n,
                   CAST(len(list_distinct($tokensSql)) AS BIGINT) AS u,
                   CAST(length(regexp_replace(text, '\\s+', '', 'g'))
                     AS BIGINT) AS cns,
                   CAST(len(list_distinct(list_filter($tokensSql,
                     x -> x IN ('the','a','of','and','to','in','is','on'))))
                     AS BIGINT) AS nstop
            FROM documents)
          SELECT doc_id, n AS n_tokens,
                 CAST(CASE WHEN n >= 20 AND n <= 100000 THEN 1 ELSE 0 END
                   AS BIGINT) AS r_wc,
                 CAST(CASE WHEN cns * 2 >= n * 9 AND cns <= n * 10
                   THEN 1 ELSE 0 END AS BIGINT) AS r_mwl,
                 CAST(CASE WHEN nstop >= 2 THEN 1 ELSE 0 END
                   AS BIGINT) AS r_stop,
                 CAST(CASE WHEN (n - u) * 100 <= n * 65 THEN 1 ELSE 0 END
                   AS BIGINT) AS r_dup,
                 CAST(CASE WHEN n >= 20 AND n <= 100000
                        AND cns * 2 >= n * 9 AND cns <= n * 10
                        AND nstop >= 2
                        AND (n - u) * 100 <= n * 65
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
          FROM t""",
    "doc_line_dedup" ->
      s"""WITH docs AS (
            SELECT doc_id, $tokensSql AS toks FROM documents
            WHERE len($tokensSql) >= 12),
          segs AS (
            SELECT doc_id, CAST(k AS BIGINT) AS seg_idx,
                   ${strHashSql(
                     "array_to_string(toks[k*12+1 : k*12+12], ' ')")}
                     AS line_hash
            FROM docs, LATERAL (SELECT unnest(generate_series(
              0, (len(toks) // 12) - 1)) AS k)),
          rn AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (PARTITION BY line_hash
                     ORDER BY doc_id, seg_idx) AS rn
            FROM segs)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
                 CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
                 CAST(COUNT(*)
                   - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed
          FROM rn GROUP BY doc_id""",
    "doc_ccnet_bucket" ->
      s"""WITH tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
            GROUP BY doc_id, tok),
          lm AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt
                 FROM tf GROUP BY tok),
          tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t,
                         CAST(COUNT(*) AS BIGINT) AS v FROM lm),
          sur AS (
            SELECT tok, CAST(${latSql("q")} AS BIGINT) AS s_q
            FROM (SELECT tok, (t + v) * 65536 // (cnt + 1) AS q
                  FROM lm CROSS JOIN tot)),
          scored AS (
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf * s.s_q) // SUM(tf.tf) AS BIGINT)
                     AS ppl_bits_q
            FROM tf JOIN sur s USING (tok) GROUP BY tf.doc_id),
          sl AS (SELECT s.doc_id, d.lang, s.ppl_bits_q
                 FROM scored s JOIN documents d USING (doc_id)),
          hist AS (SELECT lang, ppl_bits_q, COUNT(*) AS c
                   FROM sl GROUP BY 1, 2),
          cum AS (SELECT lang, ppl_bits_q,
                         SUM(c) OVER (PARTITION BY lang
                           ORDER BY ppl_bits_q) AS cum,
                         SUM(c) OVER (PARTITION BY lang) AS total
                  FROM hist),
          thr AS (SELECT lang,
                         MIN(CASE WHEN cum * 3 >= total
                           THEN ppl_bits_q END) AS t1,
                         MIN(CASE WHEN cum * 3 >= total * 2
                           THEN ppl_bits_q END) AS t2
                  FROM cum GROUP BY lang)
          SELECT sl.doc_id, sl.lang, sl.ppl_bits_q,
                 CASE WHEN sl.ppl_bits_q <= t.t1 THEN 'head'
                      WHEN sl.ppl_bits_q <= t.t2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM sl JOIN thr t USING (lang)""",
    "doc_token_entropy" ->
      s"""WITH tf AS (
            SELECT doc_id, n_tokens, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                    CAST(len($tokensSql) AS BIGINT) AS n_tokens,
                    unnest($tokensSql) AS tok
                  FROM documents)
            GROUP BY doc_id, n_tokens, tok)
          SELECT doc_id, n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_uniq,
                 CAST(SUM(tf * ${latSql("(n_tokens * 65536 // tf)")})
                   // n_tokens AS BIGINT) AS ent_q
          FROM tf GROUP BY doc_id, n_tokens""")
}
