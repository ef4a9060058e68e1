package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy-deduplication operators for document-scale pipelines: MinHash+LSH
  * and SimHash, built entirely from codegen'd Spark built-ins with
  * *arithmetically deterministic* hashes (md5-hex → integer, then affine
  * transforms mod a prime), so every stage is reproducible across engines
  * and is oracle-checkable in SQL.
  *
  * Scale shape (the standard one for 100 TB corpora):
  *   - shingle/token explode is map-side only;
  *   - signatures need one shuffle on (doc, hashIndex);
  *   - candidate generation joins on (band, bandKey) — the LSH blocking
  *     step that keeps the pair space near-linear instead of O(n²);
  *   - only candidates are verified, never the full cross product.
  */
object Dedup {

  val P: Long = 1000000007L
  val NumHashes = 16
  val BandRows = 4 // 4 bands × 4 rows

  /** Default hot-bucket cap for the banding self-joins (minhash bands,
    * simhash segments). A bucket of b docs emits b² candidate pairs, so one
    * viral band key (boilerplate shared by 30% of a corpus) makes the join
    * quadratic; 1024 bounds any single bucket's all-pairs fan-out to ~1M —
    * one task's worth of work — while leaving realistic near-dup clusters
    * (orders of magnitude smaller) untouched.
    *
    * Buckets OVER the cap are not dropped (that would make the largest
    * duplicate families — the primary dedup target — invisible): each
    * member instead pairs with the bucket's MIN-doc representative, O(b)
    * pairs per bucket. The family stays connected (a star through the
    * representative, so connected-components still recovers the full
    * cluster) at linear cost; only the intra-family pair ENUMERATION is
    * sacrificed. The cap and the representative rule are part of the
    * operator contract and mirrored exactly in the DuckDB oracles; pass
    * `maxBucket = 0` for the uncapped exact variant.
    */
  val DefaultMaxBucket = 1024

  /** Deterministic 60-bit integer hash of a string: first 15 hex chars of
    * md5, parsed base-16 (identical in DuckDB via positional hex parse).
    */
  def strHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word k-gram shingles of a token array (needs >= k tokens). */
  def shingles(toks: Column, k: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** The C4/CCNet line-dedup segmentation: non-overlapping full
    * `width`-token windows of the normalized text, one row per segment
    * with its position and 60-bit hash — (idCol, seg_idx, line_hash).
    * ONE definition shared by the batch `doc_line_dedup` query and the
    * at-ingest [[graft.streaming.StreamingLineDedup]] (their
    * first-occurrence semantics must agree on what a segment IS, or
    * replaying history through the other path would change the
    * survivor set). Trailing partial windows are dropped — a common
    * short tail must not masquerade as cross-doc boilerplate
    * (the doc_boilerplate rationale). Docs under `width` tokens emit
    * no rows.
    */
  def segments(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 12): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= width)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), expr(s"(size(toks) div $width) - 1")),
        k => concat_ws(" ",
          slice(col("toks"), (k * width + 1).cast("int"), lit(width))))))
      .select(col(idCol), col("pos").cast("long").as("seg_idx"),
        strHash(col("col")).as("line_hash"))

  /** MinHash signatures: one row per (doc_id, hash index 0..NumHashes-1)
    * with the min affine-transformed shingle hash. Affine params derive
    * from the index alone: a_i = ((i+1)·2654435761) mod P,
    * b_i = ((i+1)·40503 + 7) mod P.
    *
    * The NumHashes mins are computed as NumHashes aggregate COLUMNS over
    * the (doc_id, shingle-hash) rows — the same trick [[simhash]] uses —
    * so the shuffle carries one row per shingle, not ×NumHashes exploded
    * copies (16× less exchange volume at any scale). The per-index rows
    * the downstream banding expects are re-derived by a posexplode of the
    * 16-element result per doc (output rows = docs × 16, trivial).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(shingles(col("toks"))).as("sh"))
      .select(col("doc_id"), (strHash(col("sh")) % P).as("h"))
    val minCols = (0 until NumHashes).map { i =>
      val a = ((i + 1) * 2654435761L) % P
      val b = ((i + 1) * 40503L + 7) % P
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$i")
    }
    sh.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until NumHashes).map(i => col(s"m$i")): _*)))
      .toDF("doc_id", "i", "sig")
  }

  /** LSH candidate pairs: docs sharing at least one full band of the
    * signature. Returns (doc_a, doc_b, n_shared_bands).
    *
    * The hot-bucket guard is ON by default ([[DefaultMaxBucket]], mirrored
    * in the oracle SQL): band buckets larger than `maxBucket` switch from
    * all-pairs to representative linking — every member pairs with the
    * bucket's min doc_id — bounding any one bucket's fan-out to O(b) while
    * keeping the family connected for downstream clustering.
    * `maxBucket = 0` disables the guard (exact, quadratic on a viral key).
    */
  /** Per-doc LSH band keys from [[minhashSignatures]] rows: one row per
    * (doc_id, band) with the band's signature slice joined into a string
    * key. Shared by the batch candidate join below and the streaming
    * signature index ([[graft.streaming.StreamingNearDup]]).
    */
  def bandKeys(signatures: DataFrame): DataFrame =
    signatures
      .withColumn("band", col("i") / lit(BandRows) cast "long")
      .groupBy("doc_id", "band")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("i"), col("sig")))),
        s => s.getField("sig").cast("string")), ",").as("band_key"))

  /** One row per doc with the full signature as a NumHashes-element
    * array (index order) — the compare payload for signature-agreement
    * similarity estimates.
    */
  def sigArray(signatures: DataFrame): DataFrame =
    signatures.groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("sig")))),
        s => s.getField("sig")).as("sig"))

  def minhashCandidates(signatures: DataFrame,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val allBands = bandKeys(signatures)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (maxBucket <= 0) {
      val a = allBands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
      val b = allBands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
      val pairs = a.join(b, Seq("band", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared_bands"))
      Caching.materializeAndRelease(pairs, allBands)
    } else {
      // one aggregation feeds both the small-bucket filter and the
      // oversized-bucket representatives (persisted: two consumers)
      val sizes = allBands.groupBy("band", "band_key")
        .agg(count(lit(1)).as("bucket_n"), min(col("doc_id")).as("rep"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val small = allBands.join(
        sizes.filter(col("bucket_n") <= maxBucket).select("band", "band_key"),
        Seq("band", "band_key"), "left_semi")
      val a = small.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
      val b = small.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
      val smallPairs = a.join(b, Seq("band", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      // rep = bucket min ⇒ doc_a < doc_b holds by construction
      val bigPairs = allBands.join(
        sizes.filter(col("bucket_n") > maxBucket)
          .select(col("band"), col("band_key"), col("rep")),
        Seq("band", "band_key"))
        .filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
      val pairs = smallPairs.unionByName(bigPairs)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared_bands"))
      Caching.materializeAndRelease(pairs, allBands, sizes)
    }
  }

  val SimHashBits = 48

  /** SimHash per document over token hashes: bit j of the fingerprint is
    * the sign of Σ_tokens (2·bit_j(hash(token)) − 1). Returns
    * (doc_id, simhash) with simhash in [0, 2^48).
    *
    * The 48 per-bit sums are aggregated as 48 columns in ONE groupBy —
    * not a ×48 row explode — so the shuffle carries one row per (doc,
    * token) and a single aggregation pass per doc (48× less exchange
    * data; this took the sf0.1 bench for the pair query from 248 s to
    * seconds).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perToken = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), strHash(col("tok")).as("h"))
    val bitSums = (0 until SimHashBits).map { j =>
      val p = 1L << j
      sum((expr(s"(h div ${p}L) % 2") * 2 - 1).cast("long")).as(s"s$j")
    }
    perToken
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimHashBits).map { j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within a blocking key (e.g. source), with
    * Hamming distance at most `maxHamming`. O(block²) within a block —
    * superseded as the declared query by [[simhashPairsBanded]], which has
    * no quadratic region; kept for corpora with many small natural blocks.
    */
  def simhashPairs(sims: DataFrame, blockedBy: DataFrame, maxHamming: Int): DataFrame = {
    // The fingerprint table is tiny relative to its compute cost; persist
    // so the self-join's two branches don't recompute the whole pipeline.
    val withBlock = sims.join(blockedBy, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = withBlock.select(col("doc_id").as("doc_a"), col("block"),
      col("simhash").as("sim_a"))
    val b = withBlock.select(col("doc_id").as("doc_b"), col("block"),
      col("simhash").as("sim_b"))
    val pairs = a.join(b, "block")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
    Caching.materializeAndRelease(pairs, withBlock)
  }

  /** SimHash near-dup pairs, fingerprint-segment-banded (Manku et al.'s
    * pigeonhole blocking, the standard web-scale formulation): the 48-bit
    * fingerprint splits into `segments` equal slices; candidate pairs must
    * agree exactly on at least one slice, then the exact Hamming filter
    * runs on candidates only. The plan is an equi-join on (segment index,
    * segment value) + distinct — near-linear, no per-source O(block²).
    *
    * Recall contract: pigeonhole guarantees recall 1.0 for pairs with
    * Hamming < `segments`; above that the banding is part of the operator
    * definition (mirrored exactly in the oracle — the fingerprint is
    * integer arithmetic, so both engines compute identical candidates).
    * With the defaults (4 × 12-bit segments, maxHamming 16) a 100 TB run
    * would raise `segments`/fingerprint bits with corpus size to keep
    * per-bucket counts bounded.
    *
    * The hot-bucket guard is ON by default ([[DefaultMaxBucket]], mirrored
    * in the oracle): segment buckets larger than `maxBucket` switch from
    * all-pairs to representative linking (member ↔ bucket-min doc, O(b)) —
    * one viral 12-bit segment value shared by a boilerplate family would
    * otherwise make the pair join quadratic. Representative pairs still
    * pass through the exact Hamming verify.
    */
  def simhashPairsBanded(
      sims: DataFrame,
      maxHamming: Int,
      segments: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val segBits = SimHashBits / segments
    // persist: the segment self-join's two branches reuse the fingerprints
    // (ownership-aware — a caller-cached sims keeps its cache)
    val (fp, ownsFp) = Caching.ownPersist(sims)
    val segArr = array((0 until segments).map { k =>
      shiftright(col("simhash"), k * segBits) % lit(1L << segBits)
    }: _*)
    val allSeg = fp.select(col("doc_id"), col("simhash"),
      posexplode(segArr)).toDF("doc_id", "simhash", "seg_i", "seg_v")
    val candidates =
      if (maxBucket <= 0) {
        val a = allSeg.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
          col("seg_i"), col("seg_v"))
        val b = allSeg.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
          col("seg_i"), col("seg_v"))
        a.join(b, Seq("seg_i", "seg_v"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sim_a", "sim_b")
      } else {
        // Bucket-stats joins carry explicit broadcast hints (round-18
        // pin): the stats table is bounded by segments·2^segBits rows at
        // ANY corpus size, so broadcasting is always right — and leaving
        // it stats-driven is what let BENCH_r17's simhash_pairs signature
        // jump 19.6× with zero code changes (the cached-fingerprint size
        // estimate crossed the broadcast threshold on a hammered box and
        // every join on the chain flipped to shuffle: 40,159 → 787,745
        // records, reproduced at 788,109 by forcing the threshold down).
        // The corpus-sized a/b branches stay size-driven on purpose —
        // broadcasting a corpus side would be the real scale bug.
        // …but the bound is only SMALL for segBits ≤ ~22 (default
        // segments=4 → 12 bits → ≤16K rows). A caller passing segments=1
        // or 2 makes 2^segBits astronomical and the actual table grows
        // with the corpus — forcing broadcast there overrides Spark's
        // size-based safety and risks driver OOM (ADVICE_r18). The hint
        // gates on the closed-form bound; oversized configs fall back to
        // the stats-driven join.
        val statsBounded = segBits <= 22 &&
          segments.toLong * (1L << segBits) <= (1L << 22)
        def hinted(df: DataFrame): DataFrame =
          if (statsBounded) broadcast(df) else df
        val sizes = allSeg.groupBy("seg_i", "seg_v")
          .agg(count(lit(1)).as("bucket_n"), min(col("doc_id")).as("rep"),
            min_by(col("simhash"), col("doc_id")).as("rep_sim"))
        val small = allSeg.join(
          hinted(sizes.filter(col("bucket_n") <= maxBucket)
            .select("seg_i", "seg_v")),
          Seq("seg_i", "seg_v"), "left_semi")
        val a = small.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
          col("seg_i"), col("seg_v"))
        val b = small.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
          col("seg_i"), col("seg_v"))
        val smallPairs = a.join(b, Seq("seg_i", "seg_v"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sim_a", "sim_b")
        // rep = bucket min ⇒ doc_a < doc_b by construction; rep's
        // fingerprint rides along via min_by (doc_id is unique ⇒
        // deterministic)
        val bigPairs = allSeg.join(
          hinted(sizes.filter(col("bucket_n") > maxBucket)
            .select(col("seg_i"), col("seg_v"), col("rep"), col("rep_sim"))),
          Seq("seg_i", "seg_v"))
          .filter(col("doc_id") =!= col("rep"))
          .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
            col("rep_sim").as("sim_a"), col("simhash").as("sim_b"))
        smallPairs.unionByName(bigPairs)
      }
    val pairs = candidates
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
    Caching.materializeAndRelease(pairs, (if (ownsFp) Seq(fp) else Nil): _*)
  }

  /** EXACT substring-run dedup (the suffix-array dedup's hash-join form)
    * with the [[DefaultMaxBucket]] hot-gram guard: any two docs sharing an
    * exact normalized run of ≥ 2k−1 chars are guaranteed caught — the run
    * inside the higher-id doc fully contains one of that doc's k-aligned
    * tiles, and the lower-id doc contributes a k-gram at EVERY position,
    * so the tile string must collide. The join key is the gram STRING
    * itself (not a hash): zero false positives, no post-verify needed.
    *
    * Hot-gram guard (same discipline as [[minhashCandidates]]): a
    * boilerplate k-gram shared by > maxBucket docs would flood its join
    * key (na·nb matched rows, quadratic on a viral gram). Because every
    * aligned tile is also an every-position gram of the same doc, the
    * tiles-side doc set for a gram is a SUBSET of the every-position
    * side's — so bucket size (na) and the min-doc representative are
    * computed on the every-position side alone. Grams with na ≤ maxBucket
    * join exactly; hotter grams that appear as at least one doc's tile
    * switch to representative linking (every containing doc pairs with
    * the gram's min doc_id — O(na) rows, family stays connected for
    * downstream clustering); hot grams that are NO doc's tile produce no
    * pairs, exactly as in the uncapped join. Returns
    * (doc_a, doc_b, n_shared) where n_shared counts matched tiles for
    * exact grams plus one per hot-gram representative link — the same
    * count-the-links contract as `n_shared_bands`. The cap and the
    * representative rule are mirrored exactly in the DuckDB oracle;
    * `maxBucket = 0` disables the guard.
    */
  def substringDupPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 24,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val base = docs
      .filter(length(norm) >= k)
      .select(col(idCol).as("doc_id"), norm.as("t"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val allG = base.select(col("doc_id"),
      explode(array_distinct(
        transform(sequence(lit(1), length(col("t")) - (k - 1)),
          i => col("t").substr(i, lit(k))))).as("g"))
    val tiles = base.select(col("doc_id").as("doc_b"),
      explode(array_distinct(
        transform(sequence(lit(1), (length(col("t")) / k).cast("int")),
          j => col("t").substr((j - lit(1)) * k + 1, lit(k))))).as("g"))
    if (maxBucket <= 0) {
      allG.join(tiles, "g")
        .filter(col("doc_id") < col("doc_b"))
        .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
    } else {
      // Over-cap grams are structurally rare — at most |allG|/maxBucket
      // and in practice a handful of boilerplate strings — so the guard
      // is a BROADCAST of the hot set, not a second big-big join: the
      // gram table pays one aggregation shuffle to find the hot grams,
      // then the exact join runs as in the uncapped path with a map-side
      // anti-join excluding them, and the representative links come from
      // one more map-side broadcast join. (The r9-capped form annotated
      // every gram row with its bucket size via allG⋈sizes — a
      // same-cardinality sort-merge join executed once per consumer
      // branch; 7× slower at sf0.1.) If a corpus ever has more than
      // ~10^6 boilerplate grams over the cap the broadcast is the limit
      // to revisit — at that point substring dedup wants a boilerplate
      // strip pass first, not a bigger join.
      // The gram table is consumed three times (sizes agg, exact join,
      // hot-link probe) and deliberately NOT persisted: re-running the
      // map-side explode is cheaper than materializing the gram rows
      // (measured at sf0.1: persist+checkpoint 3.2-3.8 s vs 2.1-3.0 s
      // recompute; same verdict as the r9 SMJ form's persist A/B).
      val sizes = allG.groupBy("g")
        .agg(count(lit(1)).as("na"), min(col("doc_id")).as("rep"))
      val hot = sizes.filter(col("na") > maxBucket).select("g", "rep")
      val smallPairs = allG
        .join(broadcast(hot), Seq("g"), "left_anti")
        .join(tiles, "g")
        .filter(col("doc_id") < col("doc_b"))
        .select(col("doc_id").as("doc_a"), col("doc_b"))
      // hot grams count only when they are at least one doc's tile —
      // map-side probe of the (cheap, 1/k-dense) tiles side, then one
      // representative link per containing doc.
      val hotTile = tiles.join(broadcast(hot), Seq("g"), "left_semi")
        .select("g").distinct()
      // rep = bucket min over the superset side ⇒ doc_a < doc_b holds
      val hotPairs = allG
        .join(broadcast(hot.join(hotTile, "g")), "g")
        .filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
      smallPairs.unionByName(hotPairs)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared"))
    }
  }
}
