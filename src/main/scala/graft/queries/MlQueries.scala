package graft.queries

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators over `documents`/`embeddings`: MinHash+LSH,
  * SimHash, embedding kNN (exact + LSH-bucketed), and multimodal binary
  * plumbing. All hashes are arithmetically deterministic, so even the
  * fuzzy-dedup stages are exact-oracle-checked; only the iterative-fp /
  * approximate outputs (LSH ANN) take the rows-only check.
  */
object MlQueries {
  import Tables.tbl

  /** DuckDB SQL for [[Dedup.strHash]]: positional parse of the first 15
    * md5 hex chars (DuckDB has no base-16 conv).
    */
  private def strHashSql(e: String): String = {
    val terms = (1 to 15).map { k =>
      val pow = java.lang.Long.parseLong("1" + "0" * (15 - k), 16)
      s"(strpos('0123456789abcdef', substr(md5($e), $k, 1)) - 1) * ${pow}::BIGINT"
    }
    "(" + terms.mkString(" + ") + ")"
  }

  private val toksSql = "string_split_regex(lower(trim(text)), '\\s+')"
  private val shinglesSql =
    s"""list_distinct(list_transform(
          generate_series(1, len($toksSql) - 2),
          i -> array_to_string(($toksSql)[i:i+2], ' ')))"""

  private val P = Dedup.P

  private val sigSql =
    s"""SELECT doc_id, i, MIN(v) AS sig FROM (
          SELECT doc_id, i,
                 ((((i + 1) * 2654435761) % $P) * h
                  + ((i + 1) * 40503 + 7) % $P) % $P AS v
          FROM (
            SELECT doc_id, ${strHashSql("sh")} % $P AS h
            FROM (SELECT doc_id, unnest($shinglesSql) AS sh
                  FROM documents WHERE len($toksSql) >= 3)),
               generate_series(0, ${Dedup.NumHashes - 1}) t(i))
        GROUP BY doc_id, i"""

  private val simhashSql =
    s"""SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                 AS simhash
        FROM (
          SELECT doc_id, j, SUM(((h // (1::BIGINT << j)) % 2) * 2 - 1) AS s
          FROM (SELECT doc_id, ${strHashSql("tok")} AS h
                FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)),
               generate_series(0, ${Dedup.SimHashBits - 1}) t(j)
          GROUP BY doc_id, j)
        GROUP BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(tbl(s, dir, "documents"), "doc_id", "text")),

    "minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashCandidates(
        Dedup.minhashSignatures(tbl(s, dir, "documents"), "doc_id", "text"))),

    "simhash_sig" -> ((s, dir) =>
      Dedup.simhash(tbl(s, dir, "documents"), "doc_id", "text")),

    "simhash_pairs" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      Dedup.simhashPairs(
        Dedup.simhash(docs, "doc_id", "text"),
        docs.select(col("doc_id"), col("source").as("block")),
        maxHamming = 16)
    }),

    "emb_knn" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),

    // Approximate ANN — rows-only check (bucketed approximation).
    "emb_lsh_ann" -> ((s, dir) =>
      Similarity.lshKnn(tbl(s, dir, "embeddings"), k = 5)),

    // Exact cosine near-dup pairs above threshold (embedding-space dedup).
    "emb_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(tbl(s, dir, "embeddings"), threshold = 0.3)),

    "mm_binary_meta" -> ((s, dir) => {
      val media = tbl(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.asMedia(col("text").cast("binary"), "text/plain").as("media"))
      Multimodal.binaryMeta(media, "doc_id", "media")
    }),

    "mm_decode_features" -> ((s, dir) => {
      val media = tbl(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.asMedia(col("text").cast("binary"), "text/plain").as("media"))
      Multimodal.decodeStub(media, "doc_id", "media")
    }),

    "mm_frame_sample" -> ((s, dir) => {
      val media = tbl(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.asMedia(col("text").cast("binary"), "text/plain").as("media"))
      Multimodal.frameSampleStub(media, "doc_id", "media", stride = 64)
    })
  )

  val oracles: Map[String, String] = Map(
    "minhash_sig" -> sigSql,
    "minhash_lsh_pairs" ->
      s"""WITH sig AS ($sigSql),
          bands AS (
            SELECT doc_id, i // ${Dedup.BandRows} AS band,
                   string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS band_key
            FROM sig GROUP BY doc_id, i // ${Dedup.BandRows})
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 COUNT(*) AS n_shared_bands
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
          GROUP BY 1, 2""",
    "simhash_sig" -> simhashSql,
    "simhash_pairs" ->
      s"""WITH sim AS ($simhashSql)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM sim a
          JOIN documents da ON da.doc_id = a.doc_id
          JOIN sim b ON a.doc_id < b.doc_id
          JOIN documents db ON db.doc_id = b.doc_id AND da.source = db.source
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 16""",
    "emb_knn" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                             e.vec_id) AS rank
           FROM embeddings e,
                (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q
           WHERE e.vec_id <> q.vec_id)
         WHERE rank <= 5""",
    "emb_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3""",
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
                sha256(text) AS content_sha256,
                'text/plain' AS mime
         FROM documents""",
    "mm_decode_features" ->
      """SELECT doc_id AS id, d.dim,
                CASE d.dim
                  WHEN 0 THEN CAST(length(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE)
                              / length(text)
                  WHEN 1 THEN CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                              / length(text)
                  ELSE 0.0
                END AS value
         FROM documents, (SELECT unnest([0,1,2,3]) AS dim) d""",
    "mm_frame_sample" ->
      """SELECT doc_id AS id,
                CAST(unnest(range(0, CAST(octet_length(encode(text)) AS BIGINT), 64))
                     AS BIGINT) AS frame_offset
         FROM documents"""
  )
}
