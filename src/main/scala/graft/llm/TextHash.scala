package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document fingerprinting, SimHash, token counting and quality
  * scoring (training-data-pipeline operators beyond SURVEY §2.10).
  *
  * Cross-engine hashing: xxhash64 is Spark-only, so every hash that
  * must match the DuckDB oracle is a polynomial rolling hash
  * h = fold(chars, (a, c) => (a*31 + c) mod (2^31-1)) — plain integer
  * arithmetic, bit-identical on any engine. All scores are
  * integer-scaled (milli-units) so no float parity issues exist at
  * all. Everything is per-row HOF work plus one hash-shuffle — scales
  * linearly with the corpus.
  */
object TextHash {

  /** Whole-text fingerprint → dedup groups (corpus binding of
    * [[graft.api.GraftOps.fingerprintDedup]]). */
  def fingerprint(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.fingerprintDedup(
      Tables.documents(spark, sf), "doc_id", "text")

  /** 62-bit SimHash fingerprints (corpus binding of
    * [[graft.api.GraftOps.simhash]]); planted near-dups land at
    * Hamming distance 0–2. */
  def simhash(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.simhash(Tables.documents(spark, sf), "doc_id", "text")
      .orderBy("doc_id")

  /** SimHash near-dup pairs at Hamming ≤ 3 — the third standard text
    * near-dup shape next to MinHash-LSH and embedding cosine (corpus
    * binding of [[graft.api.GraftOps.simhashNearDup]], which holds the
    * banded-exactness argument). Hash and verification are
    * integer-exact in both engines, so the banded result equals the
    * all-pairs oracle row-for-row. */
  def simhashNearDup(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.simhashNearDup(
      Tables.documents(spark, sf), "doc_id", "text")

  /** Token counting three ways: whitespace, BPE-ish regex chunks,
    * chars/4 estimate. */
  def tokenCount(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long")
          .as("bpe_ish"),
        expr("(n_chars + 3) div 4").as("est_tokens"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio, punctuation count, average word
    * length — integer-scaled (milli) so exact on both engines. */
  def qualityScore(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("stop_cnt", expr(
        "cast(size(filter(split(text, ' '), t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'in')) as bigint)"))
      .withColumn("punct_cnt",
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long"))
      .select(col("doc_id"), col("n_tok"), col("stop_cnt"), col("punct_cnt"),
        expr("(stop_cnt * 1000) div n_tok").as("stop_milli"),
        expr("(n_chars * 1000) div n_tok").as("chars_per_tok_milli"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_fingerprint" -> fingerprint,
    "llm_simhash" -> simhash,
    "llm_simhash_neardup" -> simhashNearDup,
    "llm_token_count" -> tokenCount,
    "llm_quality_score" -> qualityScore
  )

  private def duckRoll(sqlStr: String, mult: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($sqlStr, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * $mult + b) % 2147483647)"

  private def duckHalf(mult: Int): String =
    (0 until 31).map { i =>
      s"(CASE WHEN 2 * len(list_filter(th$mult, h -> (h >> $i) % 2 = 1)) >= len(th$mult) THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "llm_fingerprint" ->
      (s"SELECT fp, MIN(doc_id) AS keeper_id, COUNT(*) AS cnt FROM " +
        s"(SELECT doc_id, ${duckRoll("text", 31)} AS fp FROM documents) t " +
        "GROUP BY fp ORDER BY keeper_id"),
    "llm_simhash" ->
      (s"SELECT doc_id, CAST(${duckHalf(31)} AS BIGINT) AS sh_lo, CAST(${duckHalf(131)} AS BIGINT) AS sh_hi FROM " +
        s"(SELECT doc_id, list_transform(string_split(text, ' '), t -> ${duckRoll("t", 31)}) AS th31, " +
        s"list_transform(string_split(text, ' '), t -> ${duckRoll("t", 131)}) AS th131 FROM documents) t " +
        "ORDER BY doc_id"),
    // Exact all-pairs Hamming over the same fingerprints; the banded
    // Spark plan equals it by the pigeonhole argument (see scaladoc).
    "llm_simhash_neardup" ->
      (s"WITH sh AS (SELECT doc_id, CAST(${duckHalf(31)} AS BIGINT) AS sh_lo, CAST(${duckHalf(131)} AS BIGINT) AS sh_hi FROM " +
        s"(SELECT doc_id, list_transform(string_split(text, ' '), t -> ${duckRoll("t", 31)}) AS th31, " +
        s"list_transform(string_split(text, ' '), t -> ${duckRoll("t", 131)}) AS th131 FROM documents) t) " +
        "SELECT x, y, ham FROM (SELECT a.doc_id AS x, b.doc_id AS y, " +
        "CAST(bit_count(xor(a.sh_lo, b.sh_lo)) + bit_count(xor(a.sh_hi, b.sh_hi)) AS BIGINT) AS ham " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) p " +
        "WHERE ham <= 3 ORDER BY x, y"),
    "llm_token_count" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS bpe_ish, " +
        "(n_chars + 3) // 4 AS est_tokens FROM documents ORDER BY doc_id"),
    "llm_quality_score" ->
      ("SELECT doc_id, n_tok, stop_cnt, punct_cnt, (stop_cnt * 1000) // n_tok AS stop_milli, " +
        "(n_chars * 1000) // n_tok AS chars_per_tok_milli FROM " +
        "(SELECT doc_id, n_chars, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, " +
        "CAST(len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'in')) AS BIGINT) AS stop_cnt, " +
        "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt " +
        "FROM documents) t ORDER BY doc_id")
  )
}
