package graft.llm

import graft.Tables
import graft.api.GraftOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-curation operators (SURVEY.md §2.10 additions): sequence
  * packing, domain mixing under token budgets, deterministic
  * importance sampling, and pattern scrubbing. All four are thin
  * corpus bindings of [[graft.api.GraftOps]] — the oracle gate
  * verifies the API implementation itself.
  *
  * Scale notes: packing and mixing are partitioned windows (parallel
  * across sources — no global sort), sampling and scrubbing are pure
  * per-row maps (no shuffle). All arithmetic that decides an output
  * row is integer-exact, so both engines agree bit-for-bit.
  */
object Curation {

  /** Pack documents into 512-token training sequences per source. */
  def seqPack(spark: SparkSession, sf: String): DataFrame =
    GraftOps.seqPack(Tables.documents(spark, sf),
      "source", "doc_id", "text", budget = 512L)

  /** Per-source mix under a 2000-token budget, doc_id priority. */
  def mixBudget(spark: SparkSession, sf: String): DataFrame =
    GraftOps.mixBudget(Tables.documents(spark, sf),
      "source", "doc_id", "text", budget = 2000L)

  /** Length-weighted keep: P(keep) = min(n_chars, 400)/400 via the
    * portable key hash — longer docs kept proportionally more often,
    * the reweighting shape of quality-scored corpus sampling. */
  def weightedSample(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    GraftOps.weightedSample(
      Tables.documents(spark, sf)
        .select(col("doc_id"), col("n_chars"),
          least(col("n_chars"), lit(400)).cast("long").as("w")),
      "doc_id", "w", cap = 400L)
  }

  /** Scrub a term alternation, count hits per doc; the redacted text
    * is emitted as its md5 so the dump stays narrow while still
    * pinning every replaced byte. */
  def redact(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    GraftOps.redact(Tables.documents(spark, sf),
      "doc_id", "text", "customer|supplier", "[REDACTED]")
      .select(col("doc_id"), col("n_hits"),
        md5(col("redacted")).as("red_md5"))
  }

  /** Assembled 512-token packs: the actual training-sequence build
    * over [[seqPack]]'s assignment; the pack text is pinned by md5 so
    * the dump stays narrow while every concatenated byte is checked. */
  def packBuild(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    GraftOps.packTexts(Tables.documents(spark, sf),
      "source", "doc_id", "text", budget = 512L)
      .select(col("source"), col("pack_id"), col("n_docs"), col("tok"),
        md5(col("packed")).as("pack_md5"))
  }

  /** Int8-quantize the corpus embeddings for serving. */
  def embedQuant(spark: SparkSession, sf: String): DataFrame =
    GraftOps.quantizeInt8(Tables.embeddings(spark, sf), "vec_id", "embedding")

  /** Exact-200-document eval draw via the hash top-k. */
  def fixedSample(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    GraftOps.fixedSample(
      Tables.documents(spark, sf).select(col("doc_id"), col("n_chars")),
      "doc_id", 200)
      .orderBy("doc_id")
  }

  /** The curation chain END TO END as one scored query — dedup →
    * quality gate → sequence packing, the minimal real corpus build:
    * keep-first exact dedup (min doc_id per text), a token-bound +
    * stopword-floor gate on survivors, then 512-token packing per
    * source over what's left, summarized per (source, pack). Every
    * stage is a binding of the already-verified pieces; this entry
    * pins that they COMPOSE (filters change the packing windows'
    * inputs, so pack boundaries here differ from llm_seq_pack's).
    * Same shuffle budget as the parts: one text-hash agg, one
    * per-shard window, one keyed rollup. */
  def e2eCuration(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf)
    val keepers = GraftOps.exactDedup(d, "doc_id", "text")
      .select(org.apache.spark.sql.functions.col("keeper_id").as("doc_id"))
    val gated = d.join(keepers, "doc_id")
      .withColumn("_graft_toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("_graft_toks")).cast("long"))
      .withColumn("stop_milli", expr(
        "(cast(size(filter(_graft_toks, t -> t = 'the' OR t = 'a' OR " +
          "t = 'of' OR t = 'and' OR t = 'in')) as bigint) * 1000) div n_tok"))
      .filter(col("n_tok") >= 20L && col("n_tok") <= 2000L &&
        col("stop_milli") >= 100L)
      .select(col("source"), col("doc_id"), col("text"))
    GraftOps.seqPack(gated, "source", "doc_id", "text", budget = 512L)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
      .orderBy("source", "pack_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_e2e_curation" -> e2eCuration,
    "llm_fixed_sample" -> fixedSample,
    "llm_seq_pack" -> seqPack,
    "llm_pack_build" -> packBuild,
    "llm_mix_budget" -> mixBudget,
    "llm_weighted_sample" -> weightedSample,
    "llm_redact" -> redact,
    "llm_embed_quant" -> embedQuant
  )

  val oracle: Map[String, String] = Map(
    // The composed chain: keep-first dedup → gate → pack → rollup,
    // each stage the same SQL its standalone oracle uses.
    "llm_e2e_curation" ->
      ("WITH k AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
        "dd AS (SELECT d.* FROM documents d JOIN k USING (doc_id)), " +
        "g0 AS (SELECT source, doc_id, text, string_split(text, ' ') AS ts FROM dd), " +
        "g1 AS (SELECT source, doc_id, CAST(len(ts) AS BIGINT) AS n_tok, " +
        "(CAST(len(list_filter(ts, t -> t = 'the' OR t = 'a' OR t = 'of' " +
        "OR t = 'and' OR t = 'in')) AS BIGINT) * 1000) " +
        "// CAST(len(ts) AS BIGINT) AS stop_milli FROM g0), " +
        "g AS (SELECT source, doc_id, n_tok FROM g1 " +
        "WHERE n_tok >= 20 AND n_tok <= 2000 AND stop_milli >= 100), " +
        "p AS (SELECT source, doc_id, n_tok, " +
        "CAST(coalesce(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
        "// 512 AS pack_id FROM g) " +
        "SELECT source, pack_id, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_tok) AS BIGINT) AS sum_tok FROM p " +
        "GROUP BY source, pack_id ORDER BY source, pack_id"),
    "llm_fixed_sample" ->
      ("SELECT doc_id, n_chars FROM (" +
        "SELECT doc_id, n_chars FROM documents " +
        "ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id " +
        "LIMIT 200) t ORDER BY doc_id"),
    "llm_seq_pack" ->
      ("WITH t AS (SELECT source, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok " +
        "FROM documents) " +
        "SELECT source, doc_id, n_tok, " +
        "CAST(coalesce(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before, " +
        "CAST(coalesce(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 512 AS pack_id " +
        "FROM t ORDER BY source, doc_id"),
    "llm_pack_build" ->
      ("WITH t AS (SELECT source, doc_id, text, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
        "c AS (SELECT source, doc_id, text, n_tok, " +
        "CAST(coalesce(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 512 AS pack_id " +
        "FROM t) " +
        "SELECT source, pack_id, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_tok) AS BIGINT) AS tok, " +
        "md5(string_agg(text, ' ' ORDER BY doc_id)) AS pack_md5 " +
        "FROM c GROUP BY source, pack_id ORDER BY source, pack_id"),
    "llm_mix_budget" ->
      ("WITH t AS (SELECT source, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok " +
        "FROM documents), " +
        "c AS (SELECT source, n_tok, " +
        "coalesce(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before " +
        "FROM t) " +
        "SELECT source, COUNT(*) FILTER (cum_before < 2000) AS n_kept, " +
        "CAST(coalesce(SUM(n_tok) FILTER (cum_before < 2000), 0) AS BIGINT) AS tok_kept, " +
        "CAST(SUM(n_tok) AS BIGINT) AS tok_avail " +
        "FROM c GROUP BY source ORDER BY source"),
    "llm_weighted_sample" ->
      ("SELECT doc_id, n_chars, " +
        "CAST(least(n_chars, 400) AS BIGINT) AS w FROM documents " +
        "WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 " +
        "< CAST(least(n_chars, 400) AS BIGINT) * 10737418 " +
        "ORDER BY doc_id"),
    "llm_redact" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, 'customer|supplier')) AS BIGINT) AS n_hits, " +
        "md5(regexp_replace(text, 'customer|supplier', '[REDACTED]', 'g')) AS red_md5 " +
        "FROM documents ORDER BY doc_id"),
    "llm_embed_quant" ->
      ("WITH m AS (SELECT vec_id, embedding, " +
        "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma " +
        "FROM embeddings) " +
        "SELECT vec_id, CAST(ma / 127.0 AS REAL) AS scale, " +
        "array_to_string(list_transform(embedding, x -> CAST(CAST(" +
        "CASE WHEN ma = 0.0 THEN 0.0 " +
        "ELSE floor(CAST(x AS DOUBLE) * 127.0 / ma + 0.5) END " +
        "AS BIGINT) AS VARCHAR)), '|') AS q " +
        "FROM m ORDER BY vec_id")
  )
}
