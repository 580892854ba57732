package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators (SURVEY.md §2.10): token statistics,
  * language/quality filtering, and the documents⋈embeddings
  * "multimodal" join. All integer-exact aggregations — no float
  * parity concerns.
  */
object TextStats {

  /** Per-(lang, source) doc/char/token statistics. Two independent
    * aggregations (doc-grain and token-grain) joined on the group key
    * — both shuffle-parallel; the token explode is the UDTF-style
    * row expansion. */
  def textStats(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
    val base = d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val toks = d.select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct_tokens"))
    base.join(toks, Seq("lang", "source"))
      .orderBy("lang", "source")
  }

  /** Language + length filter with integer length buckets. */
  def langFilter(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .filter(col("lang") === "en" && col("n_chars").between(150, 400))
      .groupBy(expr("n_chars div 50").as("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("n_chars")).as("mn"),
        max(col("n_chars")).as("mx"))
      .orderBy("bucket")

  /** documents⋈embeddings by id — text and vector metadata side by
    * side, then per-label corpus stats. */
  def multimodalJoin(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
    val e = Tables.embeddings(spark, sf)
    d.join(e, d("doc_id") === e("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en_cnt"))
      .orderBy("label")
  }

  /** Overflow-free portable key hash (same shape as sample_hash: the
    * key reduced mod 2^31 before the Knuth multiply). */
  private val keyHash =
    "((doc_id % 2147483648) * 2654435761) % 4294967296"

  /** Stratified 20% sample: EXACTLY floor(20%) of each language
    * stratum, selected by portable key-hash order — unlike a plain
    * hash filter, small strata are never over/under-sampled, and
    * unlike rand() the selection is a pure function of the data. One
    * window shuffle on the stratum key; at 100 TB the per-stratum
    * ordering is the only per-key serial step, and strata (languages)
    * are few and balanced enough that per-key parallel top-k (rank by
    * hash) is the same plan Spark already picks. */
  def stratifiedSample(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps
      .stratifiedSample(Tables.documents(spark, sf), "lang", "doc_id", 5)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "doc_id")

  /** Text normalization — the cleaning step ahead of tokenization /
    * dedup: lowercase, non-alphanumerics to spaces, whitespace
    * collapsed, trimmed. POSIX-simple character classes only, so both
    * regex engines agree byte-for-byte. Per-row work, linear scale. */
  def normalize(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.normalize(Tables.documents(spark, sf), "doc_id", "text")

  /** Fixed-size token chunking with overlap (window 40 tokens, stride
    * 30) — the context-window preparation step for training/RAG
    * pipelines: each document explodes into its chunk rows, chunk text
    * re-joined from the token slice. Pure per-row explode, linear
    * scale; output volume is bounded at ~4/3 of the token count. */
  def docChunks(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.tokenChunks(Tables.documents(spark, sf),
      "doc_id", "text", window = 40, stride = 30)

  /** Top-5 TF-IDF terms per document — the classic salient-term
    * extractor. tf/df/N are exact integers from two keyed
    * aggregations; only the final score touches a transcendental
    * (`ln(N/df)`), narrowed to FLOAT on both engines so libm ulp
    * differences cannot reorder ranks (D8). The corpus total N is a
    * 1-row broadcast, not a collect. Rank ties break on term text.
    * Scale: explode + two hash aggregations + a broadcast dim join —
    * all shuffle-parallel on (doc, term) / term keys. */
  def tfidf(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.tfidfTopTerms(Tables.documents(spark, sf),
      "doc_id", "text", k = 5)

  /** Within-document 2-gram repetition ratio — the Gopher/Falcon-style
    * repetitive-text quality filter (corpus binding of
    * [[graft.api.GraftOps.repetitionRatio]]): integer milli-ratio of
    * duplicated word bigrams per document. */
  def repNgram(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.repetitionRatio(
      Tables.documents(spark, sf), "doc_id", "text", 2)

  /** Benchmark decontamination (corpus binding of
    * [[graft.api.GraftOps.shingleOverlap]]): word-3-gram overlap of
    * every training candidate (doc_id >= 10) against the held-out
    * benchmark set (doc_id < 10) — the train/test-contamination check
    * every serious pipeline runs before training. The benchmark
    * shingle set is broadcast; the corpus side never shuffles before
    * its per-doc count. */
  def decontaminate(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
    graft.api.GraftOps.shingleOverlap(
      d.filter(col("doc_id") >= 10), "doc_id", "text",
      d.filter(col("doc_id") < 10), "doc_id", "text", 3)
  }

  /** Corpus-wide word-bigram frequency table (corpus binding of
    * [[graft.api.GraftOps.ngramCounts]]): the n-gram LM /
    * contamination-index build, bigrams occurring ≥ 5 times. */
  def ngramCounts(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.ngramCounts(
      Tables.documents(spark, sf), "text", n = 2, minCount = 5L)

  /** Composite quality gate (corpus binding of
    * [[graft.api.GraftOps.qualityGate]]): token-count bounds [20, 95],
    * bigram repetition ≤ 80‰, stopword ratio ≥ 20‰ — thresholds set
    * from the measured corpus quartiles so every rule discriminates. */
  def qualityGate(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.qualityGate(
      Tables.documents(spark, sf), "doc_id", "text",
      minTok = 20L, maxTok = 95L, maxRepMilli = 80L, minStopMilli = 20L,
      stopwords = Seq("the", "a", "of", "and", "in"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_quality_gate" -> qualityGate,
    "llm_ngram_counts" -> ngramCounts,
    "llm_pmi_bigrams" -> ((s, d) => graft.api.GraftOps.pmiBigrams(
      Tables.documents(s, d), "text", minCount = 5L, k = 40)),
    "llm_token_entropy" -> ((s, d) => graft.api.GraftOps.tokenEntropy(
      Tables.documents(s, d), "doc_id", "text")),
    "llm_tfidf" -> tfidf,
    "llm_text_stats" -> textStats,
    "llm_lang_filter" -> langFilter,
    "llm_multimodal_join" -> multimodalJoin,
    "llm_stratified_sample" -> stratifiedSample,
    "llm_normalize" -> normalize,
    "llm_doc_chunks" -> docChunks,
    "llm_rep_ngram" -> repNgram,
    "llm_decontaminate" -> decontaminate
  )

  val oracle: Map[String, String] = Map(
    // Distinct hashed bigrams ≡ distinct string bigrams absent 64-bit
    // collisions — the same contract llm_rep_ngram's oracle relies on.
    "llm_quality_gate" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "s AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok, " +
        "CAST(len(list_filter(ts, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'in')) AS BIGINT) * 1000 " +
        "// CAST(len(ts) AS BIGINT) AS stop_milli FROM t), " +
        "g AS (SELECT doc_id, ts[i+1] || ' ' || ts[i+2] AS bg " +
        "FROM t, LATERAL (SELECT unnest(range(len(ts) - 1)) AS i) l), " +
        "r AS (SELECT doc_id, (COUNT(*) - COUNT(DISTINCT bg)) * 1000 // COUNT(*) AS rep_milli " +
        "FROM g GROUP BY doc_id) " +
        "SELECT s.doc_id, n_tok, rep_milli, stop_milli, " +
        "CAST(CASE WHEN n_tok < 20 OR n_tok > 95 THEN 1 ELSE 0 END " +
        "+ CASE WHEN rep_milli > 80 THEN 2 ELSE 0 END " +
        "+ CASE WHEN stop_milli < 20 THEN 4 ELSE 0 END AS BIGINT) AS gate_bits, " +
        "(CASE WHEN n_tok < 20 OR n_tok > 95 THEN 1 ELSE 0 END " +
        "+ CASE WHEN rep_milli > 80 THEN 2 ELSE 0 END " +
        "+ CASE WHEN stop_milli < 20 THEN 4 ELSE 0 END) = 0 AS keep " +
        "FROM s JOIN r ON s.doc_id = r.doc_id ORDER BY s.doc_id"),
    // Mirrors GraftOps.tokenEntropy's µ-nat integer quantization: the
    // per-count ln is rounded to an exact integer BEFORE the sum, so
    // both engines aggregate identical integers in any order.
    "llm_token_entropy" ->
      ("WITH c AS (SELECT doc_id, tok, COUNT(*) AS c FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "GROUP BY doc_id, tok), " +
        "d AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_types, " +
        "SUM(c * CAST(round(LN(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)) " +
        "AS s_micro FROM c GROUP BY doc_id) " +
        "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_types, " +
        "CAST(LN(CAST(n AS DOUBLE)) - CAST(s_micro AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * 1000000.0) AS REAL) AS entropy " +
        "FROM d ORDER BY doc_id"),
    // Mirrors GraftOps.pmiBigrams: exact unigram/bigram/total counts,
    // PMI combined in the identical double expression, REAL-narrowed.
    "llm_pmi_bigrams" ->
      ("WITH ts AS (SELECT string_split(text, ' ') AS ts FROM documents), " +
        "uni AS (SELECT unnest(ts) AS w FROM ts), " +
        "uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w), " +
        "bi AS (SELECT ts[i+1] AS w1, ts[i+2] AS w2 FROM " +
        "(SELECT ts FROM ts WHERE len(ts) >= 2) t2, " +
        "LATERAL (SELECT unnest(range(len(ts) - 1)) AS i) t), " +
        "bc AS (SELECT w1, w2, COUNT(*) AS cxy FROM bi GROUP BY 1, 2), " +
        "tot AS (SELECT (SELECT SUM(c) FROM uc) AS nu, " +
        "(SELECT SUM(cxy) FROM bc) AS nb) " +
        "SELECT w1, w2, cxy, cx, cy, " +
        "CAST(LN((CAST(cxy AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE)) / " +
        "(CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE) * CAST(nb AS DOUBLE))) AS REAL) AS pmi " +
        "FROM bc JOIN (SELECT w AS w1, c AS cx FROM uc) USING (w1) " +
        "JOIN (SELECT w AS w2, c AS cy FROM uc) USING (w2), tot " +
        "WHERE cxy >= 5 ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 40"),
    "llm_ngram_counts" ->
      ("WITH ts AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE len(string_split(text, ' ')) >= 2), " +
        "g AS (SELECT ts[i+1] || ' ' || ts[i+2] AS ngram " +
        "FROM ts, LATERAL (SELECT unnest(range(len(ts) - 1)) AS i) t) " +
        "SELECT ngram, COUNT(*) AS cnt FROM g GROUP BY ngram " +
        "HAVING COUNT(*) >= 5 ORDER BY ngram"),
    "llm_tfidf" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2), " +
        "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), " +
        "nn AS (SELECT COUNT(*) AS n FROM documents), " +
        "s AS (SELECT doc_id, tf.term AS term, tf.tf AS tf, df.df AS df, " +
        "CAST(tf.tf * ln(CAST(n AS DOUBLE) / df.df) AS REAL) AS score " +
        "FROM tf JOIN df ON tf.term = df.term CROSS JOIN nn), " +
        "r AS (SELECT doc_id, term, tf, df, score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn FROM s) " +
        "SELECT doc_id, rn, term, tf, df, score FROM r WHERE rn <= 5 ORDER BY doc_id, rn"),
    "llm_text_stats" ->
      ("WITH base AS (SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY lang, source), " +
        "toks AS (SELECT lang, source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct_tokens FROM " +
        "(SELECT lang, source, unnest(string_split(text, ' ')) AS tok FROM documents) t GROUP BY lang, source) " +
        "SELECT base.lang, base.source, n_docs, sum_chars, n_tokens, n_distinct_tokens " +
        "FROM base JOIN toks ON base.lang = toks.lang AND base.source = toks.source " +
        "ORDER BY base.lang, base.source"),
    "llm_lang_filter" ->
      ("SELECT n_chars // 50 AS bucket, COUNT(*) AS cnt, MIN(n_chars) AS mn, MAX(n_chars) AS mx " +
        "FROM documents WHERE lang = 'en' AND n_chars BETWEEN 150 AND 400 " +
        "GROUP BY 1 ORDER BY bucket"),
    "llm_multimodal_join" ->
      ("SELECT label, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en_cnt " +
        "FROM documents JOIN embeddings ON doc_id = vec_id GROUP BY label ORDER BY label"),
    "llm_stratified_sample" ->
      (s"SELECT lang, doc_id, n_chars FROM (SELECT lang, doc_id, n_chars, " +
        s"row_number() OVER (PARTITION BY lang ORDER BY $keyHash, doc_id) AS rn, " +
        "COUNT(*) OVER (PARTITION BY lang) AS cnt FROM documents) t " +
        "WHERE rn * 5 <= cnt ORDER BY lang, doc_id"),
    "llm_normalize" ->
      ("SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text, " +
        "CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len " +
        "FROM documents ORDER BY doc_id"),
    // range(0, n, 30) excludes n; sequence(0, n-1, 30) includes values
    // <= n-1 — identical start sets for n >= 1 (and string_split never
    // returns an empty list).
    "llm_doc_chunks" ->
      ("SELECT doc_id, s // 30 AS chunk_idx, " +
        "array_to_string(list_slice(ts, s + 1, s + 40), ' ') AS chunk_text, " +
        "CAST(len(list_slice(ts, s + 1, s + 40)) AS BIGINT) AS chunk_toks " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) d, " +
        "LATERAL (SELECT unnest(range(0, len(ts), 30)) AS s) t " +
        "ORDER BY doc_id, chunk_idx"),
    // Distinct string-bigram counts equal the hashed-set sizes absent
    // 64-bit collisions (the same argument PropertySuite pins for the
    // shingle hasher).
    "llm_rep_ngram" ->
      ("SELECT doc_id, n2 AS total_ngrams, d2 AS distinct_ngrams, " +
        "((n2 - d2) * 1000) // n2 AS rep_milli FROM " +
        "(SELECT doc_id, CAST(len(ts) - 1 AS BIGINT) AS n2, " +
        "CAST(len(list_distinct(list_transform(range(len(ts) - 1), " +
        "i -> ts[i+1] || ' ' || ts[i+2]))) AS BIGINT) AS d2 " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t " +
        "WHERE len(ts) >= 2) s ORDER BY doc_id"),
    "llm_decontaminate" ->
      ("WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS s " +
        "FROM ts, LATERAL (SELECT unnest(range(len(ts) - 2)) AS i) t), " +
        "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10), " +
        "sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh WHERE doc_id >= 10 GROUP BY doc_id), " +
        "hits AS (SELECT a.doc_id, COUNT(*) AS overlap FROM sh a JOIN bench b ON a.s = b.s " +
        "WHERE a.doc_id >= 10 GROUP BY a.doc_id) " +
        "SELECT sizes.doc_id, n_sh, COALESCE(overlap, 0) AS overlap, " +
        "(COALESCE(overlap, 0) * 1000) // n_sh AS contam_milli " +
        "FROM sizes LEFT JOIN hits ON sizes.doc_id = hits.doc_id ORDER BY sizes.doc_id")
  )
}
