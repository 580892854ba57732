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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_text_stats" -> textStats,
    "llm_lang_filter" -> langFilter,
    "llm_multimodal_join" -> multimodalJoin
  )

  val oracle: Map[String, String] = Map(
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
        "FROM documents JOIN embeddings ON doc_id = vec_id GROUP BY label ORDER BY label")
  )
}
