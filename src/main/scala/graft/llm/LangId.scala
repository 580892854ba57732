package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heuristic language identification (training-pipeline operator):
  * two-pass marker-token model. Pass 1 extracts each language's top-20
  * tokens from labeled data; pass 2 scores every document against each
  * language's marker set and predicts the argmax (ties broken
  * alphabetically). Output is the confusion matrix.
  *
  * Scale: both passes are hash-shuffles on small keys; the marker set
  * (5 langs × 20 tokens) is broadcast into the scoring join.
  */
object LangId {

  def langId(spark: SparkSession, sf: String): DataFrame = {
    val docs = Tables.documents(spark, sf)
    // Deliberately NOT cached: materializing the ~700k-row token
    // explode costs more than re-running the cheap scan+split lineage
    // for the second consumer (measured 1.1 s -> 1.8 s with cache).
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val top = tok.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(desc("cnt"), asc("tok"))))
      .filter(col("rn") <= 20)
      .select(col("lang").as("cand_lang"), col("tok"))
    val matched = tok.join(broadcast(top), "tok")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("m"))
    val pred = matched.withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("m"), asc("cand_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"))
    docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_langid" -> langId
  )

  val oracle: Map[String, String] = Map(
    "llm_langid" ->
      ("WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "top AS (SELECT lang AS cand_lang, tok FROM (SELECT lang, tok, COUNT(*) AS cnt, " +
        "row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tok ASC) AS rn " +
        "FROM tok GROUP BY lang, tok) t WHERE rn <= 20), " +
        "matched AS (SELECT tok.doc_id, top.cand_lang, COUNT(*) AS m FROM tok JOIN top ON tok.tok = top.tok " +
        "GROUP BY tok.doc_id, top.cand_lang), " +
        "pred AS (SELECT doc_id, cand_lang AS pred_lang FROM (SELECT doc_id, cand_lang, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY m DESC, cand_lang ASC) AS rn FROM matched) t WHERE rn = 1) " +
        "SELECT d.lang, p.pred_lang, COUNT(*) AS cnt FROM documents d JOIN pred p ON d.doc_id = p.doc_id " +
        "GROUP BY d.lang, p.pred_lang ORDER BY d.lang, p.pred_lang")
  )
}
