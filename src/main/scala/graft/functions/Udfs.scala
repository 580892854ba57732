package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF / UDAF / UDTF surface (SURVEY.md §2.11).
  *
  * These exist to demonstrate the extension points; every other query
  * in the engine deliberately uses built-ins, because UDFs are opaque
  * to Catalyst (no pushdown through them, no codegen fusion). The
  * typed Aggregator keeps only order-insensitive integer state so the
  * result is partial-agg-order independent.
  */
object Udfs {

  /** Scala scalar UDF: revenue bucket. Per-row double math is
    * engine-deterministic, so the oracle re-expresses it as CASE. */
  def udfScalar(spark: SparkSession, sf: String): DataFrame = {
    val bucket = udf((p: Double, d: Double) => {
      val r = p * (1 - d)
      if (r > 90000.0) "HIGH" else if (r > 50000.0) "MID" else "LOW"
    })
    Tables.lineitem(spark, sf)
      .select(bucket(col("l_extendedprice"), col("l_discount")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  case class LongStats(cnt: Long, sum: Long, mn: Long, mx: Long)

  /** Typed Aggregator over a long column: (count, sum, min, max). */
  object LongStatsAgg extends Aggregator[Long, LongStats, LongStats] {
    def zero: LongStats = LongStats(0L, 0L, Long.MaxValue, Long.MinValue)
    def reduce(b: LongStats, a: Long): LongStats =
      LongStats(b.cnt + 1, b.sum + a, math.min(b.mn, a), math.max(b.mx, a))
    def merge(x: LongStats, y: LongStats): LongStats =
      LongStats(x.cnt + y.cnt, x.sum + y.sum,
        math.min(x.mn, y.mn), math.max(x.mx, y.mx))
    def finish(r: LongStats): LongStats = r
    def bufferEncoder: Encoder[LongStats] = Encoders.product[LongStats]
    def outputEncoder: Encoder[LongStats] = Encoders.product[LongStats]
  }

  /** Typed UDAF applied per language over n_chars; the struct result
    * is flattened to primitive columns (D5). */
  def udafTyped(spark: SparkSession, sf: String): DataFrame = {
    val stats = udaf(LongStatsAgg)
    Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(stats(col("n_chars")).as("s"))
      .select(col("lang"), col("s.cnt").as("cnt"), col("s.sum").as("sum"),
        col("s.mn").as("mn"), col("s.mx").as("mx"))
      .orderBy("lang")
  }

  /** Generator / UDTF surface: explode(split(...)) row expansion —
    * top-20 tokens across the corpus. */
  def udtfGenerator(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tok"))
      .limit(20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar" -> udfScalar,
    "udaf_typed" -> udafTyped,
    "udtf_generator" -> udtfGenerator
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      ("SELECT CASE WHEN l_extendedprice * (1 - l_discount) > 90000.0 THEN 'HIGH' " +
        "WHEN l_extendedprice * (1 - l_discount) > 50000.0 THEN 'MID' ELSE 'LOW' END AS bucket, " +
        "COUNT(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY bucket"),
    "udaf_typed" ->
      ("SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum, " +
        "MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents GROUP BY lang ORDER BY lang"),
    "udtf_generator" ->
      ("SELECT tok, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t " +
        "GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 20")
  )
}
