package graft.operators

import graft.Tables
import graft.Tables.{dec, rate, sumDec, tsLit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core: scans, filters, joins, aggregations, sorts and
  * set operations (SURVEY.md §2.1–§2.4, §2.6, §2.7).
  *
  * Every query obeys the determinism rules (SURVEY.md §7.4): total
  * ORDER BY on a unique key set, decimal casts before SUM/AVG, explicit
  * null ordering, flat output schemas. Averages are emitted as
  * CAST(exact-decimal-sum AS DOUBLE) / CAST(count AS DOUBLE): one IEEE
  * division of identical exact inputs is bit-stable across engines,
  * unlike engine-native AVG over doubles.
  */
object Relational {

  /** TPC-H-Q1-style pricing summary: scan → NTZ-timestamp filter →
    * multi-measure aggregate with exact decimal arithmetic → sort.
    * Map-side partial aggregation and parquet filter/column pushdown
    * are automatic; the groupBy key cardinality is 6, so the shuffle
    * is negligible at any scale.
    */
  def aggQ1Pricing(spark: SparkSession, sf: String): DataFrame = {
    val li = Tables.lineitem(spark, sf)
    // Exact decimal pipeline: 2-dp inputs → exact products at scale 4/6
    // → exact sums → widening-only output casts. No rounding anywhere,
    // so Spark and DuckDB agree bit-for-bit.
    val price = dec(col("l_extendedprice"))              // DECIMAL(12,2)
    val disc1 = lit(1) - rate(col("l_discount"))         // DECIMAL(5,2) exact
    val tax1  = lit(1) + rate(col("l_tax"))
    li.filter(col("l_shipdate") <= tsLit("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sum(price * disc1).cast(DecimalType(24, 4)).as("sum_disc_price"),
        sum(price * disc1 * tax1).cast(DecimalType(24, 6)).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_q1_pricing" -> aggQ1Pricing
  )

  val oracle: Map[String, String] = Map(
    "agg_q1_pricing" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(24,4)) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(24,6)) AS sum_charge, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")
  )
}
