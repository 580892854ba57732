package graft.functions

import graft.Tables
import graft.Tables.{dec, ntz}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Scalar function families (SURVEY.md §2.8): string, date, math,
  * array (incl. higher-order functions), map, JSON.
  *
  * Everything here is a built-in `functions._` / SQL expression —
  * codegen'd, pushdown-friendly, no UDFs. Cross-engine parity notes:
  * libm transcendentals (ln/exp/pow) are narrowed to FLOAT because
  * their last-ulp may differ between Java and C++ math libraries;
  * integer-width differences are normalized with explicit casts.
  */
object Scalars {

  def fnString(spark: SparkSession, sf: String): DataFrame =
    Tables.part(spark, sf)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        substring(col("p_name"), 1, 5).as("sub5"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("cat"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trm"),
        length(col("p_name")).cast("long").as("len"),
        regexp_replace(col("p_name"), lit("a"), lit("X")).as("rep"),
        lpad(col("p_size").cast("string"), 4, "0").as("lp"),
        split(col("p_name"), " ").getItem(0).as("tok0"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
        col("p_name").like("%er%").as("lk"))
      .orderBy("p_partkey")

  /** Regex family beyond fn_string's basics: extract-ALL into an
    * array, match counting, and a regex predicate. Patterns stay
    * POSIX-simple (literal classes, no \b/lookaround) so Java regex
    * and DuckDB's RE2 agree; counts are via regexp_extract_all length
    * on both engines (DuckDB has no regexp_count). Per-row, linear,
    * codegen'd — the scale profile of any scalar map. The extract-all
    * array is emitted pipe-joined: the driver's pandas compare can't
    * sort/hash ndarray cells, and a delimited string carries the exact
    * same information (element order is the match order — stable). */
  def fnRegex(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[aeiou]"), lit(0)))
          .cast("long").as("n_vowels"),
        array_join(regexp_extract_all(col("text"), lit("s[a-z]+"), lit(0)), "|")
          .as("s_words"),
        col("text").rlike("spark").as("has_spark"))
      .orderBy("doc_id")

  /** Edit distance (fuzzy-matching primitive for near-dup text): both
    * engines implement classic Levenshtein DP — integer-exact parity. */
  def fnEditDist(spark: SparkSession, sf: String): DataFrame =
    Tables.part(spark, sf)
      .select(
        col("p_partkey"),
        levenshtein(col("p_name"), lit("standard part name")).as("lev"),
        levenshtein(split(col("p_name"), " ").getItem(0),
          split(col("p_type"), " ").getItem(0)).as("lev_tok"))
      .orderBy("p_partkey")

  def fnDate(spark: SparkSession, sf: String): DataFrame =
    Tables.orders(spark, sf)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        ntz(date_trunc("day", col("o_orderdate"))).as("day_ts"),
        datediff(col("o_orderdate"),
          Tables.tsLit("1995-01-01 00:00:00")).as("dd"),
        expr("add_months(cast(o_orderdate as date), 3)").as("am3"),
        expr("weekday(o_orderdate) + 1").as("idw"),
        // String→date parse from an ISO string assembled portably
        // (date_format patterns differ per engine; lpad doesn't).
        to_date(concat_ws("-",
          year(col("o_orderdate")).cast("string"),
          lpad(month(col("o_orderdate")).cast("string"), 2, "0"),
          lpad(dayofmonth(col("o_orderdate")).cast("string"), 2, "0")))
          .as("td"))
      .orderBy("o_orderkey")

  def fnMath(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // HALF_UP rounding happens on the decimal; the output is cast
        // back to double so no fixed-scale decimal reaches the hash.
        round(dec(col("l_extendedprice")), 1).cast("double").as("rnd"),
        floor(col("l_extendedprice")).as("flr"),
        ceil(col("l_extendedprice")).as("cl"),
        abs(col("l_extendedprice") - lit(50000.0)).as("ab"),
        sqrt(col("l_quantity")).as("sq"),
        log(col("l_extendedprice")).cast("float").as("lg"),
        exp(col("l_discount")).cast("float").as("ex"),
        pow(col("l_quantity"), 2).cast("float").as("pw"),
        (col("l_linenumber") % 3).as("md"))
      .orderBy("l_orderkey", "l_linenumber")

  def fnArray(spark: SparkSession, sf: String): DataFrame =
    Tables.embeddings(spark, sf)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).as("first"),
        array_min(col("embedding")).as("mn_el"),
        element_at(sort_array(col("embedding")), 2).as("srt1"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("npos"),
        expr("aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")
          .as("norm2"))
      .orderBy("vec_id")

  def fnMap(spark: SparkSession, sf: String): DataFrame = {
    val m = from_json(col("props"), MapType(StringType, IntegerType))
    Tables.events(spark, sf)
      .select(
        col("event_id"),
        element_at(map_keys(m), 1).as("key0"),
        element_at(m, "k").as("val0"),
        size(map_keys(m)).cast("long").as("nkeys"))
      .orderBy("event_id")
  }

  def fnJson(spark: SparkSession, sf: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(spark, sf)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_k"))
      .orderBy("event_type")
  }

  /** Bitwise family: shifts, and/or/xor, popcount — all on
    * non-negative integers so two's-complement vs arithmetic-shift
    * differences can't bite. Spark `^` is xor; DuckDB `^` is POWER
    * (PostgreSQL heritage), its xor is the `xor()` function — the one
    * real dialect trap in this family. */
  def fnBits(spark: SparkSession, sf: String): DataFrame =
    Tables.part(spark, sf)
      .select(col("p_partkey"),
        expr("cast(shiftleft(p_size, 3) as bigint)").as("sl"),
        expr("cast(shiftright(p_partkey, 2) as bigint)").as("sr"),
        expr("cast(p_partkey & 255 as bigint)").as("band"),
        expr("cast(p_partkey | 15 as bigint)").as("bor"),
        expr("cast(p_partkey ^ p_size as bigint)").as("bxor"),
        expr("cast(bit_count(p_partkey) as bigint)").as("bc"))
      .orderBy("p_partkey")

  /** Cryptographic digest family — the content-addressing primitives
    * of exact dedup and cache keys at corpus scale: md5 and sha2-256
    * over doc text, both emitted as lowercase hex by each engine.
    * (xxhash64 stays out: Spark-native only.) Per-row map, linear. */
  def fnHash(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256"),
        md5(concat(col("lang"), lit(":"), col("text"))).as("h_keyed"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_hash" -> fnHash,
    "fn_string" -> fnString,
    "fn_regex" -> fnRegex,
    "fn_editdist" -> fnEditDist,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
    "fn_bits" -> fnBits
  )

  val oracle: Map[String, String] = Map(
    "fn_hash" ->
      ("SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256, " +
        "md5(concat(lang, ':', text)) AS h_keyed " +
        "FROM documents ORDER BY doc_id"),
    "fn_bits" ->
      ("SELECT p_partkey, CAST(p_size << 3 AS BIGINT) AS sl, " +
        "CAST(p_partkey >> 2 AS BIGINT) AS sr, " +
        "CAST(p_partkey & 255 AS BIGINT) AS band, " +
        "CAST(p_partkey | 15 AS BIGINT) AS bor, " +
        "CAST(xor(p_partkey, p_size) AS BIGINT) AS bxor, " +
        "CAST(bit_count(p_partkey) AS BIGINT) AS bc " +
        "FROM part ORDER BY p_partkey"),
    "fn_string" ->
      ("SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up, substring(p_name, 1, 5) AS sub5, " +
        "concat(p_brand, '_', p_type) AS cat, trim(concat(' ', p_name, ' ')) AS trm, length(p_name) AS len, " +
        "regexp_replace(p_name, 'a', 'X', 'g') AS rep, lpad(CAST(p_size AS VARCHAR), 4, '0') AS lp, " +
        "string_split(p_name, ' ')[1] AS tok0, regexp_extract(p_name, '([a-z]+)', 1) AS rex, " +
        "p_name LIKE '%er%' AS lk FROM part ORDER BY p_partkey"),
    "fn_regex" ->
      ("SELECT doc_id, len(regexp_extract_all(text, '[aeiou]')) AS n_vowels, " +
        "coalesce(array_to_string(regexp_extract_all(text, 's[a-z]+'), '|'), '') AS s_words, " +
        "regexp_matches(text, 'spark') AS has_spark " +
        "FROM documents ORDER BY doc_id"),
    "fn_editdist" ->
      ("SELECT p_partkey, CAST(levenshtein(p_name, 'standard part name') AS INTEGER) AS lev, " +
        "CAST(levenshtein(string_split(p_name, ' ')[1], string_split(p_type, ' ')[1]) AS INTEGER) AS lev_tok " +
        "FROM part ORDER BY p_partkey"),
    "fn_date" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo, " +
        "CAST(day(o_orderdate) AS INTEGER) AS dy, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day_ts, " +
        "CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS dd, " +
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS am3, " +
        "CAST(isodow(o_orderdate) AS INTEGER) AS idw, " +
        "CAST(concat(CAST(year(o_orderdate) AS VARCHAR), '-', lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0'), '-', " +
        "lpad(CAST(day(o_orderdate) AS VARCHAR), 2, '0')) AS DATE) AS td FROM orders ORDER BY o_orderkey"),
    "fn_math" ->
      ("SELECT l_orderkey, l_linenumber, CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS rnd, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS flr, CAST(ceil(l_extendedprice) AS BIGINT) AS cl, " +
        "abs(l_extendedprice - 50000.0) AS ab, sqrt(l_quantity) AS sq, " +
        "CAST(ln(l_extendedprice) AS REAL) AS lg, CAST(exp(l_discount) AS REAL) AS ex, " +
        "CAST(pow(l_quantity, 2) AS REAL) AS pw, l_linenumber % 3 AS md " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "fn_array" ->
      ("SELECT vec_id, len(embedding) AS dim, embedding[1] AS first, " +
        "list_aggregate(embedding, 'min') AS mn_el, list_sort(embedding)[2] AS srt1, " +
        "len(list_filter(embedding, x -> x > 0)) AS npos, " +
        "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm2 " +
        "FROM embeddings ORDER BY vec_id"),
    "fn_map" ->
      ("SELECT event_id, json_keys(props)[1] AS key0, " +
        "CAST(json_extract_string(props, '$.k') AS INTEGER) AS val0, " +
        "CAST(len(json_keys(props)) AS BIGINT) AS nkeys FROM events ORDER BY event_id"),
    "fn_json" ->
      ("SELECT event_type, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k, " +
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_k " +
        "FROM events GROUP BY event_type ORDER BY event_type")
  )
}
