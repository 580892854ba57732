package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus schema-drift canaries (round-10 lesson). The driver
  * regenerated the testdata between rounds 8 and 9 and changed
  * events.ts from INT64 TIMESTAMP(NANOS) to a plain µs timestamp;
  * every events-based query — 36 of 167 — then failed ANALYSIS with a
  * cryptic `ts div 1000` type mismatch, and the round's scored
  * correctness silently dropped to 131 keys. These tests exist so the
  * NEXT drift fails loudly, in a named test, at the table it drifted
  * on — and so the loader's normalization is pinned on BOTH physical
  * generations even while the corpus only ships one of them.
  */
class SchemaDriftSuite extends SparkTestBase {

  /** Columns the queries genuinely depend on, with the types the
    * LOADER contract guarantees (not the file's physical types — the
    * events loader normalizes those; see Tables.events). A corpus
    * regeneration that breaks any of these should fail here, naming
    * the table and column, before 30-odd queries fail downstream. */
  test("corpus canary: every table satisfies the loader contract schema") {
    val want: Seq[(String, org.apache.spark.sql.DataFrame, Map[String, DataType])] = Seq(
      ("lineitem", Tables.lineitem(spark, sf), Map(
        "l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
        "l_returnflag" -> StringType, "l_shipdate" -> TimestampNTZType)),
      ("orders", Tables.orders(spark, sf), Map(
        "o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType)),
      ("customer", Tables.customer(spark, sf), Map(
        "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)),
      ("supplier", Tables.supplier(spark, sf), Map(
        "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)),
      ("part", Tables.part(spark, sf), Map(
        "p_partkey" -> LongType, "p_brand" -> StringType)),
      ("nation", Tables.nation(spark, sf), Map(
        "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)),
      ("region", Tables.region(spark, sf), Map(
        "r_regionkey" -> IntegerType, "r_name" -> StringType)),
      ("documents", Tables.documents(spark, sf), Map(
        "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType)),
      ("embeddings", Tables.embeddings(spark, sf), Map(
        "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
        "label" -> IntegerType)),
      // The normalized contract, not the file: ts MUST come out as the
      // epoch-ns long and ts2 as µs NTZ whatever the file carries.
      ("events (normalized)", Tables.events(spark, sf), Map(
        "event_id" -> LongType, "ts" -> LongType,
        "ts2" -> TimestampNTZType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType)))
    for ((name, df, cols) <- want; (c, t) <- cols) {
      val f = df.schema.find(_.name == c)
      assert(f.isDefined, s"$name: column $c disappeared from the corpus")
      assert(f.get.dataType == t,
        s"$name.$c drifted: expected $t, file now yields ${f.get.dataType}")
    }
  }

  /** Value-level drift canary (r11; VERDICT r10 #1). The schema
    * canaries above catch TYPE drift, but a same-schema corpus
    * regeneration (new rows) would silently invalidate every sf0.1
    * golden and flip oracle hashes at judging time — the r9 failure
    * class one level down. Pin one row count plus one order-independent
    * per-column checksum (`bit_xor(xxhash64(col))` — XOR needs no sum
    * that could overflow under ANSI, and ignores row order) per table
    * at sf0.001.
    *
    * ON FAILURE: the corpus was regenerated with new VALUES. Re-run the
    * sf0.1 goldens (GoldenSuite) and the oracle gate, then re-pin these
    * constants from the actuals this test prints. */
  test("corpus canary: table content matches the pinned sf0.001 generation") {
    def sig(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): (Long, Seq[(String, Long)]) = {
      val aggs = count(lit(1)).as("n") +:
        cols.map(c => expr(s"bit_xor(xxhash64($c))").as(c))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      (row.getLong(0), cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) })
    }
    val tables: Seq[(String, org.apache.spark.sql.DataFrame, Seq[String])] = Seq(
      ("lineitem", Tables.lineitem(spark, sf),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_returnflag", "l_shipdate")),
      ("orders", Tables.orders(spark, sf),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")),
      ("customer", Tables.customer(spark, sf),
        Seq("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")),
      ("supplier", Tables.supplier(spark, sf), Seq("s_suppkey", "s_acctbal")),
      ("part", Tables.part(spark, sf), Seq("p_partkey", "p_retailprice")),
      ("nation", Tables.nation(spark, sf), Seq("n_nationkey", "n_name")),
      ("region", Tables.region(spark, sf), Seq("r_regionkey", "r_name")),
      ("documents", Tables.documents(spark, sf),
        Seq("doc_id", "text", "lang", "n_chars")),
      ("embeddings", Tables.embeddings(spark, sf), Seq("vec_id", "label")),
      ("events", Tables.events(spark, sf),
        Seq("event_id", "ts", "user_id", "event_type", "value")))
    val actual = tables.map { case (name, df, cols) => name -> sig(df, cols) }
    val pinned: Map[String, (Long, Seq[(String, Long)])] = ContentCanary.pinned
    val repin = actual.map { case (n, (cnt, cs)) =>
      s"""    "$n" -> (${cnt}L, Seq(${cs.map { case (c, v) => s""""$c" -> ${v}L""" }.mkString(", ")}))"""
    }.mkString(",\n")
    actual.foreach { case (name, (cnt, cs)) =>
      val exp = pinned.get(name)
      assert(exp.isDefined, s"$name: no pinned content signature — re-pin:\n$repin")
      assert(exp.get._1 == cnt,
        s"$name: row count drifted ${exp.get._1} -> $cnt — corpus regenerated; " +
          s"re-verify goldens then re-pin:\n$repin")
      val expCols = exp.get._2.toMap
      cs.foreach { case (c, v) =>
        assert(expCols.get(c).contains(v),
          s"$name.$c content checksum drifted ${expCols.get(c)} -> $v — corpus " +
            s"regenerated; re-verify goldens then re-pin:\n$repin")
      }
    }
  }

  /** The sf0.01/sf0.1 generations can drift independently of sf0.001
    * (the driver regenerates per round); their row counts are what the
    * sf0.1 goldens and the oracle gate assume. Footer reads only. */
  test("corpus canary: sf0.01/sf0.1 row counts match the pinned generation") {
    for ((sfName, tables) <- ContentCanary.pinnedCounts; (t, want) <- tables) {
      val dir = sfSibling(sfName)
      val got = spark.read.parquet(s"$dir/$t.parquet").count()
      assert(got == want,
        s"$dir/$t row count drifted $want -> $got — corpus regenerated; " +
          "re-verify goldens/oracle then re-pin ContentCanary.pinnedCounts")
    }
  }

  /** The raw events file may legally carry EITHER physical generation;
    * anything else is new drift the loader does not know about. */
  test("corpus canary: events.ts physical type is a known generation") {
    val t = Tables.eventsRaw(spark, sf).schema("ts").dataType
    assert(t == LongType || t == TimestampType || t == TimestampNTZType,
      s"events.ts drifted to unhandled physical type $t — extend Tables.tsNsExpr/tsUsExpr")
  }

  /** Pin the loader on BOTH generations with the same rows: write a
    * legacy-shaped twin of the current events table (ts as the raw
    * epoch-ns long the NANOS generation yielded under nanosAsLong) and
    * assert Tables.events normalizes both files to identical
    * (event_id, ts, ts2) triples. The legacy branch would otherwise be
    * dead code on the current corpus — until the corpus flips back. */
  test("events loader normalizes the ns-long and µs-timestamp generations identically") {
    val dir = legacyTwinDir
    val legacy = Tables.events(spark, dir)
      .select("event_id", "ts", "ts2").orderBy("event_id").collect()
    val current = Tables.events(spark, sf)
      .select("event_id", "ts", "ts2").orderBy("event_id").collect()
    assert(legacy.length == current.length && legacy.length > 0)
    assert(legacy.sameElements(current),
      "the two physical generations must normalize to identical (ts, ts2)")
  }

  /** The STREAMING side adapts through the schema-dispatched
    * [[Tables.tsUsExpr]] — a separate code path from the batch loader
    * (readStream re-reads the raw file schema), whose LongType branch
    * is dead code on the current corpus. Run a real streaming query
    * over the legacy twin and assert row-identical output, so a corpus
    * flip back to ns-longs cannot silently break the 8-query streaming
    * family the way the µs flip broke batch in round 9. */
  test("streaming adapts both events physical generations identically") {
    val q = SparkEntry.queries("ev_tumbling_stream")
    val legacy = q(spark, legacyTwinDir).collect()
    val current = q(spark, sf).collect()
    assert(legacy.length == current.length && legacy.length > 0,
      s"row count differs across generations (${legacy.length} vs ${current.length})")
    assert(legacy.sameElements(current),
      "streaming output must be identical on both physical generations")
  }

  /** A legacy-shaped twin of the current events table, written once
    * per suite run: Tables.events(sf).ts IS the normalized epoch-ns
    * long — writing it back as a LongType `ts` column reproduces the
    * INT64(NANOS)-under-nanosAsLong file shape byte-for-byte at the
    * logical level. */
  private lazy val legacyTwinDir: String = {
    val root = Tables.scratchDir("graft_evgen_")
    // A single FILE named events.parquet, like the corpus layout — the
    // streaming source's pathGlobFilter matches file names, so a
    // directory-shaped write (part-*.parquet inside) would stream zero
    // files and vacuously "pass" nothing.
    val tmp = root.resolve("tmp").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $tmp"))
    java.nio.file.Files.move(part.toPath, root.resolve("events.parquet"))
    root.toString
  }
}
