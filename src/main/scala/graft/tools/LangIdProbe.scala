package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the langid scoring pass. Arm A is the shipped two-explode
  * plan: the corpus is tokenized TWICE (fit + score), the score side
  * broadcast-joins the 100-row marker set, shuffles n_docs×5 partial
  * counts, and window-ranks per doc. Arm B keeps the fit subplan
  * byte-identical but scores each document in ONE codegen'd pass: the
  * fitted markers collapse to a single broadcast row (lang→marker
  * array map + sorted lang list) and per-row HOFs compute the 5 match
  * counts and the argmax (ties alphabetically, matching the window's
  * `desc(m), asc(lang)` order via array_min over the tied langs).
  * Zero-match docs are dropped in both arms (arm A: no `matched` row
  * survives; arm B: `maxm > 0` filter).
  *
  * At scale the difference is structural: arm B never explodes the
  * corpus a second time and never shuffles a per-doc relation — the
  * score pass is scan → per-row expression → 25-group agg.
  *
  * Decision rule (the bypassMergeThreshold precedent): equality gate
  * first, keep an arm only if it wins at BOTH sf0.1 and ×10.
  *
  * MEASURED — both arms REJECTED, shipped plan kept (r15):
  *   sf0.1: A=0.506  B=2.587  C=0.484;  ×10: A=0.792  B=2.981  C=0.784
  * Arm B loses 4-5× despite eliminating a corpus explode AND a per-doc
  * shuffle: higher-order functions (transform/filter/zip_with) are
  * INTERPRETED — no whole-stage codegen — so a per-token HOF predicate
  * pays interpreted-eval per element while the explode feeds a
  * codegen'd broadcast hash join. The "avoid the shuffle" instinct
  * loses to "stay inside codegen" at this arithmetic intensity; HOFs
  * belong on per-ROW array math (embed_quant, fn_array), not on
  * per-token corpus scoring. Arm C (min_by agg replacing the window's
  * shuffle+sort) reads within noise of A — the window was never the
  * cost; the double explode is, and that is the fit/score structure
  * itself (at 100 TB the fit pass runs once, not per query).
  */
object LangIdProbe {

  def armA(spark: SparkSession, sf: String): DataFrame =
    graft.llm.LangId.langId(spark, sf)

  def armB(spark: SparkSession, sf: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sf)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val top = tok.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(desc("cnt"), asc("tok"))))
      .filter(col("rn") <= 20)
      .select(col("lang").as("cand_lang"), col("tok"))
    // The fitted model as ONE row: lang → marker-array map plus the
    // sorted lang list (sorted so array_min below is the alphabetical
    // tie-break).
    val model = top.groupBy(col("cand_lang"))
      .agg(collect_list(col("tok")).as("marks"))
      .agg(
        map_from_entries(collect_list(struct(col("cand_lang"), col("marks"))))
          .as("mmap"),
        sort_array(collect_list(col("cand_lang"))).as("langs"))
    val scored = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .crossJoin(broadcast(model))
      .withColumn("ms", transform(col("langs"), (l: Column) =>
        size(filter(col("toks"), (t: Column) =>
          array_contains(element_at(col("mmap"), l), t)))))
      .withColumn("maxm", array_max(col("ms")))
      .filter(col("maxm") > 0)
      .withColumn("pred_lang", array_min(zip_with(col("langs"), col("ms"),
        (l: Column, m: Column) => when(m === col("maxm"), l))))
    scored.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang")
  }

  /** Arm C: keep the codegen'd explode + broadcast join, but collapse
    * the per-doc argmax from shuffle(doc,lang) → window-shuffle(doc) +
    * sort into shuffle(doc,lang) → agg(doc) with `min_by` over
    * struct(-m, lang) (smallest -m = largest m; ties → smallest lang —
    * the window's exact order, sort-free and partially aggregated). */
  def armC(spark: SparkSession, sf: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sf)
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
    val pred = matched.groupBy(col("doc_id"))
      .agg(min_by(col("cand_lang"),
        struct((-col("m")).as("nm"), col("cand_lang"))).as("pred_lang"))
    docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x10 = sys.env.getOrElse("SPARK_GRAFT_X_DIR", "target/crossover/x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.local.dir", graft.Tables.scratchDir("graft_shuffle_").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq(base, x10)) {
      val a = armA(spark, dir); val b = armB(spark, dir); val c = armC(spark, dir)
      for ((o, n) <- Seq(b -> "B", c -> "C")) {
        val diff = a.exceptAll(o).count() + o.exceptAll(a).count()
        require(diff == 0, s"arm $n disagrees on $dir: $diff rows")
      }
      def time(df: DataFrame): Double = {
        df.count() // warm
        (1 to 5).map { _ =>
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }.min
      }
      val (ta, tb, tc) = (time(a), time(b), time(c))
      val (ta2, tb2, tc2) = (time(a), time(b), time(c))
      println(f"$dir: armA=${math.min(ta, ta2)}%.3f s  armB=${math.min(tb, tb2)}%.3f s  armC=${math.min(tc, tc2)}%.3f s")
    }
    spark.stop()
  }
}
