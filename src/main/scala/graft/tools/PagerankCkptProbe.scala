package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B (r17 verdict #5a): localCheckpoint the rank vector between
  * PageRank supersteps vs the current lineage fold. The checkpoint
  * variant truncates lineage per iteration (an eager job each time,
  * rank blocks held in executor storage); the lineage fold nests each
  * iteration's broadcast subquery inside the next. Rows are asserted
  * identical; fresh-plan build+count is timed interleaved, min-of-N
  * reported per arm. Run: runMain graft.tools.PagerankCkptProbe
  * [sfDir] [passes]. The KEEP/REJECT decision and numbers are recorded
  * in NOTES.md — at 100 TB localCheckpoint also forfeits fault
  * tolerance (truncated lineage cannot recompute a lost block), so the
  * local win has to be decisive, not marginal.
  */
object PagerankCkptProbe {

  private def ckptPlan(spark: SparkSession, sf: String): DataFrame = {
    val adj = graft.operators.Graph.adjacency(spark, sf)
    // degrees emits (u, dg) — rename like pagerankPlan does.
    val init = graft.operators.Graph.degrees(spark, sf)
      .select(col("u").as("n"), lit(1000000000000L).as("pr"))
    val folded = (1 to 3).foldLeft(init) { (pr, _) =>
      val vec = pr.select(col("n").as("u"), col("pr"))
      adj.join(broadcast(vec), "u")
        .select(col("v"), expr("(pr * 85) div (100 * dg)").as("contrib"))
        .groupBy(col("v")).agg(sum(col("contrib")).as("c"))
        .select(col("v").as("n"), (col("c") + lit(150000000000L)).as("pr"))
        .localCheckpoint(true)
    }
    folded.orderBy(desc("pr"), asc("n")).limit(20)
      .select(col("n").as("part"), col("pr").as("pr_micro"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.SparkEntry.queries("graph_pagerank")
    // Row parity first (also warms the fit-once adjacency).
    val a = base(spark, sfDir).collect().map(_.toString).toSeq
    val b = ckptPlan(spark, sfDir).collect().map(_.toString).toSeq
    require(a == b, s"checkpoint arm diverged:\n$a\nvs\n$b")
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
    }
    val (ls, cs) = (1 to passes).map { _ =>
      (time(base(spark, sfDir)), time(ckptPlan(spark, sfDir)))
    }.unzip
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(" ")
    println(f"LINEAGE  min ${ls.min}%.3f  runs: ${fmt(ls)}")
    println(f"CKPT     min ${cs.min}%.3f  runs: ${fmt(cs)}")
    spark.stop()
  }
}
