package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is the single-split documents scan actually the bottleneck of the
  * CPU-dense text stages? Times the bare tokenize→count kernel on the
  * as-scanned frame (1 split) vs a pre-spread copy (32 partitions),
  * min-of-3 warm — isolating the stage the Tables.spread hypothesis
  * targets from the joins/windows around it. */
object SpreadScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(spark)
    val docs = graft.Tables.documents(spark, sfDir)
    def kernel(df: org.apache.spark.sql.DataFrame): Long =
      df.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1))).queryExecution.toRdd.count()
    def shingleKernel(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1)), " +
        "i -> hash(substring(text, i, 8)))")).as("sh"))
        .groupBy("sh").agg(count(lit(1))).queryExecution.toRdd.count()
    for ((label, df) <- Seq(
        "scan-1split" -> docs,
        "spread-32" -> docs.repartition(32))) {
      def nativeCharGrams(df: org.apache.spark.sql.DataFrame): Long =
        df.select(col("doc_id"),
          expr("size(graft_chargram_hashes(text, 8))").as("n"))
          .agg(sum(col("n"))).queryExecution.toRdd.count()
      def nativeSimhash(df: org.apache.spark.sql.DataFrame): Long =
        df.select(expr("graft_simhash62(text)").as("sh"))
          .select(expr("element_at(sh, 1)").as("lo"))
          .agg(sum(col("lo"))).queryExecution.toRdd.count()
      def nativeMinhashExplode(df: org.apache.spark.sql.DataFrame): Long =
        df.select(col("doc_id"),
          explode(expr("graft_chargram_hashes(text, 8)")).as("h"))
          .groupBy("h").agg(count(lit(1))).queryExecution.toRdd.count()
      for ((kname, k) <- Seq("tokenize" -> (kernel _),
          "shingle8" -> (shingleKernel _),
          "nat_cgram" -> (nativeCharGrams _),
          "nat_simh" -> (nativeSimhash _),
          "nat_cgram_explode" -> (nativeMinhashExplode _))) {
        k(df)
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); k(df); (System.nanoTime() - t0) / 1e9
        }.min
        println(f"SPREAD $label%-12s $kname%-9s $best%.3f s")
      }
    }
    spark.stop()
  }
}
