package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("codegen")` — the actual generated Java — for the
  * named queries to `<outDir>/<query>_<suffix>.txt`. The r22 evidence
  * surface for per-row expression claims (e.g. that the tumbling money
  * sum compiles to primitive floor/cast with no BigDecimal call):
  * plan-level dumps show operator shape, this shows the row loop.
  * Usage: runMain graft.tools.CodegenDump <sfDir> <outDir> <suffix>
  *        <query> [query...]
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE wraps the tree in AdaptiveSparkPlan, which the codegen
      // explain mode cannot traverse before execution — dumps come out
      // empty. The generated row loop is identical either way.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.drop(3).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution
        .explainString(ExplainMode.fromString("codegen"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[codegendump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
