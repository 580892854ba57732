package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the per-round optimization
  * evidence files (plans/rNN/<query>_{before,after}.txt). Session
  * config mirrors Bench (32 slots, UTC, AQE default) so the captured
  * plan is the shape the scored sweep runs.
  *
  * Run: sbt "runMain graft.tools.PlanFiles <sfDir> <outDir> <suffix>
  *       <query> [query...]"
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[planfiles] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
