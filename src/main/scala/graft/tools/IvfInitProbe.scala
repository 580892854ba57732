package graft.tools

import graft.Tables
import graft.llm.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameter-sweep probe for the trained IVF quantizer: recall per
  * (k, iteration count, probe count) at sf0.01, using Ann's OWN
  * assign/update (private[graft]) so the sweep measures exactly the
  * shipped arithmetic — the k=10/iters=2 choice in Ann.scala cites
  * this tool. */
object IvfInitProbe {

  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(spark)
    val exact = Ann.cosNearDup(spark, sf).select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"exact pairs: ${exact.size}")
    val e = Tables.embeddings(spark, sf)
      .withColumn("ed", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("embedding"), col("ed"))

    def pairsOf(k: Int, iters: Int, top: Int): Set[(Long, Long)] = {
      val trained = (1 to iters).foldLeft(Ann.kmeansFit(e, k, 0)) {
        (c, _) => Ann.update(Ann.assign(e, c))
      }
      val assigned = Ann.assign(e, trained, top)
        .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
      val a = assigned.select(col("vec_id").as("x"), col("cell"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = assigned.select(col("vec_id").as("y"), col("cell").as("cell_b"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, col("cell") === col("cell_b") && col("x") < col("y"))
        .select(col("x"), col("y"),
          round(expr("graft_dot(ea, eb)") / (col("na") * col("nb")), 6).as("sim"))
        .filter(col("sim") >= 0.45)
        .select("x", "y").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    for (k <- Seq(4, 5, 6, 8, 10); iters <- Seq(2, 3)) {
      val p1 = pairsOf(k, iters, 1)
      val p2 = pairsOf(k, iters, 2)
      println(s"hash k=$k iters=$iters probe1=${p1.size}/${exact.size} probe2=${p2.size}/${exact.size}")
    }
    spark.stop()
  }
}
