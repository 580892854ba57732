package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway probe: recall of the trained IVF quantizer per candidate
  * deterministic init × K × iteration count, at sf0.01. */
object IvfInitProbe {

  private val simHof: String =
    "round(graft_ddot(ed, ce) / " +
      "(sqrt(graft_ddot(ed, ed)) * sqrt(graft_ddot(ce, ce))), 6)"

  private def assign(vecs: DataFrame, cents: DataFrame, top: Int = 1): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("sim", expr(simHof))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(desc("sim"), asc("cid"))))
      .filter(col("rn") <= top)
      .select(col("vec_id"), col("embedding"), col("ed"), col("cid").as("cell"))

  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("ed")).as(Seq("d", "v")))
      .groupBy(col("cell"), col("d"))
      .agg(sum(expr("cast(floor(v * 1000000 + 0.5) as bigint)")).as("s"),
        count(lit(1)).as("cnt"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(d, s, cnt))), " +
        "t -> cast(t.s as double) / (1000000.0 * cast(t.cnt as double)))").as("ce"))
      .select(col("cell").as("cid"), col("ce"))

  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(spark)
    val exact = graft.llm.Ann.cosNearDup(spark, sf).select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"exact pairs: ${exact.size}")
    val e = Tables.embeddings(spark, sf)
      .withColumn("ed", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("embedding"), col("ed"))

    def hashInit(k: Int): DataFrame = {
      val h = "((vec_id % 2147483648) * 2654435761) % 4294967296"
      e.withColumn("h", expr(h))
        .orderBy(col("h"), col("vec_id")).limit(k)
        .select(col("vec_id").as("cid"), col("ed").as("ce"))
    }

    def pairsOf(init: DataFrame, iters: Int, top: Int): Set[(Long, Long)] = {
      val trained = (1 to iters).foldLeft(init) { (c, _) => update(assign(e, c)) }
      val assigned = assign(e, trained, top)
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
      val p1 = pairsOf(hashInit(k), iters, 1)
      val p2 = pairsOf(hashInit(k), iters, 2)
      println(s"hash k=$k iters=$iters probe1=${p1.size}/${exact.size} probe2=${p2.size}/${exact.size}")
    }
    spark.stop()
  }
}
