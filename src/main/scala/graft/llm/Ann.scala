package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection: exact baseline and the
  * LSH-bucketed approximate variant (the 100 TB scale path).
  *
  * The ANN variant buckets vectors by a 6-bit random-hyperplane
  * signature. Hyperplanes are Rademacher (±1) vectors derived from a
  * Knuth multiplicative LCG over (plane, dim) — plain integer
  * arithmetic, so the oracle reproduces the exact same buckets and the
  * result is deterministic. The quadratic pair search then runs only
  * within buckets: ~B× cheaper than brute force, and bucket-parallel
  * across the cluster (shuffle on the bucket id).
  */
object Ann {

  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  /** Exact embedding-cosine near-dup pairs (sim >= 0.45), via the
    * packed-kernel scan (see Similarity.packedVectors / CosNeighbors):
    * each row checks all forward partners in one tight loop instead of
    * materializing n² joined rows. */
  def cosNearDup(spark: SparkSession, sf: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    Tables.embeddings(spark, sf)
      // One parquet file → one split; spread the kernel across cores.
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("j", lit(0))
      .join(broadcast(Similarity.packedVectors(spark, sf)), "j")
      .select(col("vec_id").as("x"),
        explode(expr("graft_cos_nbrs(vec_id, embedding, vs, cast(0.45 as double))")).as("p"))
      .select(col("x"), col("p.y").as("y"), col("p.sim").as("sim"))
      .orderBy("x", "y")
  }

  /** Signed projection onto Rademacher hyperplane `i` (SQL text —
    * identical integer arithmetic in both engines). */
  private def planeDot(i: Int): String =
    s"aggregate(sequence(0, 63), cast(0 as double), (acc, d) -> acc + " +
      s"cast(element_at(embedding, cast(d + 1 as int)) as double) * " +
      s"(CASE WHEN (($i * 64 + d) * 2654435761) % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END))"

  /** The 6-bit bucket as interpreted SQL HOFs — kept as the reference
    * the native RademacherBucket expression is tested against. */
  private[graft] def bucketHofExpr: String =
    (0 until 6).map { i =>
      s"(CASE WHEN ${planeDot(i)} > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** LSH-bucketed approximate near-dup: same predicate as cosNearDup
    * but only pairs sharing the 6-bit hyperplane bucket are examined.
    * Bucket signatures come from the native RademacherBucket
    * expression (same integer-arithmetic planes as the oracle, one
    * pass per row instead of 6×64 interpreted lambdas). */
  def annLsh(spark: SparkSession, sf: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val e = Tables.embeddings(spark, sf)
      .withColumn("bucket", expr("graft_rademacher_bucket(embedding)"))
      .withColumn("nrm", sqrt(dot("embedding", "embedding")))
    val a = e.select(col("vec_id").as("x"), col("bucket"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("y"), col("bucket").as("bucket_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("bucket") === col("bucket_b") && col("x") < col("y"))
      .select(col("x"), col("y"), col("bucket"),
        round(dot("ea", "eb") / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= 0.45)
      .orderBy("x", "y")
  }

  /** Centroid-id offset so coarse-centroid ids can never equal a
    * vector id inside the CosTopK kernel (which skips self-pairs). */
  private val CentroidBase = 1000000000L

  /** IVF-style approximate near-dup: the second standard ANN shape
    * next to LSH. Coarse quantizer = the first 8 vectors (vec_id < 8,
    * deterministic at every sf); every vector is assigned to its
    * nearest centroid by rounded cosine (ties → lowest centroid id,
    * exactly the CosTopK order), then the pair search runs only within
    * cells via an equi-join on the cell id.
    *
    * 100 TB shape: centroids broadcast (kernel top-1 assignment, no
    * shuffle), vectors shuffle once on cell id, per-cell pair search is
    * cell-parallel. Real IVF trains centroids with k-means; the fixed
    * deterministic quantizer keeps the oracle reproducible while the
    * plan is identical. */
  def annIvf(spark: SparkSession, sf: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val e = Tables.embeddings(spark, sf)
    val centroids = e.filter(col("vec_id") < 8)
      .select(struct((col("vec_id") + CentroidBase).as("vec_id"),
        sqrt(dot("embedding", "embedding")).as("nrm"), col("embedding")).as("v"))
      .agg(collect_list(col("v")).as("cvs"))
      .withColumn("j", lit(0))
    val assigned = e
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("nrm", sqrt(dot("embedding", "embedding")))
      .withColumn("j", lit(0))
      .join(broadcast(centroids), "j")
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (expr("graft_cos_topk(vec_id, embedding, cvs, 1)")
          .getItem(0).getField("y") - CentroidBase).as("cell"))
    val a = assigned.select(col("vec_id").as("x"), col("cell"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("vec_id").as("y"), col("cell").as("cell_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("cell") === col("cell_b") && col("x") < col("y"))
      .select(col("x"), col("y"), col("cell"),
        round(dot("ea", "eb") / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= 0.45)
      .orderBy("x", "y")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_cos_neardup" -> cosNearDup,
    "llm_ann_lsh" -> annLsh,
    "llm_ann_ivf" -> annIvf
  )

  private val duckPlaneDot: Int => String = i =>
    s"list_sum(list_transform(range(64), d -> CAST(embedding[d + 1] AS DOUBLE) * " +
      s"(CASE WHEN (($i * 64 + d) * 2654435761) % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)))"

  private val duckBucket: String =
    (0 until 6).map { i =>
      s"(CASE WHEN ${duckPlaneDot(i)} > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "llm_cos_neardup" ->
      ("SELECT x, y, sim FROM (SELECT a.vec_id AS x, b.vec_id AS y, " +
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t " +
        "WHERE sim >= 0.45 ORDER BY x, y"),
    "llm_ann_lsh" ->
      (s"WITH sig AS (SELECT vec_id, embedding, CAST($duckBucket AS BIGINT) AS bucket FROM embeddings) " +
        "SELECT x, y, bucket, sim FROM (SELECT a.vec_id AS x, b.vec_id AS y, a.bucket AS bucket, " +
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim " +
        "FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t " +
        "WHERE sim >= 0.45 ORDER BY x, y"),
    "llm_ann_ivf" ->
      ("WITH c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "r AS (SELECT vec_id, embedding, c_id, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(ce AS DOUBLE[])), 6) DESC, c_id ASC) AS rn " +
        "FROM embeddings CROSS JOIN c), " +
        "asg AS (SELECT vec_id, embedding, c_id AS cell FROM r WHERE rn = 1) " +
        "SELECT x, y, cell, sim FROM (SELECT a.vec_id AS x, b.vec_id AS y, a.cell AS cell, " +
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim " +
        "FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id) t " +
        "WHERE sim >= 0.45 ORDER BY x, y")
  )
}
