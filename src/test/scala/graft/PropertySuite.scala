package graft

import org.apache.spark.sql.functions._

/** Cheap invariants (SURVEY §5.5) — structural properties that must
  * hold regardless of data values.
  */
class PropertySuite extends SparkTestBase {

  test("dedup is idempotent: dedup groups all have keeper == min id") {
    val d = llm.Dedup.exactDedup(spark, sf)
    val n = d.count()
    assert(d.select("keeper_id").distinct().count() == n)
  }

  test("top-k is a prefix of the fully sorted output") {
    val full = operators.SortSet.topkLimit(spark, sf).collect()
    val sorted = full.sortBy(r => (-r.getDouble(2), r.getLong(0)))
    assert(full.toSeq == sorted.toSeq, "limit output not in sorted order")
  }

  test("session count is monotonically non-increasing in gap size") {
    def sessions(gap: String): Long =
      Tables.events(spark, sf)
        .groupBy(session_window(col("ts2"), gap), col("user_id"))
        .count().count()
    val s5 = sessions("5 minutes")
    val s30 = sessions("30 minutes")
    val s120 = sessions("120 minutes")
    assert(s5 >= s30 && s30 >= s120, s"$s5 >= $s30 >= $s120 violated")
  }

  test("set algebra: |A ∩ B| + |A \\ B| == |distinct A|") {
    val inter = operators.SortSet.setIntersect(spark, sf).count()
    val exc = operators.SortSet.setExcept(spark, sf).count()
    val distinctA = Tables.customer(spark, sf)
      .select("c_custkey").distinct().count()
    assert(inter + exc == distinctA)
  }

  test("window rank within group bounds and dense_rank <= rank") {
    val df = operators.Windows.winRankDense(spark, sf)
    val bad = df.filter(col("drnk") > col("rnk")).count()
    assert(bad == 0)
  }

  test("native char-gram hash count equals distinct substring count") {
    // Pins the byte-gram ≡ char-gram assumption (pure-ASCII corpus) and
    // collision-freeness of the one-pass hasher on real data.
    graft.functions.VectorExprs.register(spark)
    val bad = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 8)
      .select(
        expr("size(graft_chargram_hashes(text, 8))").as("native"),
        expr("size(array_distinct(transform(sequence(1, length(text) - 7), " +
          "i -> substring(text, i, 8))))").as("strings"))
      .filter(col("native") =!= col("strings"))
      .count()
    assert(bad == 0, s"$bad docs where native gram count != string gram count")
  }

  test("jaccard is symmetric-free (x < y) and bounded") {
    val pairs = llm.Dedup.nearDedup(spark, sf).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(5)
      assert(j >= 0.9 && j <= 1.0)
    }
  }
}
