package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared per-family in graft.operators / graft.functions /
  * graft.streaming / graft.llm and assembled here.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggQ1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Joins.queries ++ Aggregates.queries ++ SortSet.queries ++
      Graph.queries ++
      Windows.queries ++ graft.functions.Scalars.queries ++
      graft.streaming.Events.queries ++ graft.functions.Udfs.queries ++
      graft.llm.Dedup.queries ++ graft.llm.Similarity.queries ++
      graft.llm.TextStats.queries ++ graft.llm.TextHash.queries ++
      graft.llm.LangId.queries ++ graft.llm.Ann.queries ++
      graft.llm.Multimodal.queries ++ graft.llm.Curation.queries ++
      graft.streaming.StreamDemo.queries

  /** Queries whose BUILDER performs per-invocation side effects (a
    * scratch write, a streaming micro-batch run) — the work IS the
    * query, so api.Prepared must never memoize them. Declared at the
    * owning module, next to each family's `queries` map, and unioned
    * here; a family with no write-path builders simply exports none.
    * PreparedSuite enforces the convention behaviorally: a repeat
    * build of every UNdeclared query must run zero jobs and allocate
    * zero new scratch dirs. */
  def sideEffecting: Set[String] =
    Scans.sideEffecting ++ graft.streaming.StreamDemo.sideEffecting

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Joins.oracle ++ Aggregates.oracle ++ SortSet.oracle ++
      Graph.oracle ++
      Windows.oracle ++ graft.functions.Scalars.oracle ++
      graft.streaming.Events.oracle ++ graft.functions.Udfs.oracle ++
      graft.llm.Dedup.oracle ++ graft.llm.Similarity.oracle ++
      graft.llm.TextStats.oracle ++ graft.llm.TextHash.oracle ++
      graft.llm.LangId.oracle ++ graft.llm.Ann.oracle ++
      graft.llm.Multimodal.oracle ++ graft.llm.Curation.oracle ++
      graft.streaming.StreamDemo.oracle
}
