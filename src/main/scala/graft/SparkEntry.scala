package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All judged queries live in per-module registries (graft.operators.*);
  * this object is just the aggregation point the driver reads.
  */
object SparkEntry {

  /** Every judged query, in registration order. */
  def registry: Seq[Q] =
    operators.Relational.all ++ operators.Connector.all ++
      operators.LlmPipeline.all ++ operators.LlmCurate.all ++
      operators.Streaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("rel_q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Subset used by Bench as the headline set. */
  def benchQueries: Seq[Q] = registry.filter(_.bench)
}
