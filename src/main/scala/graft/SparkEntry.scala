package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual suite lives in [[QuerySuite]]; this object is the stable
  * entry-point surface the driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Grouped pricing aggregation over lineitem (SURVEY.md §2.5). */
  def entry(spark: SparkSession): DataFrame =
    QuerySuite.queries("q07_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QuerySuite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/hash-based dedup candidates, KMeans IVF, ML training, stubs). */
  def oracleSql: Map[String, String] = QuerySuite.oracleSql
}
