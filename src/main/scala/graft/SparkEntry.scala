package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in [[graft.Inventory]] and the graft.* packages;
  * this object is the stable façade the driver invokes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The revenue-by-nation join exercises scan→broadcast-join→partial-agg→
    * shuffle→sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Inventory.byName("q20_join_revenue_by_nation").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Inventory.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
