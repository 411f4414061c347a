package graft

import org.apache.spark.sql.functions._

/** Capability extensions past the reference surface (SURVEY §2.3 末, §7 M7):
  * sketch-based approximate aggregates Spark provides natively
  * (HyperLogLog++ count-distinct, KLL-ish percentile) exposed through the
  * same inventory, plus exact twins that anchor them to the DuckDB oracle.
  * Sketch outputs are engine-specific → rows-only driver check; their error
  * vs the exact twin is asserted in ExtensionSpec.
  */
object InventoryExtensions {
  import graft.Tables._

  val all: Seq[QueryDef] = Seq(
    QueryDef("q24_count_distinct_exact",
      (s, d) => orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders")),
      Some("SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders FROM orders")),

    QueryDef("q25_approx_count_distinct_hll",
      // HLL++ sketch — engine-specific estimate, no cross-engine oracle;
      // ExtensionSpec asserts <5% error vs q24
      (s, d) => orders(s, d).agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("n_customers_est")),
      None),

    QueryDef("q26_orders_by_status",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus")),
      Some("SELECT o_orderstatus, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1")),

    QueryDef("q27_percentile_approx",
      // Spark's approx percentile sketch; rows-only (algorithm-specific),
      // anchored by ExtensionSpec against exact percentiles
      (s, d) => lineitem(s, d).agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50_est"),
        percentile_approx(col("l_quantity"), lit(0.95), lit(10000)).as("p95_est")),
      None)
  )
}
