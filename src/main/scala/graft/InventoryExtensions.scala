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
      None),

    QueryDef("q52_percentiles_exact",
      // EXACT grouped percentiles — the oracle-gated anchor for the q27
      // sketch family: Spark's `percentile` and DuckDB's `quantile_cont`
      // share the h = p·(n−1) linear-interpolation formula bit-for-bit
      // (probed at p = 0.25/0.5/0.9/0.99 before gating)
      (s, d) => lineitem(s, d).groupBy(col("l_returnflag")).agg(
        percentile(col("l_extendedprice"), lit(0.25)).as("p25"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
        percentile(col("l_extendedprice"), lit(0.99)).as("p99"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, quantile_cont(l_extendedprice, 0.25) AS p25, quantile_cont(l_extendedprice, 0.5) AS p50, quantile_cont(l_extendedprice, 0.9) AS p90, quantile_cont(l_extendedprice, 0.99) AS p99 FROM lineitem GROUP BY 1 ORDER BY 1""")),

    QueryDef("q28_dual_rate_sum",
      // dual-pointer design (reference R9): coarse stride ∪ fine stride,
      // honest inclusion-probability scale via inclusion–exclusion
      (s, d) => {
        val key = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
        val sf = graft.exec.Sampling.dualRate(lineitem(s, d), key,
          coarseStep = 10L, fineStep = 7L)
        sf.df.agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") *
          lit(sf.scaleFactor)).as("sum_price_est"),
          count(lit(1)).as("n_samples"))
      },
      Some {
        val k = "(l_orderkey * 8191 + l_linenumber * 131)"
        val p = 1.0 / 10 + 1.0 / 7 - 1.0 / 70
        s"SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * ${1.0 / p} AS sum_price_est, COUNT(*) AS n_samples FROM lineitem WHERE $k % 10 = 0 OR $k % 7 = 1"
      }),

    QueryDef("q29_adaptive_sum",
      // adaptive CLT loop: seed-deterministic but Bernoulli rand() is not
      // reproducible in another engine -> rows-only check; convergence and
      // accuracy are asserted in AdaptiveSpec
      (s, d) => {
        val r = graft.exec.AdaptiveExecutor.run(
          lineitem(s, d), col("l_extendedprice"), graft.model.AggKind.Sum,
          graft.model.SamplingStrategy.Adaptive(errorThresholdPct = 2.0,
            initialFraction = 0.05)).result
        import s.implicits._
        Seq((r.value, r.ciLower, r.ciUpper, r.samplesUsed, r.status.toString))
          .toDF("sum_est", "ci_lower", "ci_upper", "n_samples", "status")
      },
      None)
  )
}
