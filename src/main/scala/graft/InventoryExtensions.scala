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

    QueryDef("q64_value_histogram",
      // equi-width value profiling: bin = floor(x / width) is pure scan
      // arithmetic (no min/max pre-pass, no sort); one partial-agg shuffle
      // of (bin, count, decimal sum) partials
      (s, d) => lineitem(s, d)
        .withColumn("bin", floor(col("l_extendedprice") / lit(5000.0)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("bin")),
      Some("""SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin, COUNT(*) AS n, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM lineitem GROUP BY 1 ORDER BY 1""")),

    QueryDef("q65_group_corr",
      // Pearson correlation per group from five EXACT integer moments
      // (cents — corr is invariant under the x100 scaling), closed form
      // applied once per group in identical expression text. Moments stay
      // scale-0 decimals until ONE final double cast: a hugeint-backed
      // DECIMAL(38,6)->DOUBLE cast double-rounds in DuckDB (int->double
      // then /1e6, measured 1 ulp off on sum(price^2)) while Java's
      // BigDecimal converts in one rounding — scale 0 makes both a single
      // correctly-rounded int->double conversion.
      (s, d) => {
        val xc = (col("l_quantity").cast("decimal(18,2)") * lit(100)).cast("long")
        val yc = (col("l_extendedprice").cast("decimal(18,2)") * lit(100)).cast("long")
        lineitem(s, d)
          .select(col("l_returnflag"), xc.as("xc"), yc.as("yc"))
          .groupBy(col("l_returnflag")).agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("xc").cast("decimal(28,0)")).cast("double").as("sx"),
            sum(col("yc").cast("decimal(28,0)")).cast("double").as("sy"),
            sum((col("xc") * col("xc")).cast("decimal(38,0)")).cast("double").as("sxx"),
            sum((col("yc") * col("yc")).cast("decimal(38,0)")).cast("double").as("syy"),
            sum((col("xc") * col("yc")).cast("decimal(38,0)")).cast("double").as("sxy"))
          .select(col("l_returnflag"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
              .as("corr_qty_price"),
            col("n").cast("long").as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH c AS (SELECT l_returnflag, CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc FROM lineitem), m AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(CAST(xc AS DECIMAL(28,0))) AS DOUBLE) AS sx, CAST(SUM(CAST(yc AS DECIMAL(28,0))) AS DOUBLE) AS sy, CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) AS sxx, CAST(SUM(CAST(yc * yc AS DECIMAL(38,0))) AS DOUBLE) AS syy, CAST(SUM(CAST(xc * yc AS DECIMAL(38,0))) AS DOUBLE) AS sxy FROM c GROUP BY 1) SELECT l_returnflag, (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price, CAST(n AS BIGINT) AS n_rows FROM m ORDER BY l_returnflag""")),

    QueryDef("q66_pps_sum",
      // PPS weighted sampling + Horvitz-Thompson: inclusion probability
      // proportional to l_quantity, unbiased SUM estimate via y/p summed
      // through decimal (raw double HT sums are partition-order dependent)
      (s, d) => {
        val key = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
        val (sampled, _, _) = graft.exec.Sampling.pps(
          lineitem(s, d), col("l_quantity"), key, targetFraction = 0.1)
        sampled.agg(
          sum((col("l_extendedprice") / col("pps_p")).cast("decimal(28,10)"))
            .cast("double").as("sum_price_est"),
          count(lit(1)).as("n_samples"))
      },
      Some("""WITH m AS (SELECT COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s FROM lineitem), p AS (SELECT l_extendedprice, least(1.0, 0.1 * n * l_quantity / s) AS pp, ((l_orderkey * 8191 + l_linenumber * 131) % 1000003 * 1299709 + 104729) % 1000003 AS h FROM lineitem, m) SELECT CAST(SUM(CAST(l_extendedprice / pp AS DECIMAL(28,10))) AS DOUBLE) AS sum_price_est, COUNT(*) AS n_samples FROM p WHERE h < pp * 1000003""")),

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
