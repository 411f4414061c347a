package graft

import org.apache.spark.sql.functions._

class ExtensionSpec extends SparkSpec {

  test("HLL approx count distinct within 5% of exact") {
    val o = Tables.orders(spark, sf001)
    val exact = o.agg(countDistinct("o_custkey")).head.getLong(0)
    val est = o.agg(approx_count_distinct(col("o_custkey"), 0.02)).head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val li = Tables.lineitem(spark, sf001)
    val exact = li.agg(expr("percentile(l_quantity, 0.5)")).head.getDouble(0)
    val est = li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .head.getDouble(0)
    assert(math.abs(est - exact) / math.max(exact, 1e-9) < 0.05)
  }
}
