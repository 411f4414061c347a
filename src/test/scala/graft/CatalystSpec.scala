package graft

import org.apache.spark.sql.functions._


import graft.functions.CiAggregator

/** Tests for the custom Catalyst surface: the CI Aggregator (typed + SQL)
  * and the sampled-aggregate auto-scaling rule. Uses the shared SparkSpec
  * session, which installs GraftExtensions at build time (a second
  * getOrCreate builder could not add extensions to an existing session). */
class CatalystSpec extends SparkSpec {

  test("ci_avg SQL aggregate matches the closed-form moments") {
    CiAggregator.register(spark)
    Tables.registerAll(spark, sf0001)
    val r = spark.sql(
      "SELECT ci_avg(l_quantity) AS ci FROM lineitem").select("ci.*").head()
    val exact = spark.table("lineitem").agg(avg("l_quantity")).head.getDouble(0)
    assert(math.abs(r.getDouble(0) - exact) < 1e-9) // full-table mean == exact
    assert(r.getDouble(1) <= exact && exact <= r.getDouble(2))
    assert(r.getLong(3) === spark.table("lineitem").count())
  }

  test("typed ciSum column scales and brackets the exact sum") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.agg(sum("l_extendedprice")).head.getDouble(0)
    val sampled = li.filter(
      pmod(col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L), lit(10L)) === 0)
    val ci = sampled.select(col("l_extendedprice")).as[Double]
      .select(CiAggregator.ciSum(10.0)).head()
    assert(math.abs(ci.value - exact) / exact < 0.10)
    assert(ci.ciLower <= exact && exact <= ci.ciUpper)
  }

  test("auto-scaling rule: sum over TABLESAMPLE estimates the full sum") {
    Tables.registerAll(spark, sf0001)
    val exact = spark.sql("SELECT SUM(l_extendedprice) FROM lineitem").head.getDouble(0)
    val est = spark.sql(
      "SELECT SUM(l_extendedprice) AS s FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .head.getDouble(0)
    assert(math.abs(est - exact) / exact < 0.25, s"est=$est exact=$exact")
  }

  test("auto-scaling rule leaves AVG alone") {
    Tables.registerAll(spark, sf0001)
    val exact = spark.sql("SELECT AVG(l_quantity) FROM lineitem").head.getDouble(0)
    val est = spark.sql(
      "SELECT AVG(l_quantity) AS a FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .head.getDouble(0)
    assert(math.abs(est - exact) / exact < 0.15)
  }

  test("auto-scaling can be disabled by conf") {
    Tables.registerAll(spark, sf0001)
    spark.conf.set("spark.graft.autoscale.enabled", "false")
    try {
      val exact = spark.sql("SELECT SUM(l_extendedprice) FROM lineitem").head.getDouble(0)
      val raw = spark.sql(
        "SELECT SUM(l_extendedprice) AS s FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
        .head.getDouble(0)
      assert(raw < exact * 0.5, "disabled rule must NOT scale the sampled sum")
    } finally spark.conf.set("spark.graft.autoscale.enabled", "true")
  }
}
