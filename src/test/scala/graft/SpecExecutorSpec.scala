package graft

import graft.exec.SpecExecutor
import graft.parser.QueryParser

/** End-to-end tests of the parse→plan→execute path (reference entry B:
  * SQL string + flags in, result rows out). */
class SpecExecutorSpec extends SparkSpec {

  private def ensureTables(): Unit = Tables.registerAll(spark, sf0001)

  test("exact SUM query end to end") {
    ensureTables()
    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem")
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.toSeq === Seq("sum_l_extendedprice"))
    val direct = spark.table("lineitem")
      .agg(org.apache.spark.sql.functions.sum("l_extendedprice")).head().getDouble(0)
    assert(r.head().getDouble(0) === direct)
  }

  test("WHERE + GROUP BY query end to end") {
    ensureTables()
    val spec = QueryParser.parse(
      "SELECT AVG(l_quantity) FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag")
    val rows = SpecExecutor.run(spark, spec).collect()
    assert(rows.length === 3)
  }

  test("APPROX() query samples and scales") {
    ensureTables()
    val spec = QueryParser.parse("SELECT APPROX(SUM(l_extendedprice)) FROM lineitem")
    val est = SpecExecutor.run(spark, spec).head().getDouble(0)
    val exact = spark.table("lineitem")
      .agg(org.apache.spark.sql.functions.sum("l_extendedprice")).head().getDouble(0)
    assert(math.abs(est - exact) / exact < 0.5, s"est=$est exact=$exact")
  }

  test("CI flag adds interval columns") {
    ensureTables()
    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
      samplePercent = Some(10.0), withCi = true)
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.toSeq === Seq("sum_l_extendedprice",
      "sum_l_extendedprice_ci_lower", "sum_l_extendedprice_ci_upper",
      "sum_l_extendedprice_n"))
    val row = r.head()
    assert(row.getDouble(1) <= row.getDouble(0) && row.getDouble(0) <= row.getDouble(2))
  }

  test("count-exact-compat answers COUNT from the stored total under sampling (A4)") {
    ensureTables()
    val spec = QueryParser.parse("SELECT COUNT(*) FROM lineitem",
      samplePercent = Some(10.0)).copy(countExactCompat = true)
    val r = SpecExecutor.run(spark, spec).head().getDouble(0)
    assert(r === spark.table("lineitem").count().toDouble)
  }

  test("--error routes through the adaptive executor with status column") {
    ensureTables()
    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
      errorThresholdPct = Some(5.0))
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.contains("status"))
    assert(Set("Stable", "Drifting", "InsufficientData").contains(r.head().getString(4)))
  }
}
