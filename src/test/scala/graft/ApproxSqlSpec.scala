package graft

import org.apache.spark.sql.functions._

/** First-class APPROX_* SQL syntax (GraftSqlParser via injectParser).
  * The shared test session installs graft.plans.GraftExtensions, so these
  * queries run through the injected parser like any user's spark.sql. */
class ApproxSqlSpec extends SparkSpec {

  private def withLineitem[T](f: => T): T = {
    Tables.lineitem(spark, sf001).createOrReplaceTempView("lineitem")
    try f finally spark.catalog.dropTempView("lineitem")
  }

  test("APPROX_SUM(x, 10) estimates the exact sum within 5%") {
    withLineitem {
      val exact = spark.sql("SELECT SUM(l_quantity) AS s FROM lineitem")
        .head.get(0).toString.toDouble
      val est = spark.sql("SELECT APPROX_SUM(l_quantity, 10) AS s FROM lineitem")
        .head.getDouble(0)
      assert(math.abs(est / exact - 1.0) < 0.05, s"est=$est exact=$exact")
    }
  }

  test("APPROX_SUM is deterministic under the configured seed") {
    withLineitem {
      val sql = "SELECT APPROX_SUM(l_quantity, 10) AS s FROM lineitem"
      val a = spark.sql(sql).head.getDouble(0)
      val b = spark.sql(sql).head.getDouble(0)
      assert(a === b, "same seed + same data must reproduce the estimate")
    }
  }

  test("APPROX_COUNT(*) scales; APPROX_AVG self-normalizes; default pct is 10") {
    withLineitem {
      val exactN = spark.sql("SELECT COUNT(*) AS n FROM lineitem").head.getLong(0)
      val estN = spark.sql("SELECT APPROX_COUNT(*, 10) AS n FROM lineitem")
        .head.getDouble(0)
      assert(math.abs(estN / exactN - 1.0) < 0.05, s"est=$estN exact=$exactN")

      val exactAvg = spark.sql("SELECT AVG(l_extendedprice) AS a FROM lineitem")
        .head.get(0).toString.toDouble
      // bare APPROX_AVG(x): default 10% sample, result NOT scaled
      val estAvg = spark.sql("SELECT APPROX_AVG(l_extendedprice) AS a FROM lineitem")
        .head.get(0).toString.toDouble
      assert(math.abs(estAvg / exactAvg - 1.0) < 0.05,
        s"est=$estAvg exact=$exactAvg")
    }
  }

  test("GROUP BY: grouping column passes through, aggregates are estimated") {
    withLineitem {
      val exact = spark.sql(
        "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem GROUP BY l_returnflag")
        .collect().map(r => r.getString(0) -> r.get(1).toString.toDouble).toMap
      val est = spark.sql(
        """SELECT l_returnflag, APPROX_SUM(l_quantity, 10) AS s
           FROM lineitem GROUP BY l_returnflag""")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(est.keySet === exact.keySet)
      est.foreach { case (k, v) =>
        assert(math.abs(v / exact(k) - 1.0) < 0.10, s"group $k: est=$v exact=${exact(k)}")
      }
    }
  }

  test("WHERE still pushes below the injected Sample") {
    withLineitem {
      val df = spark.sql(
        "SELECT APPROX_SUM(l_quantity, 10) AS s FROM lineitem WHERE l_quantity > 25")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("Sample"), s"expected a Sample node in:\n$plan")
      val exact = spark.sql(
        "SELECT SUM(l_quantity) AS s FROM lineitem WHERE l_quantity > 25")
        .head.get(0).toString.toDouble
      val est = df.head.getDouble(0)
      assert(math.abs(est / exact - 1.0) < 0.05, s"est=$est exact=$exact")
    }
  }

  test("mixing APPROX_* with exact aggregates fails loudly") {
    withLineitem {
      val e = intercept[Exception] {
        spark.sql(
          "SELECT APPROX_SUM(l_quantity, 10) AS s, SUM(l_tax) AS t FROM lineitem")
          .collect()
      }
      assert(e.getMessage.contains("cannot be mixed"), e.getMessage)
    }
  }

  test("inconsistent sample percents fail loudly") {
    withLineitem {
      val e = intercept[Exception] {
        spark.sql(
          """SELECT APPROX_SUM(l_quantity, 10) AS s,
                    APPROX_COUNT(*, 5) AS n FROM lineitem""").collect()
      }
      assert(e.getMessage.contains("same sample percent"), e.getMessage)
    }
  }

  test("percent out of range fails loudly") {
    withLineitem {
      val e = intercept[Exception] {
        spark.sql("SELECT APPROX_SUM(l_quantity, 250) AS s FROM lineitem").collect()
      }
      assert(e.getMessage.contains("percent"), e.getMessage)
    }
  }

  test("ordinary SQL is untouched by the injected parser") {
    withLineitem {
      val n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").head.getLong(0)
      assert(n > 0)
      // approx_count_distinct (a real Spark function with an approx_ prefix)
      // must NOT be captured by the APPROX_* lowering
      val cd = spark.sql(
        "SELECT APPROX_COUNT_DISTINCT(l_orderkey) AS n FROM lineitem").head.getLong(0)
      assert(cd > 0)
    }
  }
}
