package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  private def events = Tables.events(spark, sf0001)
  private def li = Tables.lineitem(spark, sf0001)

  test("saltedCountDistinct is exact: equals plain countDistinct per group") {
    val withHour = events.withColumn("hour", date_trunc("hour", col("ts")))
    val plain = withHour.groupBy(col("hour"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(withHour, Seq("hour"), "user_id",
      salts = 8, alias = "n")
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin returns exactly the plain inner-join rows") {
    val dim = Tables.nation(spark, sf0001)
      .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
    val fact = Tables.supplier(spark, sf0001)
      .select(col("s_suppkey"), col("s_nationkey"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      .collect().map(_.toSeq).toSet
    val plain = key(fact.join(dim, Seq("s_nationkey")))
    val salted = key(Skew.saltedJoin(fact, dim, "s_nationkey", salts = 4))
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("saltedCountDistinct survives a deliberately hot group") {
    import spark.implicits._
    // one group holds 90% of rows with many distinct values
    val hot = (0L until 9000L).map(i => ("hot", i % 4000))
    val cold = (0L until 1000L).map(i => (s"g${i % 10}", i))
    val df = (hot ++ cold).toDF("g", "v")
    val got = Skew.saltedCountDistinct(df, Seq("g"), "v", salts = 16, alias = "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got("hot") === 4000L)
  }
}
