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

  test("topNPerKey equals the single-window top-N, including on a hot key") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one key holds 90% of rows; ties on v broken by the unique id
    val hot = (0L until 9000L).map(i => ("hot", i % 100, i))
    val cold = (0L until 1000L).map(i => (s"g${i % 20}", i % 50, 100000L + i))
    val df = (hot ++ cold).toDF("k", "v", "id")
    val order = Seq(col("v").desc, col("id").asc)
    val plain = df.withColumn("rank",
        row_number().over(Window.partitionBy(col("k")).orderBy(order: _*))
          .cast("long"))
      .filter(col("rank") <= 5)
      .collect().map(_.toSeq).toSet
    val twoPhase = Skew.topNPerKey(df, Seq("k"), order, n = 5, shards = 8)
      .select(col("k"), col("v"), col("id"), col("rank"))
      .collect().map(_.toSeq).toSet
    assert(twoPhase === plain)
    assert(plain.count(_.head == "hot") === 5)
  }

  test("topNPerKey ≡ single window on randomized zipf-ish data (fuzz)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(31L)
    // skewed key draw: key frequency ∝ 1/rank, values with many ties
    val rows = (0L until 5000L).map { id =>
      val k = s"k${(5000.0 / (1 + rnd.nextInt(70))).toInt}"
      (k, rnd.nextInt(7).toLong, id)
    }
    val df = rows.toDF("k", "v", "id")
    for (n <- Seq(1, 4); shards <- Seq(3, 16)) {
      val order = Seq(col("v").desc, col("id").asc)
      val plain = df.withColumn("rank",
          row_number().over(Window.partitionBy(col("k")).orderBy(order: _*))
            .cast("long"))
        .filter(col("rank") <= n).collect().map(_.toSeq).toSet
      val two = Skew.topNPerKey(df, Seq("k"), order, n = n, shards = shards)
        .select(col("k"), col("v"), col("id"), col("rank"))
        .collect().map(_.toSeq).toSet
      assert(two === plain, s"n=$n shards=$shards")
    }
  }

  test("topNPerKey keeps all rows of keys smaller than n") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L))
      .toDF("k", "v", "id")
    val got = Skew.topNPerKey(df, Seq("k"),
      Seq(col("v").desc, col("id").asc), n = 10, shards = 4)
    assert(got.count() === 3)
    assert(got.filter(col("k") === "a").agg(max(col("rank"))).first.getLong(0) === 2L)
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
