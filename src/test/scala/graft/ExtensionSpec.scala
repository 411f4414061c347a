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

  test("HLL sketches are mergeable: union of per-group parts == whole") {
    val ev = Tables.events(spark, sf001)
    val exact = ev.agg(countDistinct("user_id")).head.getLong(0)
    // union of per-type sketches
    val viaUnion = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head.getLong(0)
    // one direct sketch over everything
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    assert(viaUnion === direct,
      "sketch algebra must be exact: merging partials == sketching the whole")
    assert(math.abs(viaUnion - exact).toDouble / exact < 0.05,
      s"est=$viaUnion exact=$exact")
  }

  test("native kernels are callable from SQL via the extension registry") {
    val row = spark.sql(
      """SELECT word_ngrams('a b c d', 2) AS g,
                han_count('中文ab') AS h,
                lexicon_hits('the cat and the hat', 'the,and') AS lx,
                string_fold_hash('abc') AS fh,
                vec_dot(array(float(1.0), float(2.0)),
                        array(float(3.0), float(4.0))) AS d""").head
    assert(row.getSeq[String](0) === Seq("a b", "b c", "c d"))
    assert(row.getInt(1) === 2)
    assert(row.getInt(2) === 3) // 'the' ×2 + 'and' ×1
    assert(row.getDouble(4) === 11.0)
    // the SQL fold hash must equal the Scala-API kernel on the same input
    import spark.implicits._
    import org.apache.spark.sql.graftshim.ColumnShim
    val viaApi = Seq("abc").toDF("s")
      .select(ColumnShim.column(
        graft.functions.StringFoldHash(ColumnShim.expression(col("s")))))
      .head.getLong(0)
    assert(row.getLong(3) === viaApi)
    // static args must be literals: they compile into the generated code
    intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b', cast(rand() * 2 AS INT))").collect()
    }
    // the hashed-verify pair: hashes of identical texts have Jaccard 1,
    // of disjoint texts 0
    val jrow = spark.sql(
      """SELECT jaccard_sorted_hashes(word_ngram_hashes('a b c d', 2),
                                      word_ngram_hashes('a b c d', 2)) AS j1,
                jaccard_sorted_hashes(word_ngram_hashes('a b c', 2),
                                      word_ngram_hashes('x y z', 2)) AS j0""").head
    assert(jrow.getDouble(0) === 1.0 && jrow.getDouble(1) === 0.0)
    // positional gram fold hashes: element i = string_fold_hash of the
    // space-joined gram at word i (the q180 span-dedup primitive)
    val grow = spark.sql(
      """SELECT word_gram_fold_hashes('a b c', 2) AS g,
                array(string_fold_hash('a b'), string_fold_hash('b c')) AS e""").head
    assert(grow.getSeq[Long](0) === grow.getSeq[Long](1))
  }
}
