package graft

class InventorySpec extends SparkSpec {

  test("every inventory query runs and returns rows on sf0.001") {
    Inventory.all.foreach { q =>
      val n = q.run(spark, sf0001).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("query names are unique") {
    val names = Inventory.all.map(_.name)
    assert(names.distinct.size === names.size)
  }
}
