package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Persisted IVF index: build-once/search-many equivalence with the
  * in-memory path, and the partition-pruning fact that justifies it. */
class AnnIndexSpec extends SparkSpec {

  private def embs = Tables.embeddings(spark, sf0001)
  private val path = "/tmp/graft_test_ivf_index"

  test("searchIvfIndex equals ivfTopK bit-for-bit given the same centroids") {
    val probes = embs.filter(col("vec_id") < 10)
    Ann.buildIvfIndex(embs, "vec_id", "embedding", path, numCentroids = 32)
    val fromIndex = Ann.searchIvfIndex(spark, path, probes, "vec_id",
        "embedding", k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inMemory = Ann.ivfTopK(embs, probes, "vec_id", "embedding",
        k = 5, numCentroids = 32, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromIndex === inMemory)
    assert(fromIndex.nonEmpty)
  }

  test("index search prunes at the directory level: only probed lists are scanned") {
    val probes = embs.filter(col("vec_id") < 3)
    Ann.buildIvfIndex(embs, "vec_id", "embedding", path, numCentroids = 32)
    val probed = Ann.probedCidCount(spark, path, probes, "vec_id",
      "embedding", nProbe = 4)
    val total = spark.read.parquet(s"$path/corpus")
      .select(col("cid")).distinct().count()
    assert(probed < total, s"probed $probed of $total lists — nothing pruned")
    // the cid IN-filter must reach the scan as a PartitionFilter (planning-
    // time pruning from the directory listing, zero footers for the rest)
    val res = Ann.searchIvfIndex(spark, path, probes, "vec_id", "embedding",
      k = 5, nProbe = 4)
    val planStr = res.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("cid IN") || planStr.contains("cid#"),
      s"cid filter did not reach the scan:\n${planStr.take(2000)}")
    // and the files an actual execution touches are the probed dirs only
    // (inputFiles lists pre-pruning; input_file_name() sees the real scan)
    val scannedDirs = spark.read.parquet(s"$path/corpus")
      .filter(col("cid").isin(0, 1)) // arbitrary 2-list filter
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0).split("/cid=")(1).split("/")(0)).toSet
    assert(scannedDirs.nonEmpty && scannedDirs.subsetOf(Set("0", "1")),
      s"scanned $scannedDirs")
  }
}
