package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Dedup}

/** One-off measurement of the randomized-geometry recalls used to pick the
  * bound-gate floors for q36/q39/q46/q86 (run per sf dir before gating —
  * the floors must hold at every scale the driver tests). */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
    val bf = Ann.bruteForceTopKFast(emb, probes, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").cache()
    val bfN = bf.count()

    def recallOf(res: org.apache.spark.sql.DataFrame): Double =
      bf.join(res.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / bfN

    val lsh = Ann.lshTopK(emb, probes, "vec_id", "embedding",
      k = 5, bitsPerTable = 6, numTables = 16, probeRadius = 1)
    val ivf = Ann.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 5, numCentroids = 32, nProbe = 8)
    val ivf8 = Ann.ivfTopKInt8(emb, probes, "vec_id", "embedding",
      k = 5, numCentroids = 32, nProbe = 8)
    println(f"[gateprobe] $sfDir lsh_recall=${recallOf(lsh)}%.4f ivf_recall=${recallOf(ivf)}%.4f ivf_int8_recall=${recallOf(ivf8)}%.4f bf_n=$bfN")
    // q169's half-trained appended index, at candidate nProbe values
    val appendPath = graft.TmpDirs.path(s"gateprobe_ivf_${new java.io.File(sfDir).getName}")
    Ann.buildIvfIndex(emb.filter(pmod(col("vec_id"), lit(2L)) === 0),
      "vec_id", "embedding", appendPath, numCentroids = 32)
    Ann.appendToIvfIndex(emb.filter(pmod(col("vec_id"), lit(2L)) === 1),
      "vec_id", "embedding", appendPath)
    Seq(8, 12, 16).foreach { np =>
      val r = recallOf(Ann.searchIvfIndex(spark, appendPath, probes,
        "vec_id", "embedding", k = 5, nProbe = np))
      println(f"[gateprobe] $sfDir ivf_append_recall(nProbe=$np)=$r%.4f")
    }

    // q171's int8-coded persisted index, and q176's auto-tuner choice
    val p8 = graft.TmpDirs.path(s"gateprobe_ivf8_${new java.io.File(sfDir).getName}")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", p8, numCentroids = 32,
      codec = "int8")
    val r8 = recallOf(Ann.searchIvfIndex(spark, p8, probes, "vec_id",
      "embedding", k = 5, nProbe = 8))
    val pf = graft.TmpDirs.path(s"gateprobe_ivff_${new java.io.File(sfDir).getName}")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", pf, numCentroids = 32)
    val probes20 = emb.filter(col("vec_id") < 20)
    val (chosen, tunedRecall) = Ann.autoTuneNProbe(spark, pf, emb, probes20,
      "vec_id", "embedding", k = 5, targetRecall = 0.75,
      candidates = Seq(2, 4, 8, 16, 24, 28))
    println(f"[gateprobe] $sfDir ivf_index_int8_recall=$r8%.4f autotune_nprobe=$chosen autotune_recall=$tunedRecall%.4f")

    // simhash vs exact Jaccard-0.8 pairs
    val docs = Tables.documents(spark, sfDir)
    val exactPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.8, shingleN = 3).select("id_a", "id_b").cache()
    val exN = exactPairs.count()
    val sim = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b")
    val simFound = exactPairs.join(sim, Seq("id_a", "id_b"), "left_semi").count()
    println(f"[gateprobe] $sfDir simhash_recall=${simFound.toDouble / math.max(exN, 1)}%.4f exact_pairs=$exN")

    // semdedup: recall of its pair list vs all-pairs cosine(0.4), and
    // drop-safety of the survivor set
    val exactCos = Ann.allPairsCosine(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").cache()
    val cosN = exactCos.count()
    val sdPairs = Ann.semDedupPairs(emb, "vec_id", "embedding",
      threshold = 0.4, numCentroids = 32)
    val sdFound = exactCos.join(sdPairs.select("id_a", "id_b"),
      Seq("id_a", "id_b"), "left_semi").count()
    val survivors = Ann.semDedup(emb, "vec_id", "embedding",
      threshold = 0.4, numCentroids = 32).select(col("vec_id"))
    val dropped = emb.select(col("vec_id")).except(survivors)
    val inPair = exactCos.select(col("id_a").as("vec_id"))
      .union(exactCos.select(col("id_b").as("vec_id"))).distinct()
    val unsafeDrops = dropped.except(inPair).count()
    println(f"[gateprobe] $sfDir semdedup_pair_recall=${sdFound.toDouble / math.max(cosN, 1)}%.4f cos_pairs=$cosN unsafe_drops=$unsafeDrops n_dropped=${dropped.count()}")
    spark.stop()
  }
}
