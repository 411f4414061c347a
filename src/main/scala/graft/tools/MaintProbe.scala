package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Focused timing of the IVF index maintenance cycle (delete + upsert of
  * a ~9% id slice) — decomposed per op so a bench regression in
  * x_ann_index_maint_cycle_sec can be attributed without a full bench
  * run. Args: sfDir [rounds]. */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val path = graft.TmpDirs.path("maintprobe_ivf")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, numCentroids = 32)
    val maintIds = emb.filter(pmod(col("vec_id"), lit(11L)) === 5)
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Discovery stamp (round-9 verdict item 2): a small takedown batch —
    // the ids of ONE inverted list — must resolve its candidate lists
    // from the footer-sized bloom sidecars, not a full (id, cid) scan.
    // Reported: candidate count vs total lists, bloom sidecar bytes read
    // vs the corpus bytes a full-index discovery scan would walk.
    locally {
      import org.apache.hadoop.fs.Path
      val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
      def treeBytes(p: String): Long = {
        val hp = new Path(p)
        if (!fs.exists(hp)) 0L
        else {
          var total = 0L
          val it = fs.listFiles(hp, true)
          while (it.hasNext) {
            val f = it.next()
            if (!f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith(".")) total += f.getLen
          }
          total
        }
      }
      val meta = Ann.readManifest(spark, path)
      val someCid = meta.gens.keysIterator.min
      val oneList = Ann.readIndexCorpus(spark, path, Some(Seq(someCid)))
        .select(col("id")).localCheckpoint(true)
      val cand = Ann.bloomCandidateCids(spark, path, meta.gens, oneList)
      // driver budget 0: every bloom is "too big for the driver", so
      // discovery must go through the round-11 executor-side probe —
      // the stamp behind "bounded at ANY index size" (no fallback to
      // the full (id, cid) scan past ~25 M ids anymore)
      val candExec = Ann.bloomCandidateCids(spark, path, meta.gens, oneList,
        driverBudgetBytes = 0L)
      val bloomBytes = treeBytes(s"$path/blooms")
      val corpusBytes = treeBytes(s"$path/corpus")
      println(f"[maintprobe] discovery one-list batch: candidates=" +
        s"${cand.map(_.size).getOrElse(-1)} of ${meta.gens.size} lists " +
        s"(executor-probe, driver blooms disabled: " +
        s"${candExec.map(_.size).getOrElse(-1)}); " +
        f"bloom sidecar bytes=$bloomBytes (${bloomBytes * 100.0 / corpusBytes}%.2f%% " +
        s"of corpus $corpusBytes)")
    }
    (1 to rounds).foreach { i =>
      val td = t(Ann.deleteFromIvfIndex(spark, path,
        maintIds.select(col("vec_id")), "vec_id"): Unit)
      val tu = t(Ann.upsertIntoIvfIndex(
        maintIds.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", path))
      println(f"[maintprobe] round=$i delete=$td%.3f upsert=$tu%.3f cycle=${td + tu}%.3f")
    }
    spark.stop()
  }
}
