package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingCuration

/** Long-stream reconcile state probe (round-9 verdict item 1): drives N
  * curate-batches with a reconcile pass per cadence against TWIN stores —
  * one star-compacting the `duppairs/` edge log (`compactPairs = true`,
  * the default) and one accumulating raw per-batch deltas — and stamps,
  * per cadence, the edge-log directory count, its on-disk bytes (the
  * bytes every reconcile pass re-reads), and the reconcile wall time.
  * Expected: the compacted store's dir count pins at ~1 and its read
  * bytes stay flat while the uncompacted store grows with stream
  * lifetime. Args: [nBatches] [reconcileEvery]. */
object ReconcileProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(50)
    val every = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = (0 until 40).map(i => s"tok$i").toArray
    def doc(swaps: (Int, String)*): String = {
      val w = base.clone()
      swaps.foreach { case (i, t) => w(i) = t }
      w.mkString(" ")
    }
    val stores = Seq(graft.TmpDirs.path("reconcileprobe_on"),
      graft.TmpDirs.path("reconcileprobe_off"))
    val cfg = StreamingCuration.Config()
    val fs = new org.apache.hadoop.fs.Path(stores.head)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dupStats(store: String): (Int, Long) = {
      val p = new org.apache.hadoop.fs.Path(s"$store/duppairs")
      if (!fs.exists(p)) (0, 0L)
      else {
        val dirs = fs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
        var bytes = 0L
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          if (!f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")) bytes += f.getLen
        }
        (dirs, bytes)
      }
    }
    (0 until nBatches).foreach { b =>
      // each batch: one near-dup of the FIRST batch's kept doc (drops,
      // logs one edge — the duplicate stream), one chain pair among
      // fresh ids (kept + later retracted), one unique doc
      val id0 = b.toLong * 100
      val rows = Seq(
        (id0 + 1, doc(30 -> s"u$b")),               // unique per batch
        (id0 + 2, doc(10 -> "altb", 25 -> s"c$b")), // chain end (kept)
        (id0 + 3, doc(10 -> "altb"))                // bridges to batch-0 family
      ).map { case (i, t) => (i, t, "web") }
      stores.zipWithIndex.foreach { case (store, si) =>
        StreamingCuration.curateBatch(rows.toDF("doc_id", "text", "source"),
          store, None, "doc_id", "text", cfg, batchId = b.toLong)
        if ((b + 1) % every == 0) {
          val t0 = System.nanoTime()
          val n = StreamingCuration.reconcileKept(spark, store,
            upToBatch = b.toLong + 1, compactPairs = si == 0).count()
          val sec = (System.nanoTime() - t0) / 1e9
          if ((b + 1) % 10 == 0 || b + 1 == nBatches) {
            val (dirs, bytes) = dupStats(store)
            val tag = if (si == 0) "compacted" else "raw"
            println(f"[reconcileprobe] cadence=${b + 1}%3d $tag%-9s " +
              f"retracted=$n dupdirs=$dirs dupbytes=$bytes sec=$sec%.2f")
          }
        }
      }
    }
    spark.stop()
  }
}
