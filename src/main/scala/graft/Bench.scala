package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs the headline query set on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Each query gets one warmup run (JIT + codegen + file-cache) and the
  * median of 3 timed runs; the timed action is a full materialization
  * (`collect` on the final, already-aggregated result — all results here
  * are small aggregates, so collect cost is nil and the measured work is
  * the distributed plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_bench_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Self-defending measurement (round-3 lesson: a co-loaded 32-core box
    // produced probe ratios the docs disavowed): record the 1-minute load
    // average into the JSON so a polluted run is VISIBLE in the artifact,
    // and re-run any probe whose 3-run spread exceeds 30% of its median
    // (keeping the calmer batch's median, counting the re-runs).
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // QUIESCE GATE (round-4 lesson: both driver-recorded artifacts were
    // captured on a co-loaded box and their probe ratios contradicted the
    // quiesced measurements): refuse to start while the 1-minute load
    // average exceeds 2.0, waiting up to 3 minutes for the box to calm.
    // If it never does — or probes stay unstable anyway — the run is
    // STAMPED "polluted": true in the JSON so no one trusts its ratios.
    var quiesceWaitSec = 0
    while (loadavg() > 2.0 && quiesceWaitSec < 180) {
      Thread.sleep(5000); quiesceWaitSec += 5
    }
    val loadStart = loadavg()
    var unstableReruns = 0
    // sub-half-second probes re-run from JIT/GC noise even on a silent
    // box (30% of 150 ms is one safepoint) — only SLOW-probe instability
    // is co-load evidence, so only it feeds the polluted stamp
    var unstableRerunsSlow = 0
    def spreadOf(b: Seq[Double]): Double =
      (b.last - b.head) / math.max(b(1), 1e-9)
    def stableMedian(once: () => Double): Double = {
      def batch(): Seq[Double] = Seq(once(), once(), once()).sorted
      val b1 = batch()
      if (spreadOf(b1) <= 0.30) b1(1)
      else {
        unstableReruns += 1
        if (b1(1) > 0.5) unstableRerunsSlow += 1
        val b2 = batch()
        if (spreadOf(b2) <= spreadOf(b1)) b2(1) else b1(1)
      }
    }

    val headline = Inventory.all.filter(_.headline)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = headline.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try {
        once() // warmup
        stableMedian(() => once())
      } catch {
        case e: Throwable =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\n\\r\\t]", " ").take(200)
          -1.0
      }
      q.name -> t
    }
    // Scale probe at reference-baseline size (BASELINE.md: 10M-row SUM,
    // 5.123 s exact, up to 234x claimed sampled speedup): union the sf
    // lineitem 10x (~6M rows at sf0.1) and compare a full exact SUM against
    // a 10% systematic sample SUM — the honest comparable is the
    // exact/sampled ratio at equal fractions, not absolute wall-clock.
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val li10 = Seq.fill(10)(li).reduce(_ union _)
    val key = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
    def timeMedian(f: => Unit): Double = {
      f // warmup
      stableMedian { () =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
    }
    val nRows = li10.count()
    // fixture caches are keyed on the scale factor: a bare _SUCCESS check
    // would silently reuse files built from a different SPARK_GRAFT_SF_DIR
    val sfTag = new java.io.File(sfDir).getName
    // materialize once as a 40-file dataset so file-level sampling has
    // files to skip (the fixtures are single-file)
    val li10Path = s"/tmp/graft_bench_li10_$sfTag.parquet"
    if (!new java.io.File(li10Path, "_SUCCESS").exists()) {
      li10.repartition(40).write.mode("overwrite").parquet(li10Path)
    }
    val li10f = spark.read.parquet(li10Path)
    val tExact = timeMedian {
      li10f.agg(sum(col("l_extendedprice"))).collect(): Unit
    }
    // row-level systematic: variance win only, no IO win (documented)
    val tSampled = timeMedian {
      li10f.filter(pmod(key, lit(10L)) === 0)
        .agg(sum(col("l_extendedprice")) * lit(10.0)).collect(): Unit
    }
    // file-level cluster sampling: reads 1/10 of the part-files
    val fileSf = graft.sources.FileSampling.parquetFileSample(spark, li10Path, 10)
    val tFile = timeMedian {
      fileSf.df.agg(sum(col("l_extendedprice")) * lit(fileSf.scaleFactor))
        .collect(): Unit
    }
    // estimator accuracy at the same 10% fractions (the reference claims
    // 95.8–99.96% across its sampling configs — this is the measured
    // comparable, not a simulation)
    val exactSumV = li10f.agg(sum(col("l_extendedprice"))).first.getDouble(0)
    val sysEstV = li10f.filter(pmod(key, lit(10L)) === 0)
      .agg(sum(col("l_extendedprice")) * lit(10.0)).first.getDouble(0)
    val fileEstV = fileSf.df
      .agg(sum(col("l_extendedprice")) * lit(fileSf.scaleFactor))
      .first.getDouble(0)
    def accPct(est: Double): Double =
      100.0 * (1.0 - math.abs(est - exactSumV) / math.abs(exactSumV))
    // Data-layout probe: the same rows written range-clustered on the
    // filter column vs hash-scattered. Parquet row-group min/max stats +
    // the pushed-down band predicate let the clustered read skip nearly
    // every file/row group — the sort-on-write lever that turns a
    // selective 100 TB scan into a few-GB one (zone-map pruning; the
    // scattered layout must decode every row group). Probed at 60 M rows
    // (built once, cached on disk): at 6 M the ~0.08 s fixed job overhead
    // swamps the decode gap and the measured ratio undersells the pruning
    // (1.3× there vs the true ~40-file skip — same overhead bound the
    // file-sampling probe documents).
    val liScatteredPath = s"/tmp/graft_bench_li100_scattered_$sfTag.parquet"
    if (!new java.io.File(liScatteredPath, "_SUCCESS").exists()) {
      Seq.fill(10)(li10f).reduce(_ union _).repartition(80)
        .write.mode("overwrite").parquet(liScatteredPath)
    }
    val liScattered = spark.read.parquet(liScatteredPath)
    val liClusteredPath = s"/tmp/graft_bench_li100_clustered_$sfTag.parquet"
    if (!new java.io.File(liClusteredPath, "_SUCCESS").exists()) {
      graft.sources.Layout.clusteredWrite(liScattered, liClusteredPath,
        "l_orderkey", files = 80)
    }
    val liClustered = spark.read.parquet(liClusteredPath)
    // Z-order leg: interleave (l_orderkey, l_partkey) bin bits — a band on
    // EITHER column prunes, where the linear layout prunes only l_orderkey
    // bands and pays full price on l_partkey ones.
    val liZorderPath = s"/tmp/graft_bench_li100_zorder_$sfTag.parquet"
    if (!new java.io.File(liZorderPath, "_SUCCESS").exists()) {
      graft.sources.Layout.zorderWrite(liScattered, liZorderPath,
        Seq("l_orderkey", "l_partkey"), files = 80)
    }
    val liZorder = spark.read.parquet(liZorderPath)
    val keyStats = li10f.agg(max(col("l_orderkey")), max(col("l_partkey"))).first
    val (maxKey, maxPart) = (keyStats.getLong(0), keyStats.getLong(1))
    // full-row retrieval (hash of every column ⇒ every column decodes):
    // the point-lookup/band-fetch workload zone maps exist for — a
    // narrow-projection agg is overhead-bound at sf0.1 and hides the win
    def bandScan(df: org.apache.spark.sql.DataFrame, c: String,
        lo: Long, hi: Long): Unit =
      df.filter(col(c).between(lo, hi))
        .agg(count(lit(1)),
          sum(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
            .cast("decimal(38,0)")))
        .collect(): Unit
    val (kLo, kHi) = (maxKey / 2, maxKey / 2 + maxKey / 100)    // ~1% band
    val (pLo, pHi) = (maxPart / 2, maxPart / 2 + maxPart / 100) // ~1% band
    val tScanScattered = timeMedian(bandScan(liScattered, "l_orderkey", kLo, kHi))
    val tScanClustered = timeMedian(bandScan(liClustered, "l_orderkey", kLo, kHi))
    val tZorderKey = timeMedian(bandScan(liZorder, "l_orderkey", kLo, kHi))
    val tLinearPart = timeMedian(bandScan(liClustered, "l_partkey", pLo, pHi))
    val tZorderPart = timeMedian(bandScan(liZorder, "l_partkey", pLo, pHi))
    // Hive-style directory partitioning by ship month: pruning happens at
    // PLANNING time from the directory listing (PartitionFilters — zero
    // footers read for excluded months), the coarse complement of the
    // row-group zone maps above. Same one-month retrieval against the
    // hash-scattered files must open every footer and decode every row
    // group's date column. Probed at 60 M rows (the li100 fixture): at
    // 6 M both sides sat at the ~0.1 s job-overhead floor and the probe
    // read as noise (a measured 0.87× "speedup" in one round).
    val liMonthPath = s"/tmp/graft_bench_li100_bymonth_$sfTag.parquet"
    if (!new java.io.File(liMonthPath, "_SUCCESS").exists()) {
      liScattered
        .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        .repartition(col("ship_month"))
        .write.partitionBy("ship_month").mode("overwrite").parquet(liMonthPath)
    }
    val liMonth = spark.read.parquet(liMonthPath)
    def monthHash(df: org.apache.spark.sql.DataFrame,
        cond: org.apache.spark.sql.Column): Unit =
      df.filter(cond).agg(count(lit(1)),
        sum(xxhash64(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"))
          .cast("decimal(38,0)"))).collect(): Unit
    val tMonthPruned = timeMedian(monthHash(liMonth,
      col("ship_month") === "1998-06"))
    val tMonthScattered = timeMedian(monthHash(liScattered,
      col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-07-01").cast("timestamp")))
    // embedding near-dup over the full embeddings fixture: exercises the
    // native vec_dot codegen kernel (signature + verify) through the
    // multi-table LSH bucket-collect path
    val emb = Tables.embeddings(spark, sfDir)
    val tEmbedDedup = timeMedian {
      graft.operators.Ann.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4).count(): Unit
    }
    // ANN accuracy probe: recall of the two scale paths vs exact brute
    // force on the same probes — the accuracy half of the ANN speed story
    // (specs pin recall floors on planted clusters; this measures it on
    // the real fixture each round)
    val annProbes = emb.filter(col("vec_id") < 10)
    def nnSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactNN = nnSet(graft.operators.Ann.bruteForceTopKFast(
      emb, annProbes, "vec_id", "embedding", 5))
    val ivfRecall = nnSet(graft.operators.Ann.ivfTopK(emb, annProbes,
      "vec_id", "embedding", k = 5, numCentroids = 32, nProbe = 8))
      .intersect(exactNN).size.toDouble / exactNN.size
    val lshRecall = nnSet(graft.operators.Ann.lshTopK(emb, annProbes,
      "vec_id", "embedding", k = 5, bitsPerTable = 6, numTables = 16,
      probeRadius = 1)).intersect(exactNN).size.toDouble / exactNN.size
    // int8-quantized IVF verify (q165): recall vs exact on the same
    // probes, wall-clock vs the float path, and the MEASURED exchange
    // width of a coded vs float candidate projection (one explicit
    // repartition shuffle each, task-level shuffleWrite bytes summed via
    // a listener — the 4×-narrower-candidate-rows claim as bytes)
    val ivf8Recall = nnSet(graft.operators.Ann.ivfTopKInt8(emb, annProbes,
      "vec_id", "embedding", k = 5, numCentroids = 32, nProbe = 8))
      .intersect(exactNN).size.toDouble / exactNN.size
    val tIvfFloat = timeMedian {
      graft.operators.Ann.ivfTopK(emb, annProbes, "vec_id", "embedding",
        k = 5, numCentroids = 32, nProbe = 8).count(): Unit
    }
    val tIvfInt8 = timeMedian {
      graft.operators.Ann.ivfTopKInt8(emb, annProbes, "vec_id", "embedding",
        k = 5, numCentroids = 32, nProbe = 8).count(): Unit
    }
    // build-once/search-many amortization: ivfTopK retrains + rescans per
    // batch; the persisted index pays the build once and every search
    // after that reads only the probed lists (partition pruning)
    val ivfIndexPath = s"/tmp/graft_bench_ivfindex_$sfTag"
    val tIndexBuild = {
      val t0 = System.nanoTime()
      graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding",
        ivfIndexPath, numCentroids = 32)
      (System.nanoTime() - t0) / 1e9
    }
    val tIndexSearch = timeMedian {
      graft.operators.Ann.searchIvfIndex(spark, ivfIndexPath, annProbes,
        "vec_id", "embedding", k = 5, nProbe = 8).count(): Unit
    }
    // Shuffle-write bytes of the measured workload ONLY: accumulation is
    // scoped to the stages of jobs carrying our job group (concurrent or
    // straggling jobs from other probes can neither overcount nor
    // undercount it), and instead of a fixed sleep we poll until the async
    // listener bus has delivered the ends of all jobs the group started.
    def shuffledBytes(f: => Unit): Double = {
      val sc = spark.sparkContext
      val group = "graft-bytes-probe"
      val acc = new java.util.concurrent.atomic.AtomicLong(0L)
      val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val started = new java.util.concurrent.atomic.AtomicInteger(0)
      val ended = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val g = Option(e.properties)
            .map(_.getProperty("spark.jobGroup.id")).orNull
          if (g == group) {
            started.incrementAndGet()
            e.stageIds.foreach(sid => { stages.add(sid); () })
          }
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          // job ids are not tracked per-group; count ends only up to the
          // group's started jobs (other jobs should not run concurrently,
          // but if one does, the stage filter still excludes its tasks)
          ended.incrementAndGet(); ()
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null && stages.contains(e.stageId)) {
            acc.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
          }
        }
      }
      sc.addSparkListener(l)
      sc.setJobGroup(group, "shuffled-bytes probe")
      try {
        f
        // drain: wait until job-end events cover the group's started jobs
        // and the byte counter has stopped moving
        var waited = 0
        while (ended.get < started.get && waited < 5000) {
          Thread.sleep(100); waited += 100
        }
        var prev = -1L
        var stable = 0
        while (stable < 3 && waited < 8000) {
          val cur = acc.get
          if (cur == prev) stable += 1 else stable = 0
          prev = cur
          Thread.sleep(100); waited += 100
        }
      } finally {
        sc.clearJobGroup()
        sc.removeSparkListener(l)
      }
      acc.get.toDouble
    }
    // the post-exchange agg must CONSUME the payload (xxhash64 of it) or
    // column pruning drops the vector before the repartition and both
    // legs shuffle 8-byte ids — measured, not hypothetical
    val bytesFloatLeg = shuffledBytes {
      emb.select(col("vec_id"), col("embedding"))
        .repartition(32, col("vec_id"))
        .agg(sum(xxhash64(col("embedding")).cast("decimal(38,0)")))
        .collect(): Unit
    }
    val bytesCodedLeg = shuffledBytes {
      emb.select(col("vec_id"),
          graft.functions.VectorOps.int8Code(col("embedding")).as("code"))
        .repartition(32, col("vec_id"))
        .agg(sum(xxhash64(col("code")).cast("decimal(38,0)")))
        .collect(): Unit
    }
    // Bucketed co-located join probe: both sides bucketed+sorted on the
    // join key -> SortMergeJoin with ZERO exchanges and no sort, vs the
    // plain shuffle join (broadcast disabled for the probe so the exchange
    // cost is actually visible; at 100 TB the orders side is far past any
    // broadcast threshold and this IS the plan that matters).
    val orders = Tables.orders(spark, sfDir)
    val (tJoinPlain, tJoinBucketed) = {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // a fresh JVM has an empty in-memory catalog but the warehouse
        // DIRECTORY survives -> LOCATION_ALREADY_EXISTS unless cleared
        Seq("li_bucketed", "orders_bucketed").foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          val root = java.nio.file.Paths.get("/tmp/graft_bench_warehouse", t)
          if (java.nio.file.Files.exists(root)) {
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
          }
        }
        // repartition on the bucket key first -> exactly ONE file per
        // bucket, so the read preserves the sortBy order and the join
        // needs neither Exchange nor Sort (multi-file buckets would
        // force a re-sort and muddy the probe)
        li.repartition(16, col("l_orderkey"))
          .write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable("li_bucketed")
        orders.repartition(16, col("o_orderkey"))
          .write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable("orders_bucketed")
        def plainOnce(): Double = {
          val t0 = System.nanoTime()
          li.join(orders, col("l_orderkey") === col("o_orderkey"))
            .agg(count(lit(1))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        def bucketedOnce(): Double = {
          val t0 = System.nanoTime()
          spark.table("li_bucketed")
            .join(spark.table("orders_bucketed"),
              col("l_orderkey") === col("o_orderkey"))
            .agg(count(lit(1))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        // interleave the two sides (warmup pair + 5 timed pairs) so
        // external-load drift hits both equally and the RATIO stays honest
        plainOnce(); bucketedOnce()
        val pairs = Seq.fill(5)((plainOnce(), bucketedOnce()))
        val med = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
        (med(pairs.map(_._1)), med(pairs.map(_._2)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    // Universe-join-sampling probe: sampling THROUGH the join. Both sides
    // filtered to the same 10% hash band of the join key (JoinSampling) —
    // the one sampling design whose joined SUM is unbiased at ×10 — vs
    // the exact join at 6 M × 150 k. Broadcast disabled like the bucketed
    // probe: at 100 TB both legs shuffle, and that is what the band
    // predicate shrinks 10× on BOTH sides (an independent per-row design
    // could thin only one side without bias). Interleaved pairs so load
    // drift hits both equally.
    val (tUniExact, tUniSampled, uniAccPct) = {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val ordSel = orders.select(col("o_orderkey"), col("o_orderpriority"))
        val us = graft.operators.JoinSampling.universeSample(
          li10f, col("l_orderkey"), ordSel, col("o_orderkey"))
        def sumOf(l: org.apache.spark.sql.DataFrame,
            r: org.apache.spark.sql.DataFrame, scale: Double): Double =
          l.join(r, col("l_orderkey") === col("o_orderkey"))
            .agg((sum(col("l_extendedprice")) * lit(scale)).as("s"))
            .first.getDouble(0)
        def exactOnce(): Double = {
          val t0 = System.nanoTime(); sumOf(li10f, ordSel, 1.0)
          (System.nanoTime() - t0) / 1e9
        }
        def sampledOnce(): Double = {
          val t0 = System.nanoTime(); sumOf(us.left, us.right, us.scaleFactor)
          (System.nanoTime() - t0) / 1e9
        }
        exactOnce(); sampledOnce()
        val pairs = Seq.fill(5)((exactOnce(), sampledOnce()))
        val med = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
        val exactV = sumOf(li10f, ordSel, 1.0)
        val estV = sumOf(us.left, us.right, us.scaleFactor)
        (med(pairs.map(_._1)), med(pairs.map(_._2)),
          100.0 * (1.0 - math.abs(estV - exactV) / exactV))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    // Priority-sampling probe: the top-(k+1)-by-priority selection as
    // TakeOrderedAndProject (per-partition bounded heaps — what
    // Sampling.prioritySample emits) vs the naive expression of the same
    // semantics as a global row_number window (single-partition sort of
    // the whole table — the plan that dies first at 100 TB). Both branches
    // read the SAME 600 k-row frame (`li`) so the ratio isolates the
    // plan-shape difference, not a data-volume difference.
    val (tPrioTopk, tPrioSort) = {
      val pw = col("l_extendedprice")
      def topkOnce(): Double = {
        val t0 = System.nanoTime()
        graft.exec.Sampling.prioritySample(li, key, pw, k = 500).collect()
        (System.nanoTime() - t0) / 1e9
      }
      def sortOnce(): Double = {
        import org.apache.spark.sql.expressions.Window
        val m = 1000003L
        val h = pmod(pmod(col("ps_key"), lit(m)) * lit(1299709L) +
          lit(104729L), lit(m)) + lit(1L)
        val t0 = System.nanoTime()
        li.select(key.as("ps_key"), pw.cast("double").as("ps_w"))
          .withColumn("ps_prio", col("ps_w") * lit(m.toDouble) / h)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("ps_prio").desc, col("ps_key").asc)))
          .filter(col("rn") <= 501).collect()
        (System.nanoTime() - t0) / 1e9
      }
      topkOnce(); sortOnce()
      val pairs = Seq.fill(3)((topkOnce(), sortOnce()))
      val med = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
      (med(pairs.map(_._1)), med(pairs.map(_._2)))
    }
    // The same universe probe at 60 M fact rows: at 6 M the join is
    // scan-bound and the band filter shows ~1.3×; here the shuffle legs
    // dominate (60 M rows exchanged vs 6 M), which is the regime 100 TB
    // lives in — the measured speedup should widen toward the volume
    // ratio as scan cost amortizes. 3 interleaved pairs (each exact run
    // shuffles 60 M rows; the ratio, not the absolute, is the result).
    val (tUni60Exact, tUni60Sampled) = {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val ordSel = orders.select(col("o_orderkey"), col("o_orderpriority"))
        val us = graft.operators.JoinSampling.universeSample(
          liScattered, col("l_orderkey"), ordSel, col("o_orderkey"))
        def sumOf(l: org.apache.spark.sql.DataFrame,
            r: org.apache.spark.sql.DataFrame, scale: Double): Double =
          l.join(r, col("l_orderkey") === col("o_orderkey"))
            .agg((sum(col("l_extendedprice")) * lit(scale)).as("s"))
            .first.getDouble(0)
        def exactOnce(): Double = {
          val t0 = System.nanoTime(); sumOf(liScattered, ordSel, 1.0)
          (System.nanoTime() - t0) / 1e9
        }
        def sampledOnce(): Double = {
          val t0 = System.nanoTime(); sumOf(us.left, us.right, us.scaleFactor)
          (System.nanoTime() - t0) / 1e9
        }
        exactOnce(); sampledOnce()
        val pairs = Seq.fill(3)((exactOnce(), sampledOnce()))
        val med = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
        (med(pairs.map(_._1)), med(pairs.map(_._2)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    // Skew probe at 6 M rows: ~30% of fact rows forced onto ONE supplier
    // key, broadcast disabled (at 100 TB the build side may be too big to
    // broadcast and the hot key pins a reducer). Measures the plain
    // shuffle join (AQE's skew-split gets its honest shot — it only helps
    // when the skewed partition exceeds its size thresholds) against
    // Skew.saltedJoin's 8-way content-hash scatter of the same join.
    val (tSkewPlain, tSkewSalted) = {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val skewedFact = li10f.select(
          when(pmod(key, lit(10L)) < 3, lit(1L)).otherwise(col("l_suppkey"))
            .as("l_suppkey"),
          col("l_extendedprice"))
        val buildSide = Tables.supplier(spark, sfDir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        def agged(j: org.apache.spark.sql.DataFrame) = j
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)), sum(col("l_extendedprice")))
        val plain = timeMedian {
          agged(skewedFact.join(buildSide, "l_suppkey")).collect(): Unit
        }
        val salted = timeMedian {
          agged(graft.operators.Skew.saltedJoin(skewedFact, buildSide,
            "l_suppkey", salts = 8)).collect(): Unit
        }
        (plain, salted)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    // argmax-vs-window probe at 6 M rows: latest-per-supplier via the
    // window sort (shuffles + sorts every row) vs max(struct(...))
    // aggregation (partial agg ships one candidate per task×key). The
    // ratio is the q97 scale story, measured.
    val argmaxIn = li10f.select(col("l_suppkey"), col("l_extendedprice"),
      col("l_orderkey"), col("l_linenumber"))
    val tLatestWindow = timeMedian {
      graft.operators.Packing.latestPerKey(argmaxIn, Seq("l_suppkey"),
          Seq("l_extendedprice", "l_orderkey", "l_linenumber"))
        .agg(count(lit(1))).collect(): Unit
    }
    val tLatestAgg = timeMedian {
      graft.operators.Packing.argmaxPerKey(argmaxIn, Seq("l_suppkey"),
          Seq("l_extendedprice", "l_orderkey", "l_linenumber"), Nil)
        .agg(count(lit(1))).collect(): Unit
    }
    // broadcast-join argmax: hash-agg per-key max (no sort), broadcast it
    // back, tie-break only the survivors — zero full-data shuffle/sort.
    // broadcastMaxes on: l_suppkey cardinality is known-bounded here,
    // which is the opt-in's contract (default AQE path pays the fact's
    // local map-write before converting — measured 0.21× vs window)
    val tLatestJoin = timeMedian {
      graft.operators.Packing.argmaxViaJoin(argmaxIn, Seq("l_suppkey"),
          "l_extendedprice", Seq("l_orderkey", "l_linenumber"),
          broadcastMaxes = true)
        .agg(count(lit(1))).collect(): Unit
    }
    // Approx-mode rewrite probe: the same COUNT(DISTINCT) SQL text, exact
    // vs plan-rewritten to HLL (ApproxAggregateRewrite, attached here via
    // experimental.extraOptimizations — same rule object the extension
    // injects; getOrCreate would hand back this session and silently skip
    // spark.sql.extensions). The exact plan Expands + double-shuffles
    // every distinct value; the sketch plan shuffles one few-KB buffer
    // per partition — the gap grows with distinct cardinality, which at
    // 100 TB is the whole game.
    val (tCdExact, tCdApprox, cdErrPct, tCdHiExact, tCdHiApprox) = {
      Tables.registerAll(spark, sfDir)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.ApproxAggregateRewrite
      val q = "SELECT COUNT(DISTINCT l_partkey) AS d FROM lineitem"
      // high-cardinality leg: every (orderkey, linenumber) is distinct, so
      // the exact plan shuffles ~|table| values twice while the sketch
      // plan shuffles one few-KB buffer per partition — THIS is the gap
      // the rewrite exists for; the l_partkey leg (~200k distinct at
      // sf0.1) measures the low-cardinality wash where both plans are
      // overhead-bound and the rewrite honestly buys nothing locally
      val qHi = "SELECT COUNT(DISTINCT l_orderkey * 8 + l_linenumber) " +
        "AS d FROM lineitem"
      spark.conf.set("spark.graft.approx.countDistinct.enabled", "false")
      val exactV = spark.sql(q).first.getLong(0)
      val tEx = timeMedian { spark.sql(q).collect(): Unit }
      val tHiEx = timeMedian { spark.sql(qHi).collect(): Unit }
      spark.conf.set("spark.graft.approx.countDistinct.enabled", "true")
      val apxV = spark.sql(q).first.getLong(0)
      val tAp = timeMedian { spark.sql(q).collect(): Unit }
      val tHiAp = timeMedian { spark.sql(qHi).collect(): Unit }
      spark.conf.set("spark.graft.approx.countDistinct.enabled", "false")
      (tEx, tAp, 100.0 * math.abs(apxV - exactV).toDouble / exactV,
        tHiEx, tHiAp)
    }
    // End-to-end curation probe: the full pipeline (exact dedup →
    // MinHash near-dedup → decontaminate → quality gate → mix → split)
    // over the whole documents fixture — the composite workload a
    // training-data run actually executes, timed as one number so a
    // regression in ANY stage moves it.
    val docsAll = Tables.documents(spark, sfDir)
    val evalSet = docsAll.filter(pmod(col("doc_id"), lit(97L)) === 0)
      .select(col("doc_id"), col("text"))
    val tPipeline = timeMedian {
      graft.operators.CurationPipeline.run(docsAll, Some(evalSet),
        "doc_id", "text", "source",
        graft.operators.CurationPipeline.Config(minQuality = 0.2,
          modelFilterMinMarginCents = Some(-1000L)))
        .agg(count(lit(1))).collect(): Unit
    }
    // per-stage attribution for the same flow (one staged run: each stage
    // persisted + counted, so a regression in x_pipeline_sec is traceable
    // to a stage; stages sum to ≈ the fused total + materialization cost)
    val (_, pipelineStages) = graft.operators.CurationPipeline.runStaged(
      docsAll, Some(evalSet), "doc_id", "text", "source",
      graft.operators.CurationPipeline.Config(minQuality = 0.2,
          modelFilterMinMarginCents = Some(-1000L)))
    // Dedup scale probe: 10× the documents fixture with remapped ids —
    // every doc gains 10 near-identical copies, the adversarial case for
    // candidate generation (each cluster of 10 yields 45 candidate pairs).
    // Catches driver-side or skew cliffs the base fixture cannot show.
    val docs10 = (0 until 10).map(i => docsAll.select(
        (col("doc_id") * 16 + lit(i)).as("doc_id"), col("text"),
        col("source")))
      .reduce(_ union _)
    val nDocs10 = docs10.count()
    val tDedup10Near = timeMedian {
      graft.operators.Dedup.dropNearDups(docs10, "doc_id", "text",
          threshold = 0.8)
        .agg(count(lit(1))).collect(): Unit
    }
    val tDedup10Gram = timeMedian {
      graft.operators.Dedup.dupNgramStats(docs10, "doc_id", "text", n = 3)
        .agg(count(lit(1)), sum(col("n_dup"))).collect(): Unit
    }
    // segment-level dedup on the same 10× fixture: every segment sits in a
    // 10-clique, the worst case for the first-occurrence aggregate
    val tDedup10Seg = timeMedian {
      graft.operators.Dedup.segmentDedup(docs10, "doc_id", "text",
          segmentWords = 8)
        .agg(count(lit(1)), sum(col("n_kept"))).collect(): Unit
    }
    // hashed-key variant: the agg/join exchanges key on xxhash64(segment)
    // (16-byte rows) instead of the raw segment string — the 100 TB form
    // the scaladoc documents, probed on the same fixture
    val tDedup10SegHashed = timeMedian {
      graft.operators.Dedup.segmentDedup(docs10, "doc_id", "text",
          segmentWords = 8, hashedKeys = true)
        .agg(count(lit(1)), sum(col("n_kept"))).collect(): Unit
    }
    // q35's MinHash pair mining on the 10× fixture — the scale trend for
    // the most expensive gated near-dup query (companion to x_unijoin60's
    // join trend): candidate density grows ∝ clique size², so this is the
    // adversarial-but-honest growth curve, not a regression alarm
    val tQ35at10x = timeMedian {
      graft.operators.Dedup.nearDupPairs(docs10, "doc_id", "text",
        threshold = 0.8).count(): Unit
    }
    // q20's star-join plan at 60 M fact rows (the li100 fixture): pruned
    // dims broadcast, fact scans once into partial agg — the scale trend
    // for the most expensive gated join query
    val tQ20at60m = {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val cust = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))
      timeMedian {
        liScattered
          .join(orders.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(rev.cast("decimal(18,4)")), count(lit(1)))
          .collect(): Unit
      }
    }
    // Poisson-bootstrap overhead: B = 50 replica sums in the same scan vs
    // the single scaled sum over the same systematic sample — the honest
    // price of a bootstrap CI in the one-pass formulation (should be a
    // small multiple, nowhere near 50×; the alternative B-resample design
    // would be)
    val liKeyB = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
    val tPlainSum = timeMedian {
      li.filter(pmod(liKeyB, lit(10L)) === 0)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).collect(): Unit
    }
    val tBootstrap = timeMedian {
      graft.exec.Bootstrap.bootstrapSumCi(li,
        col("l_extendedprice").cast("decimal(18,2)"), liKeyB, step = 10L,
        replicas = 50).collect(): Unit
    }
    val extra = Seq(
      "x_pipeline_sec" -> tPipeline) ++
      pipelineStages.map { case (name, t) => s"x_pipeline_${name}_sec" -> t } ++
      Seq(
      "x_pipeline_staged_total_sec" -> pipelineStages.map(_._2).sum,
      "x_dedup10x_docs" -> nDocs10.toDouble,
      "x_dedup10x_neardup_sec" -> tDedup10Near,
      "x_dedup10x_dupngram_sec" -> tDedup10Gram,
      "x_dedup10x_segdedup_sec" -> tDedup10Seg,
      "x_dedup10x_segdedup_hashed_sec" -> tDedup10SegHashed,
      "x_q35_10x_sec" -> tQ35at10x,
      "x_q20_60m_sec" -> tQ20at60m,
      "x_bootstrap_sec" -> tBootstrap,
      "x_bootstrap_vs_plain_sum" ->
        (if (tPlainSum > 0) tBootstrap / tPlainSum else -1.0),
      "x_cd_exact_sec" -> tCdExact,
      "x_cd_hll_sec" -> tCdApprox,
      "x_cd_rewrite_speedup" ->
        (if (tCdApprox > 0) tCdExact / tCdApprox else -1.0),
      "x_cd_rewrite_err_pct" -> cdErrPct,
      "x_cd_hicard_exact_sec" -> tCdHiExact,
      "x_cd_hicard_hll_sec" -> tCdHiApprox,
      "x_cd_hicard_speedup" ->
        (if (tCdHiApprox > 0) tCdHiExact / tCdHiApprox else -1.0),
      "x_skew_plain_sec" -> tSkewPlain,
      "x_skew_salted_sec" -> tSkewSalted,
      "x_skew_speedup" ->
        (if (tSkewSalted > 0) tSkewPlain / tSkewSalted else -1.0),
      "x_argmax_window_sec" -> tLatestWindow,
      "x_argmax_agg_sec" -> tLatestAgg,
      "x_argmax_join_sec" -> tLatestJoin,
      "x_argmax_speedup" ->
        (if (tLatestAgg > 0) tLatestWindow / tLatestAgg else -1.0),
      "x_argmax_join_speedup" ->
        (if (tLatestJoin > 0) tLatestWindow / tLatestJoin else -1.0),
      "x_embed_neardup_sec" -> tEmbedDedup,
      "x_ann_ivf_recall" -> ivfRecall,
      "x_ann_lsh_recall" -> lshRecall,
      "x_ann_ivf_sec" -> tIvfFloat,
      "x_ann_ivf_int8_sec" -> tIvfInt8,
      "x_ann_ivf_int8_recall" -> ivf8Recall,
      "x_ann_index_build_sec" -> tIndexBuild,
      "x_ann_index_search_sec" -> tIndexSearch,
      "x_ann_index_amortized_speedup" ->
        (if (tIndexSearch > 0) tIvfFloat / tIndexSearch else -1.0),
      "x_int8_leg_bytes_float" -> bytesFloatLeg,
      "x_int8_leg_bytes_coded" -> bytesCodedLeg,
      "x_int8_leg_shrink" ->
        (if (bytesCodedLeg > 0) bytesFloatLeg / bytesCodedLeg else -1.0),
      "x_priority_topk_sec" -> tPrioTopk,
      "x_priority_sort_sec" -> tPrioSort,
      "x_priority_speedup" ->
        (if (tPrioTopk > 0) tPrioSort / tPrioTopk else -1.0),
      "x_unijoin_exact_sec" -> tUniExact,
      "x_unijoin_sampled_sec" -> tUniSampled,
      "x_unijoin_speedup" ->
        (if (tUniSampled > 0) tUniExact / tUniSampled else -1.0),
      "x_unijoin_accuracy_pct" -> uniAccPct,
      "x_unijoin60_exact_sec" -> tUni60Exact,
      "x_unijoin60_sampled_sec" -> tUni60Sampled,
      "x_unijoin60_speedup" ->
        (if (tUni60Sampled > 0) tUni60Exact / tUni60Sampled else -1.0),
      "x_join_plain_sec" -> tJoinPlain,
      "x_join_bucketed_sec" -> tJoinBucketed,
      "x_bucketed_join_speedup" ->
        (if (tJoinBucketed > 0) tJoinPlain / tJoinBucketed else -1.0),
      "x10_rows" -> nRows.toDouble,
      "x10_exact_sum_sec" -> tExact,
      "x10_sys10_sum_sec" -> tSampled,
      "x10_filesample10_sum_sec" -> tFile,
      "x10_speedup_sys" -> (if (tSampled > 0) tExact / tSampled else -1.0),
      "x10_speedup_file" -> (if (tFile > 0) tExact / tFile else -1.0),
      "x10_sys10_accuracy_pct" -> accPct(sysEstV),
      "x10_file10_accuracy_pct" -> accPct(fileEstV),
      "x10_exact_mrows_per_sec" -> nRows / tExact / 1e6,
      "x_layout_scattered_sec" -> tScanScattered,
      "x_layout_clustered_sec" -> tScanClustered,
      "x_layout_speedup" ->
        (if (tScanClustered > 0) tScanScattered / tScanClustered else -1.0),
      "x_zorder_keyband_sec" -> tZorderKey,
      "x_linear_partband_sec" -> tLinearPart,
      "x_zorder_partband_sec" -> tZorderPart,
      "x_zorder_partband_speedup" ->
        (if (tZorderPart > 0) tLinearPart / tZorderPart else -1.0),
      "x_hivepart_scattered_sec" -> tMonthScattered,
      "x_hivepart_pruned_sec" -> tMonthPruned,
      "x_hivepart_speedup" ->
        (if (tMonthPruned > 0) tMonthScattered / tMonthPruned else -1.0),
      "x_loadavg_start" -> loadStart,
      "x_loadavg_end" -> loadavg(),
      "x_quiesce_wait_sec" -> quiesceWaitSec.toDouble,
      "x_unstable_reruns" -> unstableReruns.toDouble,
      "x_unstable_reruns_slow" -> unstableRerunsSlow.toDouble)
    // the artifact's own verdict on itself: start load never calmed below
    // the gate, or SLOW probes kept re-running — treat every RATIO inside
    // with suspicion and prefer the PLANS.md quiesced numbers. (loadavg at
    // END is always elevated: the bench's own local[32] work drives it.)
    val polluted = loadStart > 2.5 || unstableRerunsSlow > 3

    val qs = (results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" } ++
      extra.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" })
      .mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"headline_total","value":$total%.4f,"unit":"sec","polluted":$polluted,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    // Belt and braces for the driver's parser: the JSON goes to stdout as
    // its own (last) line AND to a file — sbt/log4j noise on stdout blinded
    // the round-1 perf gate ("parsed": null in BENCH_r01.json).
    spark.stop()
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
  }
}
