package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Inventory

/** Optimization-round profiler (round 14): times inventory queries under
  * the EXACT bench session conf, splitting per-run cost into
  *   build  — `q.run(spark, dir)` (read relation resolution + plan build)
  *   exec   — `.collect()` of the built frame
  * and optionally writes `explain("formatted")` per query to
  * `plans/r14/<name>_<suffix>.txt` so plan claims are auditable offline.
  *
  * Usage: runMain graft.tools.ProfileQueries [--plans <dir> <suffix>]
  *          [--reps N] (headline | <queryName> ...)
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var rest = args.toList
    var plansDir: Option[(String, String)] = None
    var reps = 5
    while (rest.headOption.exists(_.startsWith("--"))) rest match {
      case "--plans" :: dir :: suffix :: t => plansDir = Some((dir, suffix)); rest = t
      case "--reps" :: n :: t => reps = n.toInt; rest = t
      case other => throw new IllegalArgumentException(other.take(1).mkString)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_bench_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names: Seq[String] = rest match {
      case "headline" :: Nil => Inventory.all.filter(_.headline).map(_.name)
      case Nil => Inventory.all.filter(_.headline).map(_.name)
      case ns => ns
    }
    // session warm-up (codegen compiler init, JIT) — mirrors Bench
    names.headOption.foreach { n =>
      (1 to 2).foreach(_ => Inventory.byName(n).run(spark, sfDir).collect())
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"${"query"}%-34s ${"build_ms"}%9s ${"exec_ms"}%9s ${"total_ms"}%9s")
    names.foreach { n =>
      val q = Inventory.byName(n)
      q.run(spark, sfDir).collect() // per-query warmup
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }
      val b = med(samples.map(_._1)); val e = med(samples.map(_._2))
      println(f"$n%-34s $b%9.1f $e%9.1f ${b + e}%9.1f")
      plansDir.foreach { case (dir, suffix) =>
        val sb = new StringBuilder
        sb.append(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"${n}_$suffix.txt"),
          sb.toString.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
