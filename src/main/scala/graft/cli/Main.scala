package graft.cli

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.parser.QueryParser
import graft.exec.{ApproxPlanner, SpecExecutor}

/** Command-line front end — the Spark twin of the reference's CLIs
  * (enhanced_aqe_cli.py:388-433 flags; simple_cli/cli.py positional form).
  *
  * Usage:
  *   graft.cli.Main "SELECT SUM(l_extendedprice) FROM lineitem" \
  *     [--data DIR] [--sample PCT] [--error PCT] [--ci] [--confidence C]
  *     [--method random|clt|block|adaptive|parallel|revolutionary|systematic|file|priority]
  *     [--seed N] [--compat] [--compare] [--count-exact-compat]
  *     [--approx-mode] [--sql] [--explain]
  *
  * `--compat` reproduces the reference's fixed policy tables
  * (error→fraction, size router — ApproxPlanner scaladoc); without it,
  * `--error` runs the adaptive CLT loop.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val sql = args(0)
    val opts = parseFlags(args.drop(1).toList, Map.empty)
    val dataDir = opts.getOrElse("data", "/root/testdata/sf0.001")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --approx-mode: session-wide sketch substitution (the optimizer
    // rewrites exact COUNT(DISTINCT)/percentile to HLL / quantile
    // summaries — ApproxAggregateRewrite scaladoc); an explicit opt-in,
    // like the reference's --use-sampling but at plan level
    if (opts.contains("approx-mode")) {
      spark.conf.set("spark.graft.approx.countDistinct.enabled", "true")
      spark.conf.set("spark.graft.approx.percentile.enabled", "true")
    }
    Tables.registerAll(spark, dataDir)

    // --sql: full-Spark-SQL passthrough (anything Catalyst parses —
    // joins, windows, COUNT(DISTINCT), ...) instead of the reference's
    // one-aggregate dialect; composes with --approx-mode's plan rewrites
    if (opts.contains("sql")) {
      val df = spark.sql(sql)
      if (opts.contains("explain")) df.explain("formatted")
      val t0 = System.nanoTime()
      df.show(100, truncate = false)
      println(f"elapsed: ${(System.nanoTime() - t0) / 1000000}ms")
      spark.stop()
      return
    }

    val spec0 = QueryParser.parse(sql,
      samplePercent = opts.get("sample").map(_.toDouble),
      errorThresholdPct = opts.get("error").map(_.toDouble),
      withCi = opts.contains("ci"),
      confidence = opts.get("confidence").map(_.toDouble).getOrElse(0.95))
    val spec1 = spec0.copy(countExactCompat = opts.contains("count-exact-compat"))
    // --method/--seed/--compat policy layer (reference-compat planner); the
    // 'revolutionary' size router needs the table's record count — one cheap
    // count only when that method is requested
    val needCount = opts.get("method")
      .exists(m => m.equalsIgnoreCase("revolutionary") || m.equalsIgnoreCase("priority"))
    val totalRecords =
      if (needCount) Some(spark.table(spec1.table).count()) else None
    val spec = ApproxPlanner.plan(spec1, opts.get("method"),
      compat = opts.contains("compat"), seed = opts.get("seed").map(_.toLong),
      totalRecords = totalRecords)

    val t0 = System.nanoTime()
    val result = SpecExecutor.run(spark, spec)
    if (opts.contains("explain")) result.explain("formatted")
    result.show(100, truncate = false)
    val approxMs = (System.nanoTime() - t0) / 1000000

    if (opts.contains("compare")) {
      val t1 = System.nanoTime()
      val exact = SpecExecutor.run(spark,
        spec.copy(sampling = graft.model.SamplingStrategy.Exact, withCi = false))
      exact.show(100, truncate = false)
      val exactMs = (System.nanoTime() - t1) / 1000000
      println(f"approx: ${approxMs}ms  exact: ${exactMs}ms  speedup: ${exactMs.toDouble / math.max(approxMs, 1)}%.2fx")
    }
    spark.stop()
  }

  @annotation.tailrec
  private def parseFlags(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case flag :: rest if flag.startsWith("--") =>
        val key = flag.drop(2)
        rest match {
          case v :: more if !v.startsWith("--") => parseFlags(more, acc + (key -> v))
          case _ => parseFlags(rest, acc + (key -> ""))
        }
      case other :: _ =>
        throw new IllegalArgumentException(s"unexpected argument: $other\n$usage")
    }

  private val usage =
    """usage: graft.cli.Main "<SELECT agg(col) FROM table [WHERE ..] [GROUP BY g]>"
      |  [--data DIR] [--sample PCT] [--error PCT] [--ci] [--confidence C]
      |  [--method random|clt|block|adaptive|parallel|revolutionary|systematic|file|priority]
      |  [--seed N] [--compat] [--compare] [--count-exact-compat] [--approx-mode] [--sql] [--explain]
      |APPROX(agg(col)) embedded syntax is also accepted.""".stripMargin
}
