package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Raw-corpus ingestion — JSONL (plain or `.gz`/`.zst`, Spark's codec
  * detection is per-file by extension) with an EXPLICIT schema and
  * corrupt-record quarantine.
  *
  * Two non-negotiables at 100 TB, both encoded here:
  *
  *   1. Never infer the schema. Inference is a full extra pass over the
  *      data before the real one, and a heterogeneous corpus infers a
  *      different (wider) schema per run — downstream plans stop being
  *      stable. The caller states the contract; rows that break it are
  *      data, not exceptions.
  *   2. Never drop bad records silently (`DROPMALFORMED` loses data with
  *      no audit trail) and never fail the whole job on one bad line
  *      (`FAILFAST` at line 3 of file 80,000). PERMISSIVE mode + the
  *      corrupt-record column routes every unparseable line to a
  *      quarantine frame carrying the raw text + source file, so ingest
  *      is total: every input line lands in exactly one of the two
  *      outputs.
  *
  * Spark caveat baked in: a query that references ONLY the internal
  * corrupt-record column is rejected by the analyzer (the JSON reader
  * would otherwise skip parsing entirely), so the split materializes the
  * parsed frame once and filters twice — one scan, both outputs.
  */
object TextIngest {

  /** Parsed/quarantined pair. `good` has exactly `schema`'s columns;
    * `bad` is `(raw_line, source_file)`. Call [[Ingested.unpersist]] once
    * both sides are consumed — the split shares one persisted scan. */
  final case class Ingested(good: DataFrame, bad: DataFrame,
      private[sources] val raw: DataFrame) {
    /** Release the shared scan cache (no-op if already released). */
    def unpersist(): Unit = { raw.unpersist(blocking = false); () }
  }

  /** Read JSONL under `path` against the caller's `schema`; every line
    * parses into `good` or lands raw in `bad` — never both, never
    * neither. The one scan is persisted until both outputs are consumed;
    * release it with [[Ingested.unpersist]]. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): Ingested = {
    val corruptCol = "_graft_corrupt"
    val raw = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .withColumn("_graft_file", input_file_name())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val good = raw.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"), col("_graft_file").as("source_file"))
    Ingested(good, bad, raw)
  }

  /** CSV twin of [[jsonl]] — same totality contract (explicit schema,
    * PERMISSIVE + corrupt-record quarantine, one persisted scan feeding
    * both outputs). `header=false` by default: at corpus scale files are
    * produced by machines, and a header option that guesses per-file is
    * another silent-skew source; pass `header = true` only for
    * hand-curated drops. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, delimiter: String = ","): Ingested = {
    val corruptCol = "_graft_corrupt"
    val raw = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", header.toString)
      .option("sep", delimiter)
      .csv(path)
      .withColumn("_graft_file", input_file_name())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val good = raw.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"), col("_graft_file").as("source_file"))
    Ingested(good, bad, raw)
  }

  /** Ingest-quality gate: fail (throw) when the corrupt fraction exceeds
    * `maxBadFraction` — the circuit breaker between "a few mangled lines"
    * (quarantine and continue) and "the schema is wrong / the files are
    * garbage" (stop before wasting a cluster-day). Returns (nGood, nBad)
    * for the ingest report. */
  def requireQuality(ing: Ingested, maxBadFraction: Double): (Long, Long) = {
    val nGood = ing.good.count()
    val nBad = ing.bad.count()
    val total = nGood + nBad
    require(total == 0L || nBad.toDouble / total <= maxBadFraction,
      s"corrupt fraction ${nBad}/$total exceeds $maxBadFraction")
    (nGood, nBad)
  }
}
