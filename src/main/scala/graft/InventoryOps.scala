package graft

import org.apache.spark.sql.functions._

import graft.exec.HistQuantile
import graft.functions.CountMin
import graft.operators.{Cdc, Packing, Validation}
import graft.operators.Validation.Check

/** Pipeline-maintenance operators (round-2, third widening): the
  * "keep a 100 TB corpus healthy" passes — semi-structured extraction,
  * single-pass argmax compaction, mergeable frequency/quantile sketches,
  * a declarative data-quality gate, and snapshot diffing (CDC). Oracle
  * discipline as everywhere else: integer arithmetic or fixed-order IEEE
  * expressions only, every result fully ordered, identical aliases on
  * both engines.
  */
object InventoryOps {
  import graft.Tables._

  val all: Seq[QueryDef] = Seq(
    QueryDef("q96_json_extract",
      // schema-on-read over a JSON string column: `from_json` with an
      // EXPLICIT schema runs inside the scan stage (no inference pass over
      // 100 TB, no driver sampling) and yields null on missing/corrupt
      // fields — the count(k) vs count(*) gap is the malformed-rate audit.
      (s, d) => events(s, d)
        .select(col("event_type"),
          from_json(col("props"), "k BIGINT", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events) GROUP BY 1 ORDER BY 1""")),

    QueryDef("q97_best_event_per_user",
      // single-pass argmax: highest-value event per user via
      // max(struct(value, ts_us, event_id)) — partial aggregation ships one
      // candidate per (task, user) instead of window-sorting every event;
      // the unique event_id tail makes the winner a total-order pick, so a
      // rank-1 window SQL is an exact oracle (Packing.argmaxPerKey doc).
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("value"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        Packing.argmaxPerKey(ev, Seq("user_id"),
            Seq("value", "ts_us", "event_id"), Nil)
          .select(col("user_id"), col("value").as("best_value"),
            col("ts_us").as("best_ts_us"), col("event_id").as("best_event_id"))
          .orderBy(col("user_id"))
      },
      Some("""WITH r AS (SELECT user_id, value, epoch_us(ts) AS ts_us, event_id, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, epoch_us(ts) DESC, event_id DESC) AS rn FROM events) SELECT user_id, value AS best_value, ts_us AS best_ts_us, event_id AS best_event_id FROM r WHERE rn = 1 ORDER BY user_id""")),

    QueryDef("q98_cms_frequency",
      // Count-Min sketch point-frequency estimates for the probe suppkeys
      // (key mod 10 = 1). The sketch's integer field hashing is engine-
      // reproducible, so DuckDB rebuilds the identical 4×256 table and the
      // min-over-rows estimates hash-match exactly (CountMin scaladoc;
      // overestimate-only + merge-by-adding are spec'd in OpsSpec).
      (s, d) => {
        val li = lineitem(s, d)
        val sketch = CountMin.build(li, col("l_suppkey"), width = 256)
        val probes = li.filter(pmod(col("l_suppkey"), lit(10L)) === 1)
        CountMin.estimate(sketch, probes, col("l_suppkey"), width = 256)
          .orderBy(col("probe_key"))
      },
      Some("""WITH params AS (SELECT * FROM (VALUES (0, 1103515245, 12345), (1, 69069, 362437), (2, 214013, 2531011), (3, 134775813, 19)) AS t(i, a, b)), counts AS (SELECT i, ((l_suppkey % 2147483647) * a + b) % 2147483647 % 256 AS bucket, COUNT(*) AS cnt FROM lineitem CROSS JOIN params GROUP BY 1, 2), pb AS (SELECT DISTINCT l_suppkey AS probe_key FROM lineitem WHERE l_suppkey % 10 = 1), pbk AS (SELECT probe_key, i, ((probe_key % 2147483647) * a + b) % 2147483647 % 256 AS bucket FROM pb CROSS JOIN params) SELECT probe_key, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est FROM pbk LEFT JOIN counts USING (i, bucket) GROUP BY 1 ORDER BY 1""")),

    QueryDef("q99_validation_suite",
      // the data-quality admission gate: four declarative checks compiled
      // into ONE aggregation pass over orders (Validation scaladoc) plus a
      // key-only referential-integrity anti-join, unioned into one report.
      (s, d) => {
        val ord = orders(s, d)
        val single = Validation.validate(ord, Seq(
          Check.NotNull("o_totalprice"),
          Check.InRange("o_totalprice", 0.0, 1000000.0),
          Check.Unique(Seq("o_orderkey")),
          Check.Satisfies("status_known",
            col("o_orderstatus").isin("F", "O", "P"))))
        val ri = Validation.referentialIntegrity(
          lineitem(s, d), Seq("l_orderkey"), ord, Seq("o_orderkey"),
          "l_orderkey")
        single.unionAll(ri).orderBy(col("check"))
      },
      Some("""SELECT 'not_null(o_totalprice)' AS "check", CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations, COUNT(*) AS n_rows FROM orders UNION ALL SELECT 'in_range(o_totalprice)', CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0.0 OR o_totalprice > 1000000.0) THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM orders UNION ALL SELECT 'unique(o_orderkey)', CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) - COUNT(DISTINCT o_orderkey) AS BIGINT), COUNT(*) FROM orders UNION ALL SELECT 'satisfies(status_known)', CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END) AS BIGINT), COUNT(*) FROM orders UNION ALL SELECT 'foreign_key(l_orderkey)', CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT), (SELECT COUNT(*) FROM lineitem) ORDER BY 1""")),

    QueryDef("q100_hist_quantile",
      // mergeable equi-width histogram quantiles over l_extendedprice
      // (64 × $2000 bins): bin counts are exact integers that ADD across
      // partitions/days, and the in-bin interpolation is a fixed IEEE
      // expression — bit-identical in DuckDB (HistQuantile scaladoc;
      // merge ≡ direct is spec'd in OpsSpec).
      (s, d) => {
        val h = HistQuantile.histogram(lineitem(s, d),
          col("l_extendedprice"), lo = 0.0, width = 2000.0, nBins = 64)
        HistQuantile.quantiles(h, lo = 0.0, width = 2000.0,
          ps = Seq(0.25, 0.5, 0.75, 0.95))
      },
      Some("""WITH h AS (SELECT LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 2000.0) AS BIGINT), 0), 63) AS bin, COUNT(*) AS cnt FROM lineitem GROUP BY 1), c AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM h), c2 AS (SELECT bin, cnt, cum, cum - cnt AS cum_before FROM c), n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h), p AS (SELECT * FROM (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(p)) SELECT p, 0.0 + 2000.0 * CAST(bin AS DOUBLE) + 2000.0 * ((p * CAST(n AS DOUBLE) - CAST(cum_before AS DOUBLE)) / CAST(cnt AS DOUBLE)) AS est FROM p CROSS JOIN n JOIN c2 ON CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE) AND CAST(cum_before AS DOUBLE) < p * CAST(n AS DOUBLE) ORDER BY p""")),

    QueryDef("q101_snapshot_diff",
      // CDC between two synthetic snapshot versions of orders: keys
      // mod 97 = 3 exist only in the new version (added), mod 89 = 7 only
      // in the old (removed), mod 11 = 0 get a price bump (changed).
      // One full-outer key join classifies everything (Cdc scaladoc).
      (s, d) => {
        val ord = orders(s, d)
        val oldSnap = ord.filter(pmod(col("o_orderkey"), lit(97L)) =!= 3)
        val newSnap = ord.filter(pmod(col("o_orderkey"), lit(89L)) =!= 7)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(11L)) === 0,
              col("o_totalprice") + lit(1.0))
              .otherwise(col("o_totalprice")))
        Cdc.snapshotDiff(oldSnap, newSnap,
            Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
          .groupBy(col("change_type"))
          .agg(count(lit(1)).as("cnt"), min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy(col("change_type"))
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS st FROM orders WHERE o_orderkey % 97 <> 3), nw AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS p, o_orderstatus AS st FROM orders WHERE o_orderkey % 89 <> 7), d AS (SELECT COALESCE(o.k, nw.k) AS k, CASE WHEN o.k IS NULL THEN 'added' WHEN nw.k IS NULL THEN 'removed' WHEN (o.p IS DISTINCT FROM nw.p) OR (o.st IS DISTINCT FROM nw.st) THEN 'changed' ELSE 'unchanged' END AS change_type FROM o FULL OUTER JOIN nw ON o.k = nw.k) SELECT change_type, COUNT(*) AS cnt, MIN(k) AS min_key, MAX(k) AS max_key FROM d GROUP BY 1 ORDER BY 1"""),
      headline = true)
  )
}
