package graft

import org.apache.spark.sql.functions._

import graft.exec.{Estimators, HistQuantile}
import graft.functions.CountMin
import graft.operators.{Cdc, Dedup, Mixing, Packing, Profiling, Skew, TextAnalysis, Validation}
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
        graft.QueryOps.orderedSmall(
          Cdc.snapshotDiff(oldSnap, newSnap,
              Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
            .groupBy(col("change_type"))
            .agg(count(lit(1)).as("cnt"), min(col("o_orderkey")).as("min_key"),
              max(col("o_orderkey")).as("max_key")),
          col("change_type"))
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS st FROM orders WHERE o_orderkey % 97 <> 3), nw AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS p, o_orderstatus AS st FROM orders WHERE o_orderkey % 89 <> 7), d AS (SELECT COALESCE(o.k, nw.k) AS k, CASE WHEN o.k IS NULL THEN 'added' WHEN nw.k IS NULL THEN 'removed' WHEN (o.p IS DISTINCT FROM nw.p) OR (o.st IS DISTINCT FROM nw.st) THEN 'changed' ELSE 'unchanged' END AS change_type FROM o FULL OUTER JOIN nw ON o.k = nw.k) SELECT change_type, COUNT(*) AS cnt, MIN(k) AS min_key, MAX(k) AS max_key FROM d GROUP BY 1 ORDER BY 1"""),
      headline = true),

    QueryDef("q102_inverted_index",
      // posting-list construction: per-term document frequency + the first
      // 20 doc ids, serialized deterministically (q92's sort→slice→join
      // pattern). Scale shape: doc-frequency is a plain hash-groupBy;
      // postings are capped BEFORE any collect via Skew.topNPerKey (the
      // two-phase sharded window), so a stopword term never funnels its
      // full posting list through one task — the collect sees ≤ 20 rows
      // per term by construction.
      (s, d) => {
        val pairs = documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " +"))).as("term"))
          .filter(length(col("term")) > 0)
        val counts = pairs.groupBy(col("term"))
          .agg(count(lit(1)).as("doc_freq"))
          .filter(col("doc_freq") >= 50)
        val scoped = pairs.join(counts.select(col("term")), Seq("term"), "left_semi")
        val heads = Skew.topNPerKey(scoped, Seq("term"),
            Seq(col("doc_id").asc), n = 20)
          .groupBy(col("term"))
          .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
            .as("postings_head"))
        counts.join(heads, Seq("term")).orderBy(col("term"))
      },
      Some("""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split_regex(text, ' +'))) AS term FROM documents), t2 AS (SELECT doc_id, term FROM t WHERE length(term) > 0), k AS (SELECT term, COUNT(*) AS doc_freq FROM t2 GROUP BY 1 HAVING COUNT(*) >= 50), r AS (SELECT term, doc_id, ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM t2 WHERE term IN (SELECT term FROM k)), h AS (SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS postings_head FROM r WHERE rn <= 20 GROUP BY 1) SELECT term, doc_freq, postings_head FROM k JOIN h USING (term) ORDER BY term""")),

    QueryDef("q103_incremental_rollup",
      // incremental rollup maintenance: yesterday's per-source moment
      // sketch + the SIGNED delta from snapshotDiff (deltaRows: +new for
      // added/changed, −old for removed/changed) reproduces today's
      // rollup WITHOUT rescanning the snapshot — work ∝ change volume.
      // The oracle computes today's stats directly from rows, so a hash
      // match proves old ⊕ Δ ≡ rebuild, cross-engine and bit-exact
      // (the moment sketch is a group, not just a monoid — Estimators.
      // signedMomentSketch scaladoc).
      (s, d) => {
        val docs = documents(s, d)
        val oldSnap = docs.filter(pmod(col("doc_id"), lit(83L)) =!= 2)
        val newSnap = docs.filter(pmod(col("doc_id"), lit(79L)) =!= 5)
          .withColumn("n_chars",
            when(pmod(col("doc_id"), lit(13L)) === 0, col("n_chars") + lit(7L))
              .otherwise(col("n_chars")))
        val oldSketch = Estimators.momentSketch(oldSnap, col("n_chars"), Seq("source"))
        val diff = Cdc.snapshotDiff(oldSnap, newSnap,
          Seq("doc_id"), Seq("n_chars", "source"))
        val delta = Estimators.signedMomentSketch(
          Cdc.deltaRows(diff, Nil, Seq("n_chars", "source")),
          col("n_chars"), col("sign"), Seq("source"))
        val maintained = Estimators.mergeMoments(
          oldSketch.unionByName(delta), Seq("source"))
        Estimators.momentStats(maintained).orderBy(col("source"))
      },
      Some("""WITH nw AS (SELECT source, CASE WHEN doc_id % 13 = 0 THEN n_chars + 7 ELSE n_chars END AS v FROM documents WHERE doc_id % 79 <> 5), g AS (SELECT source, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,0))) AS s1, SUM(CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0))) AS s2 FROM nw GROUP BY 1) SELECT source, CAST(n AS BIGINT) AS n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, CASE WHEN n > 1 THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0) ELSE 0.0 END AS var_samp FROM g ORDER BY source""")),

    QueryDef("q104_skew_report",
      // shuffle-key skew diagnosis: per-key count quantiles + hot-key
      // share for a prospective join/groupBy key — the report that decides
      // plain shuffle vs AQE skew split vs explicit salting (Profiling.
      // keySkew scaladoc). percentile ≡ DuckDB quantile_cont bit-for-bit;
      // everything else is integer or one fixed double expression.
      (s, d) => Profiling.keySkew(lineitem(s, d), Seq("l_suppkey")),
      Some("""WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1) SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_cnt, quantile_cont(cnt, 0.5) AS p50_cnt, quantile_cont(cnt, 0.99) AS p99_cnt, CAST(MAX(cnt) AS DOUBLE) / (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS skew_ratio FROM c""")),

    QueryDef("q105_set_ops",
      // relational set algebra surface: INTERSECT / EXCEPT / UNION with
      // SET semantics. Spark compiles intersect → left-semi + distinct and
      // except → left-anti + distinct — both key-only shuffles with
      // partial-distinct map-side, never a full-row comparison pass.
      (s, d) => {
        val a = customer(s, d).select(col("c_custkey").as("k"))
        val b = orders(s, d).select(col("o_custkey").as("k"))
        val inter = a.intersect(b).agg(count(lit(1)).as("n"))
          .select(lit("intersect").as("set_op"), col("n"))
        val exc = a.except(b).agg(count(lit(1)).as("n"))
          .select(lit("except").as("set_op"), col("n"))
        val uni = a.union(b).distinct().agg(count(lit(1)).as("n"))
          .select(lit("union").as("set_op"), col("n"))
        exc.unionAll(inter).unionAll(uni).orderBy(col("set_op"))
      },
      Some("""SELECT 'except' AS set_op, COUNT(*) AS n FROM (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders) UNION ALL SELECT 'intersect', COUNT(*) FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) UNION ALL SELECT 'union', COUNT(*) FROM (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders) ORDER BY 1""")),

    QueryDef("q106_window_family",
      // the full ranking/navigation window surface in one keyed pass:
      // rank / dense_rank / row_number / percent_rank / cume_dist /
      // ntile / lag / lead share ONE Exchange + Sort on (custkey,
      // price desc, orderkey) — Spark fuses same-window functions into a
      // single Window operator. The unique orderkey tail totalizes the
      // order, so every output (incl. ntile edges) is engine-reproducible;
      // percent_rank/cume_dist are exact small-integer divisions.
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d).filter(pmod(col("o_custkey"), lit(100L)) === 7)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            row_number().over(w).cast("long").as("rn"),
            percent_rank().over(w).as("prnk"),
            cume_dist().over(w).as("cdist"),
            ntile(4).over(w).cast("long").as("quartile"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, ROW_NUMBER() OVER w AS rn, PERCENT_RANK() OVER w AS prnk, CUME_DIST() OVER w AS cdist, NTILE(4) OVER w AS quartile, LAG(o_totalprice, 1) OVER w AS prev_price, LEAD(o_totalprice, 1) OVER w AS next_price FROM orders WHERE o_custkey % 100 = 7 WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) ORDER BY o_custkey, rn""")),

    QueryDef("q107_cube_corpus",
      // full CUBE (source × lang, both marginals, grand total) in ONE
      // Expand-fed aggregation pass — the q82 rollup's 2^k sibling;
      // grouping() flags distinguish a real NULL dim from a rolled-up one
      (s, d) => documents(s, d)
        .cube(col("source"), col("lang"))
        .agg(grouping(col("source")).cast("long").as("gs"),
          grouping(col("lang")).cast("long").as("gl"),
          count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("gs"), col("gl"),
          col("source").asc_nulls_first, col("lang").asc_nulls_first),
      Some("""SELECT source, lang, CAST(GROUPING(source) AS BIGINT) AS gs, CAST(GROUPING(lang) AS BIGINT) AS gl, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY CUBE (source, lang) ORDER BY gs, gl, source NULLS FIRST, lang NULLS FIRST""")),

    QueryDef("q108_time_weighted_avg",
      // time-weighted average over an IRREGULAR series: each observation
      // holds until the next one, so its weight is the gap to its
      // successor (the last observation spans nothing and drops out).
      // One keyed window (lead) + one aggregation; value quantized to
      // exact cents and weighted in scale-0 decimals — no cross-row double
      // sum anywhere, so the doubles emerge bit-identical cross-engine.
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val ev = events(s, d)
          .filter(pmod(col("user_id"), lit(10L)) === 4)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"),
            (col("value").cast("decimal(18,2)") * 100)
              .cast("decimal(18,0)").as("cents"))
        ev.withColumn("dt_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
          .filter(col("dt_us").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_segments"),
            sum(col("dt_us")).as("span_us"),
            (sum(col("cents") * col("dt_us").cast("decimal(18,0)"))
              .cast("double") / sum(col("dt_us")).cast("double") / 100.0)
              .as("twa"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS cents FROM events WHERE user_id % 10 = 4), f AS (SELECT user_id, cents, LEAD(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS dt_us FROM e) SELECT user_id, COUNT(*) AS n_segments, CAST(SUM(dt_us) AS BIGINT) AS span_us, CAST(SUM(cents * CAST(dt_us AS DECIMAL(18,0))) AS DOUBLE) / CAST(SUM(dt_us) AS DOUBLE) / 100.0 AS twa FROM f WHERE dt_us IS NOT NULL GROUP BY 1 ORDER BY 1""")),

    QueryDef("q109_join_size_estimate",
      // pre-join shuffle sizing: the AMS inner-product estimate of
      // |lineitem ⋈ urgent-orders| from two Count-Min sketches, next to
      // the true size — the planner consults the ≤4×256-row sketches, not
      // the fact table. Estimate ≥ truth always (collisions inflate;
      // OpsSpec pins the bound); the oracle rebuilds both sketches in SQL,
      // so even the ESTIMATE hash-matches cross-engine.
      (s, d) => {
        val a = lineitem(s, d).select(col("l_orderkey").as("k"))
        val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("k"))
        val est = CountMin.joinSizeEstimate(
          CountMin.build(a, col("k"), width = 256),
          CountMin.build(b, col("k"), width = 256))
        val truth = a.join(b, Seq("k")).agg(count(lit(1)).as("join_size_true"))
        est.crossJoin(truth)
      },
      Some("""WITH params AS (SELECT * FROM (VALUES (0, 1103515245, 12345), (1, 69069, 362437), (2, 214013, 2531011), (3, 134775813, 19)) AS t(i, a, b)), ca AS (SELECT i, ((l_orderkey % 2147483647) * a + b) % 2147483647 % 256 AS bucket, COUNT(*) AS cnt FROM lineitem CROSS JOIN params GROUP BY 1, 2), cb AS (SELECT i, ((o_orderkey % 2147483647) * a + b) % 2147483647 % 256 AS bucket, COUNT(*) AS cnt FROM orders CROSS JOIN params WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2), ip AS (SELECT ca.i, SUM(ca.cnt * cb.cnt) AS p FROM ca JOIN cb ON ca.i = cb.i AND ca.bucket = cb.bucket GROUP BY 1), est AS (SELECT CAST(MIN(p) AS BIGINT) AS join_size_est FROM ip), tr AS (SELECT COUNT(*) AS join_size_true FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_orderpriority = '1-URGENT') SELECT join_size_est, join_size_true FROM est CROSS JOIN tr""")),

    QueryDef("q110_group_trend",
      // per-group OLS trend (is each event type's value drifting over
      // time?): five exact decimal moments in ONE pass, closed-form
      // slope/intercept in a fixed IEEE expression over them — the
      // momentStats discipline, so doubles match cross-engine
      // (Profiling.groupTrend scaladoc). x = epoch day, y = exact cents.
      (s, d) => {
        val ev = events(s, d).select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("x"),
          (col("value").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)").as("y"))
        Profiling.groupTrend(ev, Seq("event_type"), col("x"), col("y"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS x, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS y FROM events), m AS (SELECT event_type, COUNT(*) AS n, SUM(CAST(x AS DECIMAL(18,0))) AS sx, SUM(y) AS sy, SUM(CAST(x AS DECIMAL(18,0)) * y) AS sxy, SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx FROM e GROUP BY 1) SELECT event_type, n, CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) ELSE NULL END AS slope, CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) ELSE NULL END AS intercept FROM m ORDER BY 1""")),

    QueryDef("q111_snapshot_drift",
      // distribution-drift gate between the q101 snapshot pair: total
      // variation distance of the o_totalprice histograms, computed
      // ENTIRELY in integers (Σ|cnt_n·N_old − cnt_o·N_new|, one final
      // division) — TV instead of PSI/KL precisely because ln() bits are
      // not engine-portable (Profiling.histDrift scaladoc)
      (s, d) => {
        val ord = orders(s, d)
        val oldSnap = ord.filter(pmod(col("o_orderkey"), lit(97L)) =!= 3)
        val newSnap = ord.filter(pmod(col("o_orderkey"), lit(89L)) =!= 7)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(11L)) === 0,
              col("o_totalprice") + lit(1.0))
              .otherwise(col("o_totalprice")))
        Profiling.histDrift(oldSnap, newSnap, col("o_totalprice"),
          lo = 0.0, width = 8192.0, nBins = 64)
      },
      Some("""WITH o AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 97 <> 3), nw AS (SELECT CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS v FROM orders WHERE o_orderkey % 89 <> 7), ho AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - 0.0) / 8192.0) AS BIGINT), 0), 63) AS bin, COUNT(*) AS cnt_o FROM o GROUP BY 1), hn AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - 0.0) / 8192.0) AS BIGINT), 0), 63) AS bin, COUNT(*) AS cnt_n FROM nw GROUP BY 1), no AS (SELECT CAST(SUM(cnt_o) AS BIGINT) AS n_old FROM ho), nn AS (SELECT CAST(SUM(cnt_n) AS BIGINT) AS n_new FROM hn), j AS (SELECT COALESCE(cnt_o, 0) AS cnt_o, COALESCE(cnt_n, 0) AS cnt_n FROM ho FULL OUTER JOIN hn USING (bin)), ag AS (SELECT CAST(SUM(ABS(CAST(cnt_n AS DECIMAL(18,0)) * CAST((SELECT n_old FROM no) AS DECIMAL(18,0)) - CAST(cnt_o AS DECIMAL(18,0)) * CAST((SELECT n_new FROM nn) AS DECIMAL(18,0)))) AS DECIMAL(38,0)) AS num FROM j) SELECT (SELECT n_old FROM no) AS n_old, (SELECT n_new FROM nn) AS n_new, CAST(num AS DOUBLE) / (2.0 * CAST((SELECT n_old FROM no) AS DOUBLE) * CAST((SELECT n_new FROM nn) AS DOUBLE)) AS tv_distance FROM ag""")),

    QueryDef("q112_dense_ids",
      // distributed zipWithIndex: contiguous 0-based ids in doc_id order
      // WITHOUT the single-task global row_number window — range-partition,
      // per-partition counts → driver prefix sums (P numbers), rank within
      // partitions + broadcast offsets (Mixing.denseIds scaladoc). The
      // oracle is the very global ROW_NUMBER the implementation refuses to
      // run at scale — a hash match proves the two are row-identical.
      (s, d) => Mixing.denseIds(
          documents(s, d).select(col("doc_id"), col("source")),
          col("doc_id"), partitions = 8)
        .select(col("rid"), col("doc_id"), col("source"))
        .orderBy(col("rid")),
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rid, doc_id, source FROM documents ORDER BY rid""")),

    QueryDef("q113_fuzzy_pairs",
      // entity resolution: part names within edit distance 2, via trigram
      // blocking (bucketed self-join on shared character 3-grams — never a
      // cross product) + levenshtein verify on candidates only. The
      // blocking condition is part of the operator definition, so DuckDB
      // computes the identical pair set (Dedup.editDistancePairs scaladoc).
      // (rolled up per distance — the raw pair list is quadratic in the
      // fixture's tiny name vocabulary; the rollup still hashes every pair
      // through count/min/max while keeping the gated result 3 rows)
      (s, d) => Dedup.editDistancePairs(part(s, d), "p_partkey", "p_name",
          maxDist = 2)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("id_a")).as("min_id_a"), max(col("id_b")).as("max_id_b"))
        .orderBy(col("dist")),
      Some("""WITH s AS (SELECT p_partkey AS id, p_name AS str FROM part), g AS (SELECT DISTINCT id, unnest([substring(str, i, 3) for i in range(1, greatest(length(str) - 2, 1) + 1)]) AS gr FROM s), c AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM g a JOIN g b ON a.gr = b.gr AND a.id < b.id), v AS (SELECT id_a, id_b, CAST(levenshtein(sa.str, sb.str) AS BIGINT) AS dist FROM c JOIN s sa ON sa.id = c.id_a JOIN s sb ON sb.id = c.id_b WHERE abs(length(sa.str) - length(sb.str)) <= 2) SELECT dist, COUNT(*) AS n_pairs, MIN(id_a) AS min_id_a, MAX(id_b) AS max_id_b FROM v WHERE dist <= 2 GROUP BY 1 ORDER BY 1""")),

    QueryDef("q114_bm25_search",
      // ranked retrieval: BM25 top-20 for a fixed term bag, with the
      // RATIONAL idf (the log's argument, not the log — the same
      // ln()-portability rule as q68/q111; TextAnalysis.bm25Search scaladoc
      // for the per-term conditional-sum float discipline). The isin()
      // filter runs scan-stage, so only queried-term postings shuffle.
      (s, d) => TextAnalysis.bm25Search(documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "scan", "vector"), topK = 20),
      Some("""WITH d AS (SELECT doc_id, [t for t in string_split_regex(lower(text), ' +') if length(t) > 0] AS toks FROM documents), b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d), g AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM b), tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM b), tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok WHERE term IN ('join', 'scan', 'vector') GROUP BY 1, 2, 3), dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), sc AS (SELECT doc_id, dl, term, ((CAST((SELECT n FROM g) - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST((SELECT sumdl FROM g) AS DOUBLE) / CAST((SELECT n FROM g) AS DOUBLE)))))) AS s FROM tf JOIN dfq USING (term)), p AS (SELECT doc_id, dl, SUM(CASE WHEN term = 'join' THEN s ELSE 0.0 END) AS s0, SUM(CASE WHEN term = 'scan' THEN s ELSE 0.0 END) AS s1, SUM(CASE WHEN term = 'vector' THEN s ELSE 0.0 END) AS s2 FROM sc GROUP BY 1, 2) SELECT doc_id, dl, s0 + s1 + s2 AS score FROM p ORDER BY score DESC, doc_id LIMIT 20""")),

    QueryDef("q115_scd2_intervals",
      // type-2 SCD build from the event log: collapse per-user runs of the
      // same event_type, emit effective intervals in exact epoch MICROS
      // (integer end to end — the q93/q94 float-epoch trap never opens;
      // Cdc.scd2 scaladoc for the one-exchange window shape). The oracle
      // is the same collapse written as LAG/LEAD CTEs.
      (s, d) => Cdc.scd2(events(s, d), Seq("user_id"), col("event_type"),
          expr("unix_micros(ts)"), col("event_id"))
        .select(col("user_id"), col("version"),
          col("attr").as("event_type"), col("valid_from_us"),
          col("valid_to_us"), col("is_current"))
        .orderBy(col("user_id"), col("version")),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events), o AS (SELECT user_id, event_type, ts_us, event_id, LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e), c AS (SELECT user_id, event_type, ts_us, event_id FROM o WHERE prev IS DISTINCT FROM event_type), v AS (SELECT user_id, event_type, ts_us AS valid_from_us, LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS version FROM c) SELECT user_id, version, event_type, valid_from_us, valid_to_us, valid_to_us IS NULL AS is_current FROM v ORDER BY user_id, version""")),

    QueryDef("q116_winsorized_stats",
      // outlier-robust location per group: winsorized + trimmed means at
      // the [p05, p95] clip. Interior sum rides the exact DECIMAL twin
      // (order-independent); each tail contributes count×bound — ONE
      // multiply, never a float sum over rows
      // (Profiling.winsorizedStats scaladoc).
      (s, d) => Profiling.winsorizedStats(lineitem(s, d),
          Seq("l_returnflag"), col("l_extendedprice"),
          col("l_extendedprice").cast("decimal(18,2)"), 0.05, 0.95)
        .orderBy(col("l_returnflag")),
      Some("""WITH b AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.05) AS lo, quantile_cont(l_extendedprice, 0.95) AS hi FROM lineitem GROUP BY 1), j AS (SELECT l.l_returnflag, l.l_extendedprice AS v, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS vd, b.lo, b.hi FROM lineitem l JOIN b USING (l_returnflag)), a AS (SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo, CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi, MIN(lo) AS lo2, MIN(hi) AS hi2, SUM(CASE WHEN v >= lo AND v <= hi THEN vd END) AS sum_in, COUNT(CASE WHEN v >= lo AND v <= hi THEN 1 END) AS n_in FROM j GROUP BY 1) SELECT l_returnflag, n, n_lo, n_hi, lo2 AS lo, hi2 AS hi, CAST(n_in AS BIGINT) AS n_in, (CAST(sum_in AS DOUBLE) + CAST(n_lo AS DOUBLE) * lo2 + CAST(n_hi AS DOUBLE) * hi2) / CAST(n AS DOUBLE) AS winsorized_mean, CAST(sum_in AS DOUBLE) / CAST(n_in AS DOUBLE) AS trimmed_mean FROM a ORDER BY l_returnflag""")),

    QueryDef("q117_collocations",
      // corpus phrase discovery: adjacent-bigram lift (the log-free core
      // of PMI — ln is monotone, so the ranking is PMI's, and the rational
      // form is bit-portable; TextAnalysis.collocations scaladoc). Bigrams
      // are a per-row zip_with of two slices — no shuffle until the
      // vocabulary-sized count aggregations.
      (s, d) => TextAnalysis.collocations(documents(s, d), "text",
        minCount = 5L, topK = 50),
      Some("""WITH d AS (SELECT [t for t in string_split_regex(lower(text), ' +') if length(t) > 0] AS toks FROM documents), ux AS (SELECT w, COUNT(*) AS n FROM (SELECT unnest(toks) AS w FROM d) GROUP BY 1), nt AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tok FROM ux), bg AS (SELECT u['w1'] AS w1, u['w2'] AS w2 FROM (SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]} for i in range(1, len(toks))]) AS u FROM d WHERE len(toks) >= 2)), nb AS (SELECT COUNT(*) AS n_bi FROM bg), bx AS (SELECT w1, w2, COUNT(*) AS n_xy FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5), j AS (SELECT bx.w1, bx.w2, bx.n_xy, x1.n AS n_x, x2.n AS n_y FROM bx JOIN ux x1 ON bx.w1 = x1.w JOIN ux x2 ON bx.w2 = x2.w) SELECT w1, w2, n_xy, n_x, n_y, ((CAST(n_xy AS DOUBLE) * CAST((SELECT n_tok FROM nt) AS DOUBLE)) * CAST((SELECT n_tok FROM nt) AS DOUBLE)) / ((CAST((SELECT n_bi FROM nb) AS DOUBLE) * CAST(n_x AS DOUBLE)) * CAST(n_y AS DOUBLE)) AS lift FROM j ORDER BY lift DESC, w1, w2 LIMIT 50"""))
  )
}
