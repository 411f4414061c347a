package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.{BloomJoin, Decontam, Dedup, Mixing, Multimodal, Profiling, Sessionize, Skew, TextAnalysis}

/** Corpus-curation queries (round-2 widening): the remaining passes a
  * training-data pipeline runs that q30–q66 did not yet cover —
  * benchmark decontamination, TF-IDF vocabulary weighting, deterministic
  * dataset splits, drop-validation profiling, robust (winsorized) stats,
  * and int8 embedding compression. Oracle notes as in [[InventoryPipeline]]:
  * integer arithmetic wherever possible, left-fold vector math, decimal
  * casts before any cross-row double sum.
  */
object InventoryCuration {
  import graft.OracleSnippets._
  import graft.Tables._

  // DuckDB mirrors of TextAnalysis token/stopword/punct counts (q31 twins).
  private val dTok = "string_split_regex(text, ' +')"
  private val dStop2 =
    s"len(list_filter($dTok, t -> t IN ('the','a','an','and','or','of','to','in','is','it')))"
  private val dPunct2 =
    """length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))"""

  // DuckDB twin of Decontam.docNgrams (n=3): per-doc DISTINCT trigrams.
  private val dTrigrams =
    """SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS gram FROM (SELECT doc_id, string_split_regex(text, ' +') AS w FROM documents)"""

  val all: Seq[QueryDef] = Seq(
    QueryDef("q67_decontaminate",
      // test-set decontamination: docs with doc_id % 50 = 0 stand in for a
      // held-out benchmark; report every remaining (train) doc sharing a
      // trigram with it, with exact integer overlap counts. The eval
      // trigram set is broadcast — the train side never shuffles for the
      // probe (Decontam scaladoc).
      (s, d) => {
        val docs = documents(s, d)
        val eval = docs.filter(pmod(col("doc_id"), lit(50L)) === 0)
        val train = docs.filter(pmod(col("doc_id"), lit(50L)) =!= 0)
        Decontam.contamination(train, eval, "doc_id", "text", n = 3)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH g AS ($dTrigrams), ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), tr AS (SELECT * FROM g WHERE doc_id % 50 <> 0), tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY 1), ov AS (SELECT tr.doc_id, COUNT(*) AS n_overlap FROM tr JOIN ev USING (gram) GROUP BY 1) SELECT doc_id, n_overlap, n_grams FROM ov JOIN tot USING (doc_id) ORDER BY doc_id"""),
      headline = true),

    QueryDef("q68_tfidf_top_terms",
      // rarity-weighted TF (integer-division TF-IDF; TextAnalysis scaladoc
      // explains why `div` replaces log-IDF): top-3 terms per document
      (s, d) => TextAnalysis.tfidfTopTerms(documents(s, d), "doc_id", "text",
        k = 3).orderBy(col("doc_id"), col("rank")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS term FROM documents), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE length(term) > 0 GROUP BY 1, 2), df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), sc AS (SELECT doc_id, term, tf, df, CAST(tf * 1000000 AS BIGINT) // df AS score FROM tf JOIN df USING (term)) SELECT doc_id, term, tf, df, score, rank FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM sc) WHERE rank <= 3 ORDER BY doc_id, rank""")),

    QueryDef("q69_split_counts",
      // deterministic 80/10/10 train/val/test split — assignment is a pure
      // scan-stage CASE over the affine hash (stable under corpus growth);
      // rollup proves the same rows land in the same splits in any engine
      (s, d) => Mixing.splitAssign(documents(s, d), "doc_id",
          Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"), col("split")),
      Some(s"""SELECT source, ${Mixing.splitAssignSql("doc_id",
          Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))} AS split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q70_profile_lineitem",
      // drop-validation profile: per-column nulls / exact cardinality /
      // range in ONE scan (multi-COUNT(DISTINCT) via Spark's Expand
      // rewrite; the wide→long stack runs on the 1-row aggregate)
      (s, d) => Profiling.profileNumeric(lineitem(s, d),
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount"))
        .orderBy(col("col_name")),
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        cols.map(c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, COUNT(DISTINCT $c) AS n_distinct, CAST(MIN($c) AS DOUBLE) AS min_val, CAST(MAX($c) AS DOUBLE) AS max_val FROM lineitem""")
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
      }),

    QueryDef("q71_winsorized_avg",
      // robust mean: clamp to the exact per-group [p05, p95] band, then
      // average — outlier-resistant corpus statistics. The percentile table
      // is 3 rows → broadcast join back; clamped doubles go through one
      // DECIMAL(28,10) cast before summing (q66 precedent: that cast is
      // the one double→decimal conversion both engines round identically)
      (s, d) => {
        val li = lineitem(s, d)
        val pct = li.groupBy(col("l_returnflag")).agg(
          percentile(col("l_extendedprice"), lit(0.05)).as("p05"),
          percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
        li.join(broadcast(pct), "l_returnflag")
          .select(col("l_returnflag"),
            least(greatest(col("l_extendedprice"), col("p05")), col("p95"))
              .as("wv"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            (sum(col("wv").cast("decimal(28,10)")).cast("double") /
              count(lit(1))).as("wins_avg"))
          .orderBy(col("l_returnflag"))
      },
      // oracle detail: DuckDB's high-scale DECIMAL→DOUBLE cast double-rounds
      // (q65 scaladoc); routing through VARCHAR makes it one correctly-
      // rounded strtod, matching Java BigDecimal.doubleValue exactly
      Some("""WITH p AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.05) AS p05, quantile_cont(l_extendedprice, 0.95) AS p95 FROM lineitem GROUP BY 1) SELECT l_returnflag, COUNT(*) AS n, CAST(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, p05), p95) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS wins_avg FROM lineitem JOIN p USING (l_returnflag) GROUP BY 1 ORDER BY 1""")),

    QueryDef("q72_embed_quant",
      // int8 embedding compression audit: per-vector quantized checksum
      // (exact integer) + squared reconstruction error (left-fold double).
      // maxabs/scale project once per row (CollapseProject keeps the
      // multi-use alias real), then two array folds — pure scan work
      (s, d) => {
        val emb = embeddings(s, d)
        emb.select(col("vec_id"), col("embedding"),
            (VectorOps.maxAbs(col("embedding")) / lit(127.0)).as("scale"))
          .withColumn("q", VectorOps.int8Quantize(col("embedding"), col("scale")))
          .select(col("vec_id"),
            aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long"))
              .as("sum_q"),
            VectorOps.dequantSqError(col("embedding"), col("q"), col("scale"))
              .as("sq_err"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH s AS (SELECT vec_id, embedding, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [abs(CAST(x AS DOUBLE)) for x in embedding]), (a, v) -> greatest(a, v)) / 127.0 AS scale FROM embeddings), q AS (SELECT vec_id, embedding, scale, [CASE WHEN scale > 0 THEN CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INTEGER) ELSE 0 END for x in embedding] AS qv FROM s) SELECT vec_id, list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(x AS BIGINT) for x in qv]), (a, v) -> a + v) AS sum_q, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [(CAST(embedding[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE) * scale) * (CAST(embedding[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE) * scale) for i in range(1, len(embedding) + 1)]), (a, v) -> a + v) AS sq_err FROM q ORDER BY vec_id""")),

    QueryDef("q73_sessions_batch",
      // batch sessionization (the oracle-gated twin of the streaming
      // flatMapGroupsWithState sessionizer): 30-min gap sessions over one
      // keyed sort — lag-flag and running-sum windows share the same
      // Exchange+Sort (Sessionize scaladoc)
      (s, d) => {
        val ev = events(s, d)
          .filter(pmod(col("user_id"), lit(10L)) === 3)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"))
        Sessionize.sessions(ev, "user_id", "ts_us", "event_id",
            gapUs = 1800L * 1000000L)
          .select(col("user_id"), col("session"), col("n_events"),
            col("start").as("start_us"), col("end").as("end_us"),
            col("span").as("span_us"))
          .orderBy(col("user_id"), col("session"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE user_id % 10 = 3), f AS (SELECT user_id, event_id, ts_us, CASE WHEN LAG(ts_us) OVER w IS NULL OR ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nf FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), g AS (SELECT user_id, ts_us, CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session FROM f) SELECT user_id, session, COUNT(*) AS n_events, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us, MAX(ts_us) - MIN(ts_us) AS span_us FROM g GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q95_session_window_native",
      // Spark's BUILT-IN session_window aggregation, gated against the
      // same lag/gap-flag/running-sum SQL that oracles the hand-rolled
      // q73 sessionizer — proving the native operator and the custom
      // flatMapGroupsWithState path agree. Only semantic daylight is an
      // exact-gap tie (built-in closes at diff >= gap, q73 at >); the
      // fixtures contain none at any scale (checked 0.001/0.01/0.1).
      (s, d) => events(s, d)
        .filter(pmod(col("user_id"), lit(10L)) === 3)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us")),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE user_id % 10 = 3), f AS (SELECT user_id, ts_us, CASE WHEN LAG(ts_us) OVER w IS NULL OR ts_us - LAG(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS nf FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), g AS (SELECT user_id, ts_us, SUM(nf) OVER (PARTITION BY user_id ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session FROM f) SELECT user_id, MIN(ts_us) AS start_us, COUNT(*) AS n_events FROM g GROUP BY user_id, session ORDER BY user_id, start_us""")),

    QueryDef("q74_mad_outliers",
      // robust outlier detection: median + MAD (median absolute deviation),
      // flag |x − med| > 3·1.4826·MAD — the heavy-tail-safe alternative to
      // z-scores. 2.5 passes by construction (median → deviations → MAD);
      // each percentile table is 3 rows and broadcast back
      (s, d) => {
        val li = lineitem(s, d)
        val med = li.groupBy(col("l_returnflag"))
          .agg(percentile(col("l_extendedprice"), lit(0.5)).as("med"))
        val dev = li.join(broadcast(med), "l_returnflag")
          .withColumn("adev", abs(col("l_extendedprice") - col("med")))
        val mad = dev.groupBy(col("l_returnflag"))
          .agg(max(col("med")).as("med"),
            percentile(col("adev"), lit(0.5)).as("mad"))
        dev.drop("med").join(broadcast(mad), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
            count(lit(1)).as("n"),
            sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH med AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem GROUP BY 1), dev AS (SELECT lineitem.l_returnflag, l_extendedprice, med, abs(l_extendedprice - med) AS adev FROM lineitem JOIN med USING (l_returnflag)), mad AS (SELECT l_returnflag, MAX(med) AS med, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1) SELECT d.l_returnflag, MAX(m.med) AS med, MAX(m.mad) AS mad, COUNT(*) AS n, CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers FROM dev d JOIN mad m USING (l_returnflag) GROUP BY 1 ORDER BY 1""")),

    QueryDef("q75_zscore_outliers",
      // feature standardization audit: per-group μ/σ from EXACT integer-cent
      // moments (q65 technique — scale-0 decimals, one int→double cast),
      // then z-threshold counts with identical closed-form text both sides
      (s, d) => {
        val li = lineitem(s, d)
        val xc = (col("l_extendedprice").cast("decimal(18,2)") * lit(100))
          .cast("long")
        val mom = li.select(col("l_linestatus"), xc.as("xc"))
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("xc").cast("decimal(28,0)")).cast("double").as("sx"),
            sum((col("xc") * col("xc")).cast("decimal(38,0)")).cast("double")
              .as("sxx"))
          .select(col("l_linestatus"), col("n"),
            (col("sx") / col("n")).as("mu"),
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) / col("n"))
              .as("sigma"))
        li.select(col("l_linestatus"), xc.cast("double").as("xd"))
          .join(broadcast(mom), "l_linestatus")
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("xd") - col("mu") > lit(2.0) * col("sigma"), 1L)
              .otherwise(0L)).as("n_hi"),
            sum(when(col("mu") - col("xd") > lit(2.0) * col("sigma"), 1L)
              .otherwise(0L)).as("n_lo"))
          .orderBy(col("l_linestatus"))
      },
      Some("""WITH c AS (SELECT l_linestatus, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc FROM lineitem), m AS (SELECT l_linestatus, CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(CAST(xc AS DECIMAL(28,0))) AS DOUBLE) AS sx, CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) AS sxx FROM c GROUP BY 1), s AS (SELECT l_linestatus, n, sx / n AS mu, sqrt(n * sxx - sx * sx) / n AS sigma FROM m) SELECT c.l_linestatus, COUNT(*) AS n_rows, CAST(SUM(CASE WHEN CAST(xc AS DOUBLE) - mu > 2.0 * sigma THEN 1 ELSE 0 END) AS BIGINT) AS n_hi, CAST(SUM(CASE WHEN mu - CAST(xc AS DOUBLE) > 2.0 * sigma THEN 1 ELSE 0 END) AS BIGINT) AS n_lo FROM c JOIN s USING (l_linestatus) GROUP BY 1 ORDER BY 1""")),

    QueryDef("q76_incremental_dedup",
      // incremental corpus refresh: odd-id docs are the "new drop", even-id
      // docs the seen corpus; keep new docs whose normalized fingerprint is
      // absent from the seen set. Bloom-staged anti-join: a bloom MISS is
      // proof of absence (no join at all for the mostly-new bulk); only
      // maybe-rows shuffle into the exact anti-join (BloomJoin scaladoc)
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        val seen = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
          .select(col("fp").as("seen_fp"))
        val fresh = docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
        BloomJoin.bloomPrunedAntiJoin(fresh, seen, "fp", "seen_fp",
            expectedItems = 100000L, numBits = 1L << 20)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_new"),
            countDistinct(col("fp")).as("n_new_unique"))
          .orderBy(col("source"))
      },
      Some("""WITH f AS (SELECT doc_id, source, list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) for c in string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), '')]), (acc, x) -> (acc * 31 + x) % 1000000007) AS fp FROM documents) SELECT source, COUNT(*) AS n_new, COUNT(DISTINCT fp) AS n_new_unique FROM f WHERE doc_id % 2 = 1 AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 2 = 0) GROUP BY 1 ORDER BY 1"""),
      headline = true),

    QueryDef("q77_quality_bins",
      // curriculum binning WITHOUT a global sort: exact quality quartile
      // boundaries from one percentile pass (1-row table, broadcast), then
      // threshold-CASE binning in the scan stage — the scale-safe twin of
      // a global NTILE (which would single-partition the window)
      (s, d) => {
        val t = col("text")
        val q = documents(s, d).select(col("source"),
          TextAnalysis.qualityScore(t).as("q"),
          TextAnalysis.tokenCount(t).cast("long").as("nt"))
        val b = q.agg(percentile(col("q"), lit(0.25)).as("p25"),
          percentile(col("q"), lit(0.5)).as("p50"),
          percentile(col("q"), lit(0.75)).as("p75"))
        q.crossJoin(broadcast(b))
          .withColumn("bin",
            when(col("q") < col("p25"), 0).when(col("q") < col("p50"), 1)
              .when(col("q") < col("p75"), 2).otherwise(3))
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
          .orderBy(col("source"), col("bin"))
      },
      Some(s"""WITH t AS (SELECT source, (LEAST(1.0, CAST(len($dTok) AS DOUBLE) / 20.0) + LEAST(1.0, 5.0 * CAST($dStop2 AS DOUBLE) / GREATEST(CAST(len($dTok) AS DOUBLE), 1.0)) + (1.0 - LEAST(1.0, 4.0 * CAST($dPunct2 AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0)))) / 3.0 AS q, CAST(len($dTok) AS BIGINT) AS nt FROM documents), b AS (SELECT quantile_cont(q, 0.25) AS p25, quantile_cont(q, 0.5) AS p50, quantile_cont(q, 0.75) AS p75 FROM t) SELECT source, CASE WHEN q < p25 THEN 0 WHEN q < p50 THEN 1 WHEN q < p75 THEN 2 ELSE 3 END AS bin, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS sum_tokens FROM t, b GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q78_label_centroids",
      // per-label mean embeddings (class prototypes): ×dim scan-stage
      // fan-out absorbed map-side; the one shuffle carries label×dim
      // INTEGER partials, independent of corpus size. 1e-10 fixed-point
      // quantization before the sum — floor rounding, because the "obvious"
      // double→DECIMAL(p,10) cast rounds ties differently across engines
      // (Ann.groupCentroids scaladoc; found by this query's oracle)
      (s, d) => {
        import graft.operators.Ann
        Ann.groupCentroids(embeddings(s, d), "label", "embedding")
          .orderBy(col("label"), col("pos"))
      },
      Some("""WITH e AS (SELECT label, CAST(u['pos'] AS INTEGER) AS pos, CAST(u['x'] AS DOUBLE) AS x FROM (SELECT label, unnest([{'pos': i - 1, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS u FROM embeddings)), q AS (SELECT label, pos, CASE WHEN x >= 0 THEN floor(x * 1e10 + 0.5) ELSE -floor(-(x * 1e10) + 0.5) END AS xq FROM e) SELECT label, pos, COUNT(*) AS n, CAST(SUM(CAST(xq AS DECIMAL(38,0))) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e10) AS mean_val FROM q GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q79_hll_union_mergeable",
      // MERGEABLE distinct sketches — the capability that makes
      // pre-aggregated rollup tables work at 100 TB: per-type HLL sketches
      // union to the global estimate without rescanning. ORACLE-GATED on
      // the engine-checkable bound |est/exact − 1| ≤ 5% for every per-type
      // row AND the unioned __all__ row (the oracle emits the exact
      // distincts + TRUE; ExtensionSpec still asserts
      // union(parts) == sketch(whole) exactly).
      (s, d) => {
        val ev = events(s, d)
        val sk = ev.groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            countDistinct(col("user_id")).as("n_users_exact"))
        val per = sk.select(col("event_type"), col("n_users_exact"),
          (abs(hll_sketch_estimate(col("sk")).cast("double") /
            col("n_users_exact").cast("double") - lit(1.0)) <= lit(0.05))
            .as("within_bound"))
        val allExact = ev.agg(countDistinct(col("user_id")).as("n_users_exact"))
        val all = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
          .crossJoin(allExact) // 1-row × 1-row scalar join
          .select(lit("__all__").as("event_type"), col("n_users_exact"),
            (abs(col("__est").cast("double") /
              col("n_users_exact").cast("double") - lit(1.0)) <= lit(0.05))
              .as("within_bound"))
        per.unionByName(all).orderBy(col("event_type"))
      },
      Some("SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact, TRUE AS within_bound FROM events GROUP BY 1 UNION ALL SELECT '__all__' AS event_type, COUNT(DISTINCT user_id) AS n_users_exact, TRUE AS within_bound FROM events ORDER BY event_type")),

    QueryDef("q80_near_dedup_survivors",
      // the end-to-end near-dedup ACTION (q35/q45 produce the evidence,
      // this drops the losers): keep each cluster's min-id representative,
      // pass singletons through — MinHash-LSH pairs → label propagation →
      // AQE-sized anti-join (Dedup.dropNearDups scaladoc)
      (s, d) => graft.operators.Dedup.dropNearDups(documents(s, d),
          "doc_id", "text", threshold = 0.8, shingleN = 3, numHashes = 64,
          bands = 16)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $blockedJaccardCtes, pairs AS MATERIALIZED (SELECT id_a, id_b FROM pr WHERE $blockedJaccardExpr >= 0.8), edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs), reach(id, r) AS (SELECT src, src FROM edges UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) SELECT doc_id, source FROM documents WHERE doc_id NOT IN (SELECT id FROM (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id) WHERE cluster < id) ORDER BY doc_id""")),

    QueryDef("q81_multimodal_plans",
      // gates the resize + frame-sampling multimodal plans (q44 gates the
      // mapPartitions feature path): aspect-preserving target dims and
      // every-2s frame timestamps are pure column math over the
      // deterministic media metadata, so the whole transform chain is
      // integer-oracle-able end-to-end
      (s, d) => {
        val media = Multimodal.syntheticMedia(documents(s, d))
        val planned = Multimodal.frameSamplePlan(
          Multimodal.resizePlan(media, maxSide = 256), everyMs = 2000L)
        planned.groupBy(col("kind")).agg(
            count(lit(1)).as("n_items"),
            sum(col("target_width").cast("long")).as("sum_tw"),
            sum(col("target_height").cast("long")).as("sum_th"),
            sum(size(col("frame_ts_ms")).cast("long")).as("sum_frames"))
          .orderBy(col("kind"))
      },
      Some("""WITH m AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, CAST((doc_id % 4) * 160 + 320 AS INTEGER) AS width, CAST((doc_id % 4) * 90 + 180 AS INTEGER) AS height, n_chars * 10 AS duration_ms FROM documents), p AS (SELECT kind, CAST(floor(width * LEAST(1.0, 256.0 / CAST(GREATEST(width, height) AS DOUBLE))) AS BIGINT) AS tw, CAST(floor(height * LEAST(1.0, 256.0 / CAST(GREATEST(width, height) AS DOUBLE))) AS BIGINT) AS th, CASE WHEN kind = 'video' THEN duration_ms // 2000 + 1 ELSE 0 END AS nf FROM m) SELECT kind, COUNT(*) AS n_items, CAST(SUM(tw) AS BIGINT) AS sum_tw, CAST(SUM(th) AS BIGINT) AS sum_th, CAST(SUM(nf) AS BIGINT) AS sum_frames FROM p GROUP BY 1 ORDER BY 1""")),

    QueryDef("q82_rollup_corpus",
      // hierarchical rollup (source → source×lang → grand total) in ONE
      // aggregation pass — Spark's Expand feeds all grouping sets through
      // the same partial/final HashAggregate, so subtotals cost one scan,
      // not one scan per level (the reference has no grouping-sets surface
      // at all; SURVEY §2.3)
      (s, d) => documents(s, d)
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first),
      Some("""SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY ROLLUP (source, lang) ORDER BY source NULLS FIRST, lang NULLS FIRST""")),

    QueryDef("q83_pivot_lang_tokens",
      // wide-format corpus matrix: token totals per source × language via
      // pivot with an EXPLICIT value list (never pivot on discovered values
      // at scale — that is an extra distinct pass and a nondeterministic
      // column order); unmatched cells are 0-filled for cross-engine
      // stability
      (s, d) => {
        val langs = Seq("en", "es", "de", "fr", "zh")
        val toks = documents(s, d).select(col("source"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        val wide = toks.groupBy(col("source")).pivot("lang", langs)
          .agg(sum(col("nt")))
        langs.foldLeft(wide)((df, l) =>
            df.withColumn(l, coalesce(col(l), lit(0L))))
          .orderBy(col("source"))
      },
      Some(s"""SELECT source, ${Seq("en", "es", "de", "fr", "zh").map(l =>
        s"CAST(COALESCE(SUM(CASE WHEN lang = '$l' THEN len($dTok) END), 0) AS BIGINT) AS $l")
        .mkString(", ")} FROM documents GROUP BY source ORDER BY source""")),

    QueryDef("q84_source_topn",
      // per-source document cap (the RefinedWeb / C4 "top-N docs per
      // domain" pass) via the skew-safe two-phase top-N: a plain window
      // funnels a hot domain's every row through one task; Skew.topNPerKey
      // spreads phase 1 over content-hash shards and ranks only the
      // ≤ shards·n survivors. Ordering ends in doc_id ⇒ total order ⇒
      // row-identical to the single-window form (SkewSpec).
      (s, d) => graft.QueryOps.orderedSmall(
        Skew.topNPerKey(documents(s, d), Seq("source"),
          Seq(col("n_chars").desc, col("doc_id").asc), n = 3)
        .select(col("source"), col("rank"), col("doc_id"), col("n_chars")),
        col("source"), col("rank")),
      Some("""SELECT source, rank, doc_id, n_chars FROM (SELECT source, doc_id, n_chars, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank FROM documents) WHERE rank <= 3 ORDER BY source, rank"""),
      headline = true),

    QueryDef("q85_dup_ngram_stats",
      // duplicated-span signal (exact-substring dedup, distributed): per
      // doc, how many of its distinct trigrams appear in ≥1 other doc —
      // exact integers end to end (Dedup.dupNgramStats scaladoc for the
      // shuffle shape; suffix arrays don't shard, gram-frequency joins do)
      (s, d) => Dedup.dupNgramStats(documents(s, d), "doc_id", "text", n = 3)
        .orderBy(col("doc_id")),
      Some(s"""WITH g AS ($dTrigrams), c AS (SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY 1) SELECT doc_id, COUNT(*) AS n_grams, CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup FROM g JOIN c USING (gram) GROUP BY 1 ORDER BY doc_id"""),
      headline = true),

    QueryDef("q87_moment_rollup",
      // mergeable moment sketches: fine (source × lang) partials merged to
      // per-source stats WITHOUT rescanning rows — the rollup-maintenance
      // pattern (HLL/bloom siblings q79/q76) for exact mean/variance; the
      // oracle computes per-source directly from rows, so a hash match
      // proves merge-of-partials ≡ direct against an independent engine
      (s, d) => {
        val fine = graft.exec.Estimators.momentSketch(documents(s, d),
          col("n_chars"), Seq("source", "lang"))
        val merged = graft.exec.Estimators.mergeMoments(fine, Seq("source"))
        graft.exec.Estimators.momentStats(merged).orderBy(col("source"))
      },
      Some("""WITH g AS (SELECT source, COUNT(*) AS n, SUM(CAST(n_chars AS DECIMAL(18,0))) AS s1, SUM(CAST(n_chars AS DECIMAL(18,0)) * CAST(n_chars AS DECIMAL(18,0))) AS s2 FROM documents GROUP BY 1) SELECT source, CAST(n AS BIGINT) AS n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, CASE WHEN n > 1 THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0) ELSE 0.0 END AS var_samp FROM g ORDER BY source""")),

    QueryDef("q92_group_examples",
      // deterministic grouped collect — the "k example rows per label"
      // export every dataset card needs. collect_list is partition-order
      // nondeterministic, which is why no other gated query uses it; the
      // reproducible pattern is collect → sort_array → slice → serialize,
      // making the result a pure function of the group's SET. Shuffle
      // carries the full id list per group — bounded here; at corpus scale
      // cap the fan-in first with Skew.topNPerKey (q84) and collect the
      // ≤ n survivors instead.
      (s, d) => documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",", slice(sort_array(collect_list(col("doc_id"))), 1, 3))
            .as("example_ids"))
        .orderBy(col("source")),
      Some("""SELECT source, COUNT(*) AS n_docs, array_to_string(list_sort(list(doc_id))[1:3], ',') AS example_ids FROM documents GROUP BY source ORDER BY source""")),

    QueryDef("q88_temperature_mix",
      // α = 0.5 temperature rebalance (multilingual-LM recipe): draw
      // ⌊3·√n_g⌋ docs per source by smallest hash priority — exact integer
      // semantics, sqrt not pow (IEEE correctly-rounded in both engines);
      // rollup proves the same rows are drawn everywhere
      (s, d) => Mixing.temperatureMix(documents(s, d), "doc_id", "source",
          alpha = 0.5, scale = 3.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source")),
      Some(s"""WITH sz AS (SELECT source, COUNT(*) AS gn FROM documents GROUP BY 1), t AS (SELECT source, GREATEST(1, CAST(FLOOR(3.0 * sqrt(CAST(gn AS DOUBLE))) AS BIGINT)) AS tg FROM sz), r AS (SELECT d.source, d.n_chars, tg, ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY ${Mixing.hashPrioritySql("doc_id")}, doc_id) AS rn FROM documents d JOIN t USING (source)) SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM r WHERE rn <= tg GROUP BY 1 ORDER BY 1"""))
  )
}
