package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Funnel, Profiling, Skew, TextAnalysis}

/** Round-3 widening: corpus governance (PII scrubbing, repetition-quality
  * filters, per-source distribution drift), skew-mitigated joins, and
  * ordered-funnel analytics. Oracle discipline as everywhere else:
  * integer/decimal-exact arithmetic with one final double cast, identical
  * regex dialect subset (Java ∩ RE2), every result fully ordered,
  * identical aliases both engines.
  */
object InventoryGovernance {
  import graft.Tables._

  val all: Seq[QueryDef] = Seq(

    QueryDef("q118_pii_redaction",
      // privacy scrub audit: the fixture text carries no PII, so both
      // engines append the SAME deterministic synthetic PII (email /
      // dotted-quad / digit-run keyed on doc_id mod 4) and then redact.
      // Patterns are restricted to the Java-regex ∩ RE2 dialect
      // (TextAnalysis scaladoc); application order is part of the
      // contract. Pure per-row projection — one scan at any scale.
      (s, d) => {
        val pii = when(pmod(col("doc_id"), lit(4L)) === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now")))
          .when(pmod(col("doc_id"), lit(4L)) === 1,
            concat(lit(" from 10.0."),
              pmod(col("doc_id"), lit(256L)).cast("string"), lit(".1")))
          .when(pmod(col("doc_id"), lit(4L)) === 2,
            concat(lit(" id 1234567"), col("doc_id").cast("string")))
          .otherwise(lit(""))
        val enriched = documents(s, d)
          .select(col("doc_id"), concat(col("text"), pii).as("text2"))
        TextAnalysis.redactPii(enriched, "text2")
          .select(col("doc_id"), col("n_email"), col("n_ipv4"),
            col("n_digit_run"), col("redacted"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH e AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' WHEN doc_id % 4 = 1 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' WHEN doc_id % 4 = 2 THEN ' id 1234567' || CAST(doc_id AS VARCHAR) ELSE '' END AS t FROM documents), r1 AS (SELECT doc_id, t, regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM e), r2 AS (SELECT doc_id, t, t1, regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2 FROM r1) SELECT doc_id, CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4, CAST(len(regexp_extract_all(t2, '\d{6,}')) AS BIGINT) AS n_digit_run, regexp_replace(t2, '\d{6,}', '<NUM>', 'g') AS redacted FROM r2 ORDER BY doc_id""")),

    QueryDef("q119_repetition_stats",
      // Gopher/C4 repetition filters: top-token share + duplicate-bigram
      // share per document (TextAnalysis.repetitionStats scaladoc for the
      // shuffle story). Fractions are one double division over exact
      // integer counts — bit-portable.
      (s, d) => TextAnalysis.repetitionStats(documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, [t for t in string_split_regex(lower(text), ' +') if length(t) > 0] AS toks FROM documents), u AS (SELECT doc_id, t, COUNT(*) AS n FROM (SELECT doc_id, unnest(toks) AS t FROM d) GROUP BY 1, 2), agg AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, COUNT(*) AS n_unique, CAST(MAX(n) AS BIGINT) AS top_n FROM u GROUP BY 1), bg AS (SELECT doc_id, CAST(len(bgs) AS BIGINT) AS n_bigrams, CAST(len(list_distinct(bgs)) AS BIGINT) AS n_unique_bigrams FROM (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] ELSE [] END AS bgs FROM d)) SELECT agg.doc_id, n_tokens, n_unique, top_n, CAST(top_n AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac, n_bigrams, n_bigrams - n_unique_bigrams AS n_dup_bigrams, CASE WHEN n_bigrams > 0 THEN CAST(n_bigrams - n_unique_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) ELSE 0.0 END AS dup_bigram_frac FROM agg JOIN bg ON agg.doc_id = bg.doc_id ORDER BY agg.doc_id""")),

    QueryDef("q120_source_token_drift",
      // per-source total-variation distance from the corpus token
      // distribution — integer-exact numerators (the full-vocabulary sum
      // reduces to source-present terms; TextAnalysis.sourceTokenDrift
      // scaladoc), one double division at the end. DuckDB side rides
      // HUGEINT for the same exact products.
      (s, d) => TextAnalysis.sourceTokenDrift(documents(s, d), "source", "text")
        .orderBy(col("source")),
      Some("""WITH d AS (SELECT source, unnest([t for t in string_split_regex(lower(text), ' +') if length(t) > 0]) AS t FROM documents), st AS (SELECT source, t, COUNT(*) AS n_st FROM d GROUP BY 1, 2), tt AS (SELECT t, COUNT(*) AS n_t FROM d GROUP BY 1), tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n FROM tt), s AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM st GROUP BY 1), j AS (SELECT st.source, s.n_s, SUM(ABS(CAST(st.n_st AS HUGEINT) * (SELECT n FROM tot) - CAST(tt.n_t AS HUGEINT) * s.n_s) - CAST(tt.n_t AS HUGEINT) * s.n_s) AS s_num FROM st JOIN tt USING (t) JOIN s ON st.source = s.source GROUP BY 1, 2) SELECT source, n_s, 0.5 * (1.0 + CAST(s_num AS DOUBLE) / (CAST(n_s AS DOUBLE) * CAST((SELECT n FROM tot) AS DOUBLE))) AS tv_distance FROM j ORDER BY source""")),

    QueryDef("q121_salted_join_revenue",
      // skew-mitigated equi-join: fact side scattered over 8 content-hash
      // sub-keys, build side replicated 8x — row-identical to the plain
      // join (the oracle IS the plain join), used when one hot key would
      // otherwise pin a single reducer at 100 TB. Revenue via the exact
      // DECIMAL(18,2) sum, one final double cast (q65 rule).
      (s, d) => {
        val fact = lineitem(s, d).select(col("l_suppkey"), col("l_extendedprice"))
        val build = supplier(s, d)
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        Skew.saltedJoin(fact, build, "l_suppkey", salts = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              .as("revenue"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n_items, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1 ORDER BY 1""")),

    QueryDef("q122_funnel_stages",
      // strict-order funnel view → click → purchase: chained first-
      // occurrence mins as stacked unbounded windows over ONE user-key
      // exchange (Funnel scaladoc — never N self-joins). Counts are
      // "reached at least stage i".
      (s, d) => Funnel.stageCounts(events(s, d), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events), w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tsu END) OVER (PARTITION BY user_id) AS t1 FROM e), w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND t1 IS NOT NULL AND tsu > t1 THEN tsu END) OVER (PARTITION BY user_id) AS t2 FROM w1), w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL AND tsu > t2 THEN tsu END) OVER (PARTITION BY user_id) AS t3 FROM w2), u AS (SELECT user_id, MAX(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS stage_reached FROM w3 GROUP BY 1) SELECT CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(CASE WHEN stage_reached >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_stage1, CAST(SUM(CASE WHEN stage_reached >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_stage2, CAST(SUM(CASE WHEN stage_reached >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_stage3 FROM u""")),

    QueryDef("q123_mad_outliers",
      // robust outlier census: |x − median| > 3·MAD per group — the
      // 50%-breakdown alternative to z-scores (Profiling.madOutliers
      // scaladoc for the two-percentile plan shape). Spark `percentile`
      // and DuckDB `quantile_cont` are bit-identical; all comparisons are
      // single double ops, no accumulation.
      (s, d) => Profiling.madOutliers(lineitem(s, d), Seq("l_returnflag"),
          col("l_extendedprice"), k = 3.0)
        .orderBy(col("l_returnflag")),
      Some("""WITH m AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem GROUP BY 1), dev AS (SELECT l.l_returnflag, ABS(CAST(l.l_extendedprice AS DOUBLE) - m.med) AS dv, m.med FROM lineitem l JOIN m USING (l_returnflag)), a AS (SELECT l_returnflag, quantile_cont(dv, 0.5) AS mad FROM dev GROUP BY 1) SELECT dev.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, MIN(dev.med) AS med, MIN(a.mad) AS mad, CAST(SUM(CASE WHEN dv > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers FROM dev JOIN a USING (l_returnflag) GROUP BY 1 ORDER BY 1""")),

    QueryDef("q124_canonical_dedup",
      // cosmetic-variant dedup: both engines union the corpus with a
      // deterministically defaced copy (case flip, punctuation, padding)
      // and recover every pair under canonicalText equality. One
      // hash-aggregate on the canonical string (Dedup.canonicalDupGroups
      // scaladoc notes the xxhash64 key swap at 100 TB).
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val noisy = docs.select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(lit("  "), upper(col("text")), lit(" !! ")).as("text"))
        Dedup.canonicalDupGroups(docs.unionByName(noisy), "doc_id", "text")
          .orderBy(col("rep_id"))
      },
      Some("""WITH a AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 1000000, '  ' || upper(text) || ' !! ' FROM documents), c AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS canon FROM a) SELECT CAST(MIN(doc_id) AS BIGINT) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies FROM c GROUP BY canon HAVING COUNT(*) > 1 ORDER BY rep_id""")),

    QueryDef("q125_rate_limit",
      // ingest throttling: first 3 events per (user, hour) in event-time
      // order — rides Skew.topNPerKey's two-phase sharded window, so one
      // hot user in one hot hour cannot pin a reducer (shard pre-prune
      // bounds any partition at shards×n rows before the final per-key
      // window).
      (s, d) => {
        val e = events(s, d).select(col("user_id"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        Skew.topNPerKey(e, Seq("user_id", "hour_us"),
            Seq(col("ts_us").asc, col("event_id").asc), n = 3)
          .select(col("user_id"), col("hour_us"), col("ts_us"),
            col("event_id"), col("rank"))
          .orderBy(col("user_id"), col("hour_us"), col("rank"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_us, epoch_us(ts) AS ts_us, event_id FROM events), r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id, hour_us ORDER BY ts_us, event_id) AS BIGINT) AS rank FROM e) SELECT user_id, hour_us, ts_us, event_id, rank FROM r WHERE rank <= 3 ORDER BY user_id, hour_us, rank""")),

    QueryDef("q126_rank_normalize",
      // distribution-free feature transform: percent_rank within group —
      // (rank−1)/(n−1) is the same closed form in every engine, one
      // double division per row. Sliced to one supplier so the per-row
      // output stays dump-sized; the plan (one exchange + per-group sort)
      // is scale-independent.
      (s, d) => Profiling.rankNormalize(
          lineitem(s, d).filter(col("l_suppkey") === 1L)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_returnflag"), col("l_extendedprice")),
          Seq("l_returnflag"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("pct_rank"), col("l_orderkey"),
          col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS pct_rank FROM lineitem WHERE l_suppkey = 1 ORDER BY l_returnflag, pct_rank, l_orderkey, l_linenumber"""))
  )
}
