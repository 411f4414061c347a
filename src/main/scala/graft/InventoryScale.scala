package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, QualityModel}

/** Round-5 widening: the production-shape paths the round-4 surface
  * promised in scaladoc — trained-weight quality scoring (explicit weight
  * table through a broadcast join), group-budgeted priority sampling
  * routed through the CLI planner, and int8-quantized IVF verify (the
  * IVF-PQ direction). Oracle discipline as everywhere else: deterministic
  * designs hash-gate exactly; sketch/sampled results are bound-gated
  * in-query against exact in-engine twins (the q29/q39/q46 pattern).
  */
object InventoryScale {
  import graft.Tables._

  val all: Seq[QueryDef] = Seq(

    QueryDef("q163_quality_model_trained",
      // TRAINED-WEIGHT quality filtering, production shape: the weight
      // table is an explicit (bucket, weight_cents) DataFrame — here the
      // deterministic table materialized via defaultWeightTable, in
      // production the trained coefficients — scored by
      // QualityModel.marginCentsJoined: scan-stage token explode,
      // BROADCAST hash join on the bucket id (the token stream never
      // shuffles), one map-side-combined rollup keyed on the doc id.
      // Same margins as the plan-baked q153 kernel (FrontierSpec pins the
      // per-doc identity); the oracle replays the join shape itself.
      (s, d) => QualityModel.marginCentsJoined(documents(s, d), "doc_id",
          "text", QualityModel.defaultWeightTable(s), keep = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("margin_cents") > 0, lit(1L)).otherwise(lit(0L)))
            .as("n_kept"),
          sum(col("margin_cents")).as("margin_cents_total"))
        .orderBy(col("source")),
      Some(s"""WITH wt AS (SELECT CAST(i AS INTEGER) AS bucket, CAST((i * 127 + 17) % 101 - 50 AS BIGINT) AS w FROM range(${QualityModel.Buckets}) t(i)), tok AS (SELECT doc_id, source, unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS tok FROM documents), b AS (SELECT doc_id, source, CAST((length(tok) * 31 + unicode(tok)) % ${QualityModel.Buckets} AS INTEGER) AS bucket FROM tok), m AS (SELECT doc_id, SUM(wt.w) AS mc FROM b LEFT JOIN wt USING (bucket) GROUP BY 1) SELECT d.source, COUNT(*) AS n_docs, CAST(SUM(CASE WHEN COALESCE(m.mc, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, CAST(SUM(COALESCE(m.mc, 0)) AS BIGINT) AS margin_cents_total FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id GROUP BY 1 ORDER BY 1""")),

    QueryDef("q164_grouped_priority_cli",
      // --method priority WITH GROUP BY through the real CLI executor
      // path (SpecExecutor → Skew.priorityPerKey): the fixed k becomes a
      // per-group budget, every group gets its own threshold τ_g.
      // BOUND-GATED (the CLI's content-hash priorities are xxhash64 —
      // engine-internal, not DuckDB-replayable like q159's affine key):
      // each group's estimate must sit within 20% of its exact sum and
      // the per-group sample size must be min(k, |group|) — statements
      // the oracle can make exactly.
      (s, d) => {
        Tables.registerAll(s, d)
        val spec = graft.parser.QueryParser.parse(
          "SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag")
          .copy(sampling = graft.model.SamplingStrategy.Priority(500))
        val est = graft.exec.SpecExecutor.run(s, spec)
        val exact = lineitem(s, d).groupBy(col("l_returnflag"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              .as("sum_exact"),
            count(lit(1)).as("n_rows"))
        est.join(exact, "l_returnflag")
          .select(col("l_returnflag"), col("n_rows"),
            (col("sum_l_extendedprice_n") === least(lit(500L), col("n_rows")))
              .as("budget_respected"),
            (abs(col("sum_l_extendedprice") / col("sum_exact") - lit(1.0))
              <= lit(0.2)).as("within_20pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS budget_respected, TRUE AS within_20pct FROM lineitem GROUP BY 1 ORDER BY 1")),

    QueryDef("q165_ann_ivf_int8_top5",
      // IVF top-5 with int8-quantized candidate scoring (Ann.ivfTopKInt8
      // — codes are per-vector-scaled signed bytes in BINARY, 4× narrower
      // candidate rows, integer-dot cosine), ORACLE-GATED on recall vs
      // exact brute force at the same 0.75 floor as the full-precision
      // q46 (quantized cosine error ~1e-2 reorders only near-ties;
      // measured ≥ 0.85 across the three fixture scales).
      (s, d) => {
        val emb = embeddings(s, d)
        val probes = emb.filter(col("vec_id") < 10)
        val ivf = Ann.ivfTopKInt8(emb, probes, "vec_id", "embedding",
          k = 5, numCentroids = 32, nProbe = 8)
        val bf = Ann.bruteForceTopKFast(emb, probes, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        val nTrue = bf.count()
        val nFound = bf.join(ivf.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        s.range(1).select(
          lit(nTrue).as("n_true_neighbors"),
          lit(nFound.toDouble >= 0.75 * nTrue.toDouble).as("recall_ge_075"))
      },
      Some("SELECT CAST(5 * COUNT(*) AS BIGINT) AS n_true_neighbors, TRUE AS recall_ge_075 FROM embeddings WHERE vec_id < 10"))
  )
}
