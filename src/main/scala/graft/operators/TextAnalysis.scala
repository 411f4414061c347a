package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines (north-star ops, not
  * in the reference — SURVEY §7 M7). Everything here is a *narrow* per-row
  * projection built from codegen'd built-ins and higher-order array
  * functions: no UDFs, no shuffles, no driver round-trips — at 100 TB the
  * cost is exactly one scan.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " +")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: split on word/number/punct boundaries like
    * a GPT-style pre-tokenizer regex, so counts track subword tokenizers
    * better than whitespace does. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""),
      t => length(t) > 0))

  /** Stopword hit count over a fixed lexicon (whitespace tokens). Runs as
    * the native [[graft.functions.LexiconHits]] single-pass kernel;
    * [[stopwordCountFold]] is the declarative twin it is spec-locked to. */
  def stopwordCount(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.LexiconHits(
      ColumnShim.expression(text), stopwords.toArray))
  }

  /** Interpreted higher-order form of [[stopwordCount]] (semantics
    * statement; spec/equality use only). */
  def stopwordCountFold(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, """[\p{Punct}]""", ""))

  /** Heuristic quality score in [0,1] — the length/punctuation/stopword-ratio
    * family used by pretraining corpus filters (C4/Gopher-style rules).
    * Deterministic rational arithmetic: mean of three [0,1] terms.
    *   - length term: min(1, tokens/20) — very short docs score low
    *   - stopword term: min(1, 5 * stop_ratio) — natural prose has stopwords
    *   - punct term: 1 - min(1, 4 * punct_ratio) — punctuation soup scores low
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenTerm = least(lit(1.0), nTok / lit(20.0))
    val stopTerm = least(lit(1.0),
      lit(5.0) * stopwordCount(text).cast("double") / greatest(nTok, lit(1.0)))
    val punctTerm = lit(1.0) - least(lit(1.0),
      lit(4.0) * punctCount(text).cast("double") /
        greatest(length(text).cast("double"), lit(1.0)))
    (lenTerm + stopTerm + punctTerm) / lit(3.0)
  }

  /** Polynomial rolling-hash fingerprint of the normalized text
    * (lowercase, collapsed whitespace): fold over code points of
    * `acc * 31 + cp (mod 1e9+7)`. Order-dependent by design (it is a
    * *sequence* fingerprint) and bit-reproducible in any engine with 64-bit
    * integers — the DuckDB oracle runs the same fold via list_reduce.
    * Runs as the native codegen'd [[graft.functions.StringFoldHash]] loop;
    * [[fingerprintFold]] is the declarative twin it is spec-locked to. */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.StringFoldHash(
      ColumnShim.expression(normalizeWs(text))))
  }

  /** Interpreted higher-order-function form of [[fingerprint]] (the
    * semantics statement; ~100× slower per char — kept for the equality
    * spec and as executable documentation). */
  def fingerprintFold(text: Column): Column =
    aggregate(
      filter(split(normalizeWs(text), ""), c => length(c) === 1),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c).cast("long"), lit(1000000007L)))

  private def normalizeWs(text: Column): Column =
    lower(regexp_replace(trim(text), """\s+""", " "))

  private val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "es" -> Seq("el", "la", "los", "las", "que", "de", "y", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "les", "des", "est", "et", "une", "dans"))

  /** Language-ID via stopword/character heuristics: score each candidate
    * language by hits of its marker lexicon; best score wins, ties broken by
    * language code, docs with no hits → "und". The markers are the standard
    * tell-tale function words / scripts for each language.
    *
    * The lexicon scans and the Han-script count run as the native
    * [[graft.functions.LexiconHits]] / [[graft.functions.HanCount]]
    * kernels (one string pass each; the interpreted-filter form measured
    * 4.2 s vs 0.27 s scan baseline at sf0.1 — this is a pass over EVERY
    * document of a corpus). [[langIdFold]] is the declarative twin. */
  def langId(text: Column): Column =
    langIdFrom(text,
      hits = words => {
        import org.apache.spark.sql.graftshim.ColumnShim
        ColumnShim.column(graft.functions.LexiconHits(
          ColumnShim.expression(lower(text)), words.toArray)).cast("double")
      },
      cjk = {
        import org.apache.spark.sql.graftshim.ColumnShim
        ColumnShim.column(graft.functions.HanCount(
          ColumnShim.expression(text)))
      })

  /** Interpreted higher-order form of [[langId]] (semantics statement;
    * spec/equality use only). */
  def langIdFold(text: Column): Column = {
    val toks = tokens(lower(text))
    langIdFrom(text,
      hits = words => size(filter(toks, t => t.isin(words: _*))).cast("double"),
      cjk = length(regexp_replace(text, """[^\p{IsHan}]""", "")))
  }

  /** Shared scoring/tiebreak structure over pluggable hit counters. */
  private def langIdFrom(text: Column, hits: Seq[String] => Column,
      cjk: Column): Column = {
    val scored: Seq[(String, Column)] =
      langLexicons.map { case (lang, words) => lang -> hits(words) } :+
        ("zh" -> cjk.cast("double") * lit(3.0))
    val best = scored.map { case (lang, score) => struct(score.as("s"), lit(lang).as("l")) }
      .reduceLeft((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  // --- PII scan / redaction (pretraining-corpus scrubbing) ---------------
  // Patterns stay inside the RE2 ∩ java.util.regex common subset (no
  // backrefs, no lookaround) so the same pattern text runs identically in
  // Spark, DuckDB, and any RE2-based engine a corpus pipeline touches.

  /** Email addresses (named host with alphabetic TLD, or IPv4-literal
    * host — so `user@10.0.0.1` scrubs as one email, not a bare IP). */
  val emailPattern =
    "[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3})"
  /** TPC-H-style international phone numbers (CC-XXX-XXX-XXXX). */
  val phonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  /** Dotted-quad IPv4 literals. */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Count of PII matches of one pattern — codegen'd `regexp_count`. */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Redact emails, phones, and IPv4s with typed placeholder tokens.
    * Order matters: emails first, so `user@10.0.0.1` redacts as one
    * `<EMAIL>` rather than a partial `<IP>` inside an address. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailPattern), lit("<EMAIL>")),
        lit(phonePattern), lit("<PHONE>")),
      lit(ipv4Pattern), lit("<IP>"))

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models", table A1 — adapted): per document and n-gram order n∈{2,3},
    * the occurrence counts that the standard repetitious-text filters are
    * ratios of:
    *
    *   - `top_occ`  — occurrences of the single most frequent n-gram
    *     (top-n-gram fraction = top_occ / n_grams)
    *   - `n_grams`  — total n-gram occurrences (len(tokens) − n + 1)
    *   - `dup_occ`  — occurrences belonging to n-grams appearing more than
    *     once (duplicate-n-gram fraction = dup_occ / n_grams)
    *
    * Counts, not ratios, so downstream corpus-level aggregation stays in
    * exact integer arithmetic. Scale shape: posexplode tokens → per-doc
    * window `lead` forms both gram orders in ONE pass (same shared-shuffle
    * shape as MinHash shingling) → two hash aggregations with map-side
    * partial combine. No per-element lambdas, no self-joins; cost is linear
    * in corpus token count.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keepCols = keep.map(col)
    val toks = df.select((col(idCol) +: keepCols) :+
      posexplode(split(col(textCol), " +")).as(Seq("pos", "tok")): _*)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val next1 = lead(col("tok"), 1).over(w)
    val next2 = lead(col("tok"), 2).over(w)
    toks
      .withColumn("big", when(next1.isNotNull, concat_ws(" ", col("tok"), next1)))
      .withColumn("tri", when(next2.isNotNull, concat_ws(" ", col("tok"), next1, next2)))
      .selectExpr((idCol +: keep) :+ "stack(2, 2, big, 3, tri) AS (n, gram)": _*)
      .filter(col("gram").isNotNull)
      .groupBy((col(idCol) +: keepCols) ++ Seq(col("n"), col("gram")): _*)
      .agg(count(lit(1)).as("occ"))
      .groupBy((col(idCol) +: keepCols) :+ col("n"): _*)
      .agg(
        max(col("occ")).as("top_occ"),
        sum(col("occ")).as("n_grams"),
        sum(when(col("occ") > 1, col("occ")).otherwise(0L)).as("dup_occ"))
  }

  /** Top-k terms per group by occurrence count — the corpus-inspection /
    * TF-vocabulary pass. Lowercased whitespace tokens, empty tokens dropped;
    * ties broken by term text so the result is total-ordered.
    *
    * Scale shape: explode → hash aggregate on (group, term) with map-side
    * partial combine (the shuffle carries one row per distinct (group,term),
    * not per occurrence) → per-group top-k window where rank ≤ k prunes
    * inside the sort. Integer counts only: corpus-level TF stays exact.
    */
  def topTerms(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("occ").desc, col("term"))
    df.select(col(groupCol), explode(split(lower(col(textCol)), " +")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("occ"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Top-k terms per document by rarity-weighted TF — a deterministic
    * integer-arithmetic TF-IDF variant: `score = (tf · SCALE) div df`
    * (integer division, SCALE = 1e6), monotone in tf and anti-monotone in
    * document frequency like log-IDF but bit-reproducible in any engine
    * (no transcendental `ln` whose last ulp differs across libm builds).
    * Ties broken by term text. Output: (idCol, term, tf, df, score, rank).
    *
    * Scale shape: explode → (doc, term, tf) hash aggregation (map-side
    * combine absorbs the occurrence fan-out) → df by a second aggregation
    * over the already-deduped (doc, term) pairs, shuffled on term — the
    * natural key for a vocabulary-sized exchange — joined back on term,
    * then one per-doc top-k window where rank ≤ k prunes inside the sort.
    * Nothing is ever quadratic and no side materializes the corpus.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && scale >= 1)
    val tf = df
      .select(col(idCol), explode(split(lower(col(textCol)), " +")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("score", expr(s"tf * ${scale}L div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** BM25 ranked retrieval: top-`topK` documents for a fixed bag of query
    * terms. Uses the *rational* idf variant `(N − df + 0.5)/(df + 0.5)`
    * (the argument of BM25's log, without the log) — monotone-identical
    * ranking to log-idf for single terms and bit-reproducible in any
    * engine, the same ln()-avoidance rule as [[tfidfTopTerms]] and
    * `Profiling.histDrift`. The tf saturation term is classic BM25:
    * `tf·(k1+1) / (tf + k1·((1−b) + b·dl/avgdl))`.
    *
    * Cross-engine float discipline: idf and avgdl are computed from exact
    * integer aggregates with a fixed cast/op order; each document's score
    * is a per-term conditional sum (at most one non-zero addend per term,
    * so group order can't change the bits) followed by one fixed-order
    * add chain over the sorted term list.
    *
    * Scale shape: the `isin(queryTerms)` filter runs in the scan stage, so
    * only postings of the queried terms are ever shuffled — the exchange is
    * O(matching docs × |query|), not O(corpus tokens). Corpus stats (N,
    * Σdl) are one scalar aggregate; per-term document frequencies collect
    * ≤ |query| rows to the driver to become literals (bounded by query
    * size, never by data). Final top-k plans as TakeOrderedAndProject —
    * per-partition heaps, one singleton merge. */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && topK >= 1)
    val terms = queryTerms.distinct.sorted
    val toks = filter(split(lower(col(textCol)), " +"), t => length(t) > 0)
    val base = df.select(col(idCol), toks.as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    val g = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
    val n = g.getLong(0)
    if (n == 0L) // empty corpus: sumdl is NULL and avgdl would be 0/0
      return df.select(col(idCol), lit(0L).as("dl"), lit(0.0).as("score"))
        .limit(0)
    val avgdl = g.getLong(1).toDouble / n.toDouble
    val tf = base
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perTerm = terms.map { t =>
      val dfT = dfreq.getOrElse(t, 0L)
      val idf = ((n - dfT).toDouble + 0.5) / (dfT.toDouble + 0.5)
      val tfd = col("tf").cast("double")
      val s = lit(idf) * ((tfd * lit(k1 + 1.0)) /
        (tfd + lit(k1) * ((lit(1.0) - lit(b)) +
          lit(b) * (col("dl").cast("double") / lit(avgdl)))))
      sum(when(col("term") === t, s).otherwise(lit(0.0))).as(s"__s_$t")
    }
    val scored = tf.groupBy(col(idCol), col("dl"))
      .agg(perTerm.head, perTerm.tail: _*)
    val total = terms.map(t => col(s"__s_$t")).reduceLeft(_ + _)
    scored.withColumn("score", total)
      .select(col(idCol), col("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Corpus-level collocation mining: adjacent-bigram counts joined to
    * unigram counts, ranked by *lift* — `P(w1 w2) / (P(w1)·P(w2))` =
    * `(n_xy · N²) / (N_bi · n_x · n_y)` — the log-free core of PMI (PMI is
    * its ln; ranking is identical because ln is monotone, and the rational
    * form is bit-reproducible cross-engine — same rule as q68/q111/q114).
    * The phrase-discovery pass a tokenizer/vocab build runs over a corpus.
    *
    * Scale shape: bigrams come from a per-row `zip_with` of two array
    * slices (no shuffle, no self-join); unigram and bigram counts are
    * map-side-combined hash aggregations shuffled on the term — vocabulary-
    * sized exchanges, not corpus-sized. The two corpus totals are scalar
    * aggregates. The final unigram joins are vocabulary×vocabulary-count
    * equi-joins AQE is free to broadcast; top-k plans as
    * TakeOrderedAndProject. All counts exact integers; lift is a fixed-
    * order double expression over them. */
  /** Empty collocation result with the [[collocations]] schema. */
  private def bi0(df: DataFrame): DataFrame =
    df.select(lit("").as("w1"), lit("").as("w2"), lit(0L).as("n_xy"),
      lit(0L).as("n_x"), lit(0L).as("n_y"), lit(0.0).as("lift")).limit(0)

  def collocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1L && topK >= 1)
    val toks = filter(split(lower(col(textCol)), " +"), t => length(t) > 0)
    val base = df.select(toks.as("__toks"))
    val bigrams = base.select(explode(when(size(col("__toks")) >= 2,
      zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array())).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val uni = base.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val nTokRow = uni.agg(sum(col("n"))).head()
    if (nTokRow.isNullAt(0)) // empty corpus (or all-blank docs): no tokens
      return bi0(df)
    val nTok = nTokRow.getLong(0)
    val nBi = bigrams.count()
    if (nBi == 0L) // single-token docs only: lift would divide by zero
      return bi0(df)
    val bi = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val lift = ((col("n_xy").cast("double") * lit(nTok.toDouble))
        * lit(nTok.toDouble)) /
      ((lit(nBi.toDouble) * col("n_x").cast("double"))
        * col("n_y").cast("double"))
    bi.join(uni.select(col("w").as("w1"), col("n").as("n_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_y")), "w2")
      .withColumn("lift", lift)
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Sliding-window document chunking — split each document into
    * `chunkTokens`-token windows whose starts step by `strideTokens`
    * (overlapping when stride < chunk, the standard long-context
    * pretraining cut). Start offsets are 0, stride, 2·stride, … < n_tokens;
    * the final windows may be short (truncation/padding is downstream
    * policy). Adds `chunk` (index = start/stride), `chunk_text`,
    * `chunk_tokens`.
    *
    * Scale shape: one Generate (explode of the start-offset sequence) per
    * row — no shuffle at all; output rows ≈ input tokens / stride. The
    * token array materializes once per row and each chunk slices it
    * (CollapseProject keeps the multi-use alias a real column, so the
    * split doesn't re-run per chunk). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int, keep: Seq[String] = Nil): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1)
    val toks = tokens(col(textCol))
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)),
      lit(strideTokens))
    df.select((col(idCol) +: keep.map(col)) ++ Seq(toks.as("__toks"),
        explode(starts).as("__start")): _*)
      .withColumn("__ctoks",
        slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
      .withColumn("chunk", expr(s"__start div $strideTokens"))
      .withColumn("chunk_text", array_join(col("__ctoks"), " "))
      .withColumn("chunk_tokens", size(col("__ctoks")).cast("long"))
      .drop("__toks", "__start", "__ctoks")
  }

  // --- PII redaction ------------------------------------------------------

  /** Regexes deliberately restricted to syntax with identical semantics in
    * Java regex (Spark) and RE2 (DuckDB, the oracle): no backreferences, no
    * lookaround, ASCII classes and `\b` only. Order of application matters
    * and is part of the contract: emails first (their local part contains
    * digit runs), then dotted quads, then bare digit runs — each later
    * pattern sees the earlier placeholders, never raw earlier PII. */
  val emailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Regex = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val digitRunRegex = "\\d{6,}"

  /** PII scrub for a text corpus: replace emails / IPv4 addresses / long
    * digit runs (ids, phone-ish) with typed placeholders and count each —
    * the audit trail a privacy pass needs. Pure per-row projection (three
    * codegen'd regexp_replace + three regexp_count), so at 100 TB the cost
    * is one scan and the redacted column writes straight back out; no
    * shuffle, no UDF. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, emailRegex, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Regex, "<IP>")
    df.withColumn("n_email", regexp_count(t, lit(emailRegex)).cast("long"))
      .withColumn("n_ipv4",
        regexp_count(afterEmail, lit(ipv4Regex)).cast("long"))
      .withColumn("n_digit_run",
        regexp_count(afterIp, lit(digitRunRegex)).cast("long"))
      .withColumn("redacted",
        regexp_replace(afterIp, digitRunRegex, "<NUM>"))
  }

  /** Aggressive canonical form for exact-dedup after cosmetic edits (the
    * C4-style cleanup): ASCII casefold, every non-alphanumeric run becomes
    * one space, trimmed. Catches case/punctuation/whitespace variants that
    * byte-equality misses while staying a pure codegen'd projection (and
    * in the Java-regex ∩ RE2 dialect, so the oracle replays it). */
  def canonicalText(t: Column): Column =
    trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]", " "),
      " +", " "))

  // --- Repetition / quality (Gopher-style) --------------------------------

  /** Per-document repetition profile — the Gopher/C4 repetition filters:
    * `top_token_frac` (most frequent token's share; boilerplate and
    * keyword-stuffed docs score high) and `dup_bigram_frac` (share of
    * adjacent bigrams that are repeats; templated/looping text scores
    * high). Emits `doc_id, n_tokens, n_unique, top_n, top_token_frac,
    * n_bigrams, n_dup_bigrams, dup_bigram_frac` for docs with ≥ 1 token.
    *
    * Scale shape: bigram metrics are per-row array expressions (no
    * shuffle); token mode needs one explode + two hash aggregations keyed
    * on (doc, term) then doc — every token of a doc lives in that doc's
    * row, so the map-side partial agg collapses duplicates before the
    * exchange and the shuffle carries unique (doc, term) pairs, not corpus
    * tokens. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " +"), t => length(t) > 0)
    val base = df.select(col(idCol), toks.as("__toks"))
    val uni = base
      .select(col(idCol), explode(col("__toks")).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_unique"),
        max(col("__n")).cast("long").as("top_n"))
    val bg = base.select(col(idCol),
      when(size(col("__toks")) >= 2,
        zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array()).as("__bgs"))
      .select(col(idCol),
        size(col("__bgs")).cast("long").as("n_bigrams"),
        size(array_distinct(col("__bgs"))).cast("long").as("n_unique_bigrams"))
    uni.join(bg, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("n_unique"), col("top_n"),
        (col("top_n").cast("double") / col("n_tokens").cast("double"))
          .as("top_token_frac"),
        col("n_bigrams"),
        (col("n_bigrams") - col("n_unique_bigrams")).as("n_dup_bigrams"),
        when(col("n_bigrams") > 0,
          (col("n_bigrams") - col("n_unique_bigrams")).cast("double") /
            col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
  }

  // --- Distribution drift per source --------------------------------------

  /** Total-variation distance between each source's token distribution and
    * the whole corpus — the "did one slice of the corpus go off-vocabulary"
    * monitor (TV not KL/PSI: no ln(), so the statistic is bit-reproducible
    * in any engine — same rule as `Profiling.histDrift`).
    *
    * Exactness: with integer counts, Σ_t |p_st − q_t| over the FULL
    * vocabulary reduces to terms the source actually contains:
    * Σ_t |p−q| = 1 + Σ_{t∈source} (|n_st·N − n_t·N_s| − n_t·N_s)/(N_s·N),
    * so the per-term numerators are exact integers (DECIMAL(38,0) — no
    * float sum to reorder) and ONE double division happens at the end.
    *
    * Scale shape: two hash aggregations (source×term, term) shuffled on
    * vocabulary-sized keys, one broadcastable join term→corpus-count, one
    * scalar total. Nothing is ever per-row on the driver. */
  def sourceTokenDrift(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " +"), t => length(t) > 0)
    val tok = df.select(col(sourceCol), explode(toks).as("__t"))
    val bySrcTerm = tok.groupBy(col(sourceCol), col("__t"))
      .agg(count(lit(1)).as("n_st"))
    val byTerm = tok.groupBy(col("__t")).agg(count(lit(1)).as("n_t"))
    val nTotRow = byTerm.agg(sum(col("n_t"))).head()
    if (nTotRow.isNullAt(0))
      return df.select(col(sourceCol), lit(0L).as("n_s"),
        lit(0.0).as("tv_distance")).limit(0)
    val nTot = nTotRow.getLong(0)
    val bySrc = bySrcTerm.groupBy(col(sourceCol))
      .agg(sum(col("n_st")).cast("long").as("n_s"))
    val term = col("n_t").cast("decimal(38,0)") * col("n_s")
    val perSrc = bySrcTerm
      .join(byTerm, Seq("__t"))
      .join(bySrc, Seq(sourceCol)) // sources are few: AQE broadcasts
      .groupBy(col(sourceCol), col("n_s"))
      .agg(sum(abs(col("n_st").cast("decimal(38,0)") * lit(nTot) - term)
        - term).cast("decimal(38,0)").as("s_num"))
    perSrc.select(col(sourceCol), col("n_s"),
      (lit(0.5) * (lit(1.0) + col("s_num").cast("double") /
        (col("n_s").cast("double") * lit(nTot.toDouble))))
        .as("tv_distance"))
  }

  /** One-scan document profile: all metrics as extra columns. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpeish", bpeishTokenCount(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("n_stopwords", stopwordCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("lang_pred", langId(t))
  }

  /** Corpus-trained unigram language-model score per document — the
    * KenLM-style "how surprising is this text under the corpus
    * distribution" quality signal, in deterministic integer form: each
    * token contributes `N div n_t` (corpus tokens over the token's corpus
    * frequency — the reciprocal of its unigram probability, integer
    * division instead of `-log p` for bit-reproducibility across engines,
    * same trick as [[tfidfTopTerms]]'s div-IDF). High average rarity =
    * rare/misspelled/garbage tokens; low = common fluent text.
    *
    * Scale shape: explode → vocabulary counts (shuffle ∝ vocab, map-side
    * combined) → token-stream join back on term (the same
    * vocabulary-keyed exchange as TF-IDF; AQE broadcasts the counts side
    * when the vocab is small) → per-doc aggregation. The 1-row corpus
    * total rides a broadcast cross join. Nothing quadratic. */
  def unigramRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // round-14: the vocabulary-count exchange and the term join are keyed
    // on xxhash64(term) — 8 bytes per token on the wire instead of the
    // term string (guide §2.3). Counts (and so every rarity integer) are
    // identical to the string-keyed form unless two distinct terms
    // collide in 64 bits (P ≈ V²·2⁻⁶⁵ over the vocabulary); the DuckDB
    // oracle replays the exact string semantics tri-scale and gates it.
    val tok = df.select(col(idCol),
        explode(split(lower(col(textCol)), " +")).as("term"))
      .filter(length(col("term")) > 0)
      .select(col(idCol), xxhash64(col("term")).as("__th"))
    val counts = tok.groupBy(col("__th")).agg(count(lit(1)).as("n_t"))
    val total = counts.agg(sum(col("n_t")).as("n_total"))
    tok.join(counts, "__th")
      .crossJoin(broadcast(total))
      .withColumn("__rarity", expr("n_total div n_t"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__rarity")).as("rarity_sum"))
      .withColumn("avg_rarity",
        col("rarity_sum").cast("double") / col("n_tokens"))
      .orderBy(col(idCol))
  }

  /** Head-vocabulary coverage per group: the fraction of a group's tokens
    * that fall in the corpus-wide top-`k` terms. A drift/quality signal —
    * fluent natural text is dominated by the head (Zipf), while boilerplate
    * and garbage push mass into the tail; a source whose coverage moves
    * between snapshots changed its register. Deterministic: head ties
    * break on term text; coverage is one BIGINT/BIGINT division.
    *
    * Scale shape: vocabulary counts (shuffle ∝ vocab) → top-k head via a
    * single small sort (k rows survive) → broadcast LEFT join of the
    * token stream against the head (no shuffle of the stream) → per-group
    * counts. */
  def headCoverage(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val tok = df.select(col(groupCol),
        explode(split(lower(col(textCol)), " +")).as("term"))
      .filter(length(col("term")) > 0)
    val head = tok.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
      .orderBy(col("n_t").desc, col("term")).limit(k)
      .select(col("term"), lit(1L).as("is_head"))
    tok.join(broadcast(head), Seq("term"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("is_head"), lit(0L))).as("head_tokens"))
      .withColumn("head_coverage",
        col("head_tokens").cast("double") / col("n_tokens"))
      .orderBy(col(groupCol))
  }
}
