package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language id, content fingerprinting. All pure
  * per-row projections (codegen'd, no shuffle except final sort) so they
  * stream at scan speed over 100 TB.
  *
  * Regex patterns are kept to simple character classes so Java regex
  * (Spark) and RE2 (DuckDB oracle) agree.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens + alpha words + a BPE-ish
    * word/number/punct split (the tokenizer-shaped count). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).cast("long").as("n_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").as("n_alpha_words"),
        size(expr(raw"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")).cast("long").as("n_bpeish"))
      .orderBy(col("doc_id"))

  /** The combined quality score as a column over `text` — shared by
    * [[quality]] and the single-scan consumers (Pipeline.qualityGate,
    * tokenBudget) so they never re-join documents to itself on doc_id
    * just to attach the score. */
  private[graft] def qualityScoreCol: org.apache.spark.sql.Column = {
    val nTok = size(expr(raw"regexp_extract_all(text, '\\S+', 0)"))
    val nStop = size(expr("regexp_extract_all(text, '\\\\b(the|a|of|and|to|in)\\\\b', 0)"))
    val nPunct = size(expr(raw"regexp_extract_all(text, '[^a-z0-9\\s]', 0)"))
    val len = length(col("text"))
    // score: long enough, not punctuation soup, some stopwords
    round(least(len.cast("double") / 400, lit(1.0)) *
      (lit(1.0) - nPunct.cast("double") / len) *
      (lit(0.5) + nStop.cast("double") / nTok), 6)
  }

  /** Quality scoring: length, punctuation/digit density, stopword ratio,
    * and a combined score — the usual pretraining quality filters. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(expr(raw"regexp_extract_all(text, '\\S+', 0)"))
    val nStop = size(expr("regexp_extract_all(text, '\\\\b(the|a|of|and|to|in)\\\\b', 0)"))
    val nPunct = size(expr(raw"regexp_extract_all(text, '[^a-z0-9\\s]', 0)"))
    val nDigit = size(expr("regexp_extract_all(text, '[0-9]', 0)"))
    val len = length(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        len.cast("long").as("len_chars"),
        round(nPunct.cast("double") / len, 6).as("punct_ratio"),
        round(nDigit.cast("double") / len, 6).as("digit_ratio"),
        round(nStop.cast("double") / nTok, 6).as("stop_ratio"),
        qualityScoreCol.as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Predicted language as a column over `text` — shared by [[langid]]
    * and single-scan consumers (Pipeline.buildCorpus). */
  private[graft] def predictedLangCol: org.apache.spark.sql.Column = {
    val cEn = size(expr("regexp_extract_all(text, 'th|he|an|in|er', 0)"))
    val cDe = size(expr("regexp_extract_all(text, 'sch|ein|der|ung', 0)"))
    val cEs = size(expr("regexp_extract_all(text, 'el |la |de |os ', 0)"))
    when(cEn >= cDe && cEn >= cEs, "en")
      .when(cDe >= cEs, "de")
      .otherwise("es")
  }

  /** Character-n-gram language-id heuristic: count language-marker
    * n-grams, argmax with a fixed priority tie-break. (The testdata text
    * is synthetic English-ish regardless of its `lang` column — the
    * operator is the point, the labels are incidental.) */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    val cEn = size(expr("regexp_extract_all(text, 'th|he|an|in|er', 0)"))
    val cDe = size(expr("regexp_extract_all(text, 'sch|ein|der|ung', 0)"))
    val cEs = size(expr("regexp_extract_all(text, 'el |la |de |os ', 0)"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("tagged_lang"),
        cEn.cast("long").as("c_en"), cDe.cast("long").as("c_de"), cEs.cast("long").as("c_es"))
      .withColumn("predicted_lang", // same argmax as predictedLangCol,
        // over the already-projected counts (text is gone here)
        when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es"), "en")
          .when(col("c_de") >= col("c_es"), "de")
          .otherwise("es"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID quality report: the confusion matrix of
    * [[langid]]'s n-gram classifier against the corpus's tagged
    * language, with each cell's share of its true-language row — the
    * QC table that decides whether the cheap classifier is good
    * enough to route low-resource strata, and the pattern for
    * evaluating ANY per-doc classifier against a labeled column.
    * Shape at scale: langid's single scan plus a (true, pred) agg —
    * ≤ |langs|² rows — and a window over that tiny relation. */
  def langidEval(spark: SparkSession, dir: String): DataFrame = {
    val cm = langid(spark, dir)
      .groupBy(col("tagged_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tagged_lang"))
    cm.withColumn("share_of_true",
        round(col("n").cast("double") / sum(col("n")).over(w), 6))
      .orderBy(col("tagged_lang"), col("predicted_lang"))
  }

  /** Gopher rule-based quality filters (Rae et al. 2021, table A1) —
    * the fixed-threshold document gates most pretraining corpora run
    * before any learned scoring, one boolean per rule so downstream
    * reporting can attribute drops: token-count window [50, 100k],
    * mean word length [3, 10], symbol-to-word ratio ≤ 0.1, ≥80% of
    * words alphabetic, ≥2 distinct stopwords. All rules are one
    * projection over a single scan — no joins, no shuffles except the
    * output sort. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"), col("text"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(expr("aggregate(toks, 0L, (a, t) -> a + length(t))").cast("double") /
          size(col("toks")), 6).as("mean_word_len"),
        round(size(expr(raw"regexp_extract_all(text, '[#*^~|]', 0)")).cast("double") /
          size(col("toks")), 6).as("symbol_word_ratio"),
        round(expr("size(filter(toks, t -> t rlike '[a-z]'))").cast("double") /
          size(col("toks")), 6).as("alpha_word_ratio"),
        expr("size(array_intersect(array_distinct(toks), " +
          "array('the','a','of','and','to','in','that','is')))")
          .cast("long").as("n_stopwords"))
      .withColumn("passes",
        col("n_tokens").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_word_ratio") <= 0.1 &&
          col("alpha_word_ratio") >= 0.8 &&
          col("n_stopwords") >= 2)
      .orderBy(col("doc_id"))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank the
    * corpus by the [[lmScore]] LM log-likelihood and cut into
    * head/middle/tail terciles — the slices CCNet publishes and
    * training mixes draw from in different proportions.
    * Shape at scale: lmScore's plan plus ONE window over the tiny
    * (doc, score) projection; at 100 TB the ntile swaps for two
    * approximate tercile cut points broadcast back — same output
    * column, no global sort. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lm_score").desc, col("doc_id"))
    lmScore(spark, dir)
      .withColumn("tercile", ntile(3).over(w))
      .select(col("doc_id"), col("lm_score"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Zipf-law fit over the token frequency distribution — the corpus
    * health statistic (natural language sits near slope −1 on
    * log-rank/log-frequency; templated or synthetic text drifts):
    * least-squares slope/intercept over the top-100 tokens, x=ln rank,
    * y=ln count, ties broken by token so the ranking is deterministic.
    * Shape at scale: one token count agg (map-side combinable), a
    * TakeOrdered(100), then closed-form regression on 100 rows. */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("w"))
    counts.withColumn("x", log(row_number().over(w).cast("double")))
      .withColumn("y", log(col("c").cast("double")))
      .agg(count(lit(1)).as("n_points"),
        round((count(lit(1)) * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))) /
          (count(lit(1)) * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))), 4)
          .as("zipf_slope"),
        round((sum(col("y")) - ((count(lit(1)) * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))) /
          (count(lit(1)) * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x")))) * sum(col("x"))) /
          count(lit(1)), 4).as("intercept"))
  }

  /** Rare-token (OOV-shaped) rate per document — the gibberish /
    * mojibake / OCR-noise detector that complements [[quality]]'s
    * surface ratios: tokens whose CORPUS frequency ≤ 2 are "rare", and
    * a document whose text is largely rare tokens is either noise or
    * out-of-distribution for the corpus (both worth a gate). Reports
    * per doc total tokens, rare-token occurrences, distinct rare
    * types, and the rare rate.
    *
    * Shape at scale: one (doc, token) partial agg (map-side
    * combinable), the corpus-frequency table reduces THAT relation
    * (bounded by |vocab|) and joins back broadcast-gated on the token —
    * the [[tfidf]] discipline; nothing at token-occurrence grain is
    * shuffled twice. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale.maybeBroadcast
    val tok = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf")))
    val cf = tok.groupBy(col("w")).agg(sum(col("tf")).as("cf"))
    tok.join(maybeBroadcast(cf), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("cf") <= 2, col("tf")).otherwise(0L)).as("n_rare_tokens"),
        count(when(col("cf") <= 2, lit(1))).as("n_rare_types"),
        round(sum(when(col("cf") <= 2, col("tf")).otherwise(0L)) /
          sum(col("tf")).cast("double"), 6).as("rare_rate"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing (rolling k-gram hash) fingerprints, MOSS-style: the
    * plagiarism/near-dup fingerprint family — window-min over k-gram
    * hashes selects a deterministic ~1/w sample of each document's
    * hashes, robust to insertions. Native kernel
    * (graft.functions.WinnowFingerprint); one row per (doc,
    * fingerprint). */
  def winnow(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(expr("graft_winnow(text)")).as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  /** TF-IDF top-3 terms per document. Term frequencies are one
    * explode+groupBy (partial map-side); document frequencies reduce
    * the tf relation again (tiny — bounded by |vocab|) and broadcast
    * back, as does the 1-row corpus size. Scores round to 6 before
    * ranking so cross-engine ln() ulp drift can't flip the order. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    // tf feeds both the score join and the df reduction — persist, or
    // the scan→regexp→explode→agg chain runs twice
    val tf = graft.Caches.persistTracked(Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + 1), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("score"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Bigram language-model quality score (the LM-perplexity-style
    * filter a training-data pipeline runs): per doc, the mean add-one-
    * smoothed conditional log-likelihood ln((c(w1,w2)+1)/(c(w1)+V))
    * of its bigrams under corpus-wide counts. Counts are exact
    * integers (one explode+agg each), V is a 1-row broadcast, so the
    * only float op is the final ln — rounded before output. Lower
    * scores ⇒ atypical word sequences ⇒ filter candidates. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.Caches.persistTracked(Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks")))
    val bigrams = graft.Caches.persistTracked(
      toks.select(col("doc_id"), explode(expr(
          """CASE WHEN size(toks) >= 2 THEN
               transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))
             ELSE array() END""")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val uniC = toks.select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("uc"))
    val bgC = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc"))
    val vocab = uniC.agg(count(lit(1)).as("v"))
    // vocab-bounded counts normally broadcast; the gate falls back to a
    // shuffle join when a real web corpus pushes the bigram table past
    // executor memory (vocab² worst case)
    import graft.operators.Scale.maybeBroadcast
    // Direct join+avg over the raw bigram stream: a (doc, w1, w2)
    // pre-aggregation before these joins was tried in round 4 and
    // REGRESSED 4.4× at sf0.1 (BENCH_r04) — within-doc bigram
    // multiplicity is ~1 on realistic corpora, so the extra full
    // shuffle buys nothing. Both count tables broadcast (vocab- and
    // vocab²-bounded), so this shape shuffles the bigram stream once,
    // for the final per-doc agg.
    bigrams
      .join(maybeBroadcast(bgC), Seq("w1", "w2"))
      .join(maybeBroadcast(uniC), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log((col("bc") + lit(1.0)) / (col("uc") + col("v")))), 6).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated Kneser–Ney bigram score (Kneser & Ney 1995, the
    * smoothing real LM-quality filters — KenLM/CCNet — actually use,
    * where [[lmScore]] is the add-one teaching baseline): per doc the
    * mean ln of
    *   P(w2|w1) = (c(w1w2) − d)/c(w1·) + d·N1+(w1·)/c(w1·) · Pcont(w2)
    * with discount d = 0.75, continuation probability Pcont(w2) =
    * N1+(·w2)/|bigram types|, c(w1·) the count of bigrams starting
    * w1, N1+(w1·)/N1+(·w2) the distinct-continuation counts. KN's
    * point — a word's probability mass comes from how many CONTEXTS
    * it completes, not raw frequency — is what separates boilerplate
    * (frequent but context-poor) from fluent text.
    *
    * Shape at scale: identical to [[lmScore]] — exact integer count
    * tables (vocab- and type-bounded, broadcast-gated), one shuffle
    * of the bigram stream for the per-doc agg; every input to the ln
    * is an exact integer ratio, so only the final ln/avg is float
    * (rounded 6 for the oracle). c(w1w2) ≥ 1 on every joined row, so
    * the discounted term is strictly positive and the ln total. */
  def knScore(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale.maybeBroadcast
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"))
    val bigrams = graft.Caches.persistTracked(
      toks.select(col("doc_id"), explode(expr(
          """CASE WHEN size(toks) >= 2 THEN
               transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))
             ELSE array() END""")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val bgC = graft.Caches.persistTracked(
      bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc")))
    val fwd = bgC.groupBy(col("w1"))
      .agg(sum(col("bc")).as("c1"), count(lit(1)).as("n1fw"))
    val bwd = bgC.groupBy(col("w2")).agg(count(lit(1)).as("n1bw"))
    val types = bgC.agg(count(lit(1)).as("b"))
    bigrams
      .join(maybeBroadcast(bgC), Seq("w1", "w2"))
      .join(maybeBroadcast(fwd), Seq("w1"))
      .join(maybeBroadcast(bwd), Seq("w2"))
      .crossJoin(broadcast(types))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(
          (col("bc") - lit(0.75)) / col("c1") +
            lit(0.75) * col("n1fw") / col("c1") * col("n1bw") / col("b"))), 6)
          .as("kn_score"))
      .orderBy(col("doc_id"))
  }

  /** Flesch-style readability score — the classic reading-ease
    * formula 206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)
    * with two documented stand-ins for this synthetic corpus:
    * syllables ≈ vowel-group count (the standard heuristic), and
    * sentences ≈ ⌈words/15⌉ because the corpus has no sentence
    * punctuation (on real text, swap the denominator for a
    * sentence-boundary regexp count — the plan is unchanged).
    * Complements [[quality]]/[[gopherRules]] with the
    * audience-difficulty axis quality filters don't measure.
    *
    * Shape at scale: two regexp counts on the scan, zero shuffles
    * beyond the presentation sort — [[repetition]]'s plan. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).cast("long").as("n_words"),
        size(expr(raw"regexp_extract_all(lower(text), '[aeiou]+', 0)")).cast("long").as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("n_sentences", ceil(col("n_words") / lit(15.0)).cast("long"))
      .withColumn("flesch", round(
        lit(206.835) - lit(1.015) * (col("n_words") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables") / col("n_words")), 6))
      .orderBy(col("doc_id"))

  /** Within-document repetition ratios — the Gopher/RefinedWeb-style
    * quality rule that catches boilerplate and degenerate generation:
    * fraction of duplicate tokens and duplicate 3-grams inside each
    * doc (1 − distinct/total). Pure per-row array expressions — zero
    * shuffle, the whole operator is one projected scan. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"))
      .withColumn("grams", expr(
        """CASE WHEN size(toks) >= 3 THEN
             transform(sequence(0, size(toks) - 3),
               i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
           ELSE array() END"""))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(expr("array_distinct(toks)")).cast("long").as("n_distinct_tokens"),
        round(lit(1.0) - size(expr("array_distinct(toks)")).cast("double") /
          size(col("toks")), 6).as("dup_token_ratio"),
        when(size(col("grams")) > 0,
          round(lit(1.0) - size(expr("array_distinct(grams)")).cast("double") /
            size(col("grams")), 6)).otherwise(lit(0.0)).as("dup_3gram_ratio"))
      .orderBy(col("doc_id"))

  /** Cross-document boilerplate signal (the CCNet/RefinedWeb-style
    * frequent-n-gram coverage score): for each doc, the fraction of
    * its bigram OCCURRENCES whose bigram appears in ≥ 5% of all
    * documents — headers, navigation chrome, and license blurbs score
    * high; original prose scores low. Complements [[repetition]]
    * (within-doc duplication) with the cross-doc axis.
    *
    * Shape at scale: one bigram explode feeds both the document-
    * frequency agg (doc-distinct grams, map-side combinable) and the
    * coverage join; the frequent set is df-thresholded RELATIVE to the
    * corpus size (integer arithmetic, 20·df ≥ N — no float boundary)
    * and is a tiny fraction of the gram vocabulary, so it broadcasts;
    * the per-doc fraction is then one shuffle to doc grain. At 100 TB
    * the df table is the only unbounded relation and it shuffles on
    * the gram key — the same collision-bounded shape as every
    * shingle-family op. */
  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale.maybeBroadcast
    val grams = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(toks) >= 2 THEN
               transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))
             ELSE array() END""")).as("gram")))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val frequent = grams.distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("dfc"))
      .crossJoin(broadcast(nDocs))
      .filter(col("dfc") * 20 >= col("n"))
      .select(col("gram"), lit(1L).as("is_common"))
    grams.join(maybeBroadcast(frequent), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_common"), lit(0L))).as("n_common"),
        round(sum(coalesce(col("is_common"), lit(0L))).cast("double") /
          count(lit(1)), 6).as("boilerplate_fraction"))
      .orderBy(col("doc_id"))
  }

  /** Per-document character-distribution Shannon entropy (bits) — the
    * cheap gibberish/boilerplate detector training pipelines run next
    * to length and stopword ratios: natural text sits in a narrow
    * entropy band, while base64 blobs, repeated padding, and binary
    * spill fall far outside it. One explode + two aggs, all keyed by
    * doc_id — fully map-side-combinable, no global state. Entropy is
    * computed as log2(n) − Σc·log2(c)/n over per-char counts c, so
    * the only floating ops are the final logs (rounded before output
    * for cross-engine stability). */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val chars = Tables.documents(spark, dir)
      // regexp '[\s\S]' (not '.') so newlines count as characters too;
      // same spelling evaluates identically in the DuckDB oracle
      .select(col("doc_id"),
        explode(expr(raw"regexp_extract_all(text, '[\\s\\S]', 0)")).as("ch"))
    chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_chars_total"),
        count(lit(1)).as("n_distinct_chars"),
        round(
          (log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c"))) /
            log(lit(2.0)), 6).as("entropy_bits"))
      .orderBy(col("doc_id"))
  }

  /** Log₂-bucketed document-length histogram — the corpus-profiling
    * pass run before choosing truncation/packing lengths: one map-side
    * bucket projection + one tiny agg. */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(floor(log2(length(col("text")).cast("double"))).cast("long").as("log2_len"))
      .groupBy(col("log2_len"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("log2_len"))

  /** Normalized-content fingerprint + duplicate-group size: md5 over
    * lowercased text with punctuation/whitespace collapsed. The window
    * count is the "how many share my fingerprint" signal dedup uses. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fp.as("fp"))
      .withColumn("n_same_fp", count(lit(1)).over(byFp))
      .orderBy(col("doc_id"))
  }

  /** PII redaction — the scrub pass a corpus runs before training:
    * emails then phone numbers replaced by typed placeholders, with
    * per-doc match counts for the removal audit. The synthetic corpus
    * carries no PII, so the query decorates each doc with a
    * deterministic contact line first (same construction on the oracle
    * side) — the operator under test is the scrubber, the decoration is
    * its fixture. Everything is codegen'd regexp work in one
    * projection; the md5 of the scrubbed text makes exact output
    * equality cheap to gate. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val decorated = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit("."))
    Tables.documents(spark, dir)
      .select(col("doc_id"), decorated.as("raw"))
      .select(col("doc_id"),
        // Column-API regexp functions take the pattern verbatim — the
        // expr() route would strip the \+ / \. escapes in SQL parsing
        size(regexp_extract_all(col("raw"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide top bigrams — the n-gram frequency table that seeds
    * tokenizer merges and LM feature vocabularies: explode each doc's
    * adjacent token pairs, one count agg, deterministic top-25. The
    * explode fans out map-side; the only shuffle is the (w1,w2) count
    * agg with map-side partials, and the top-k is TakeOrdered — no
    * global sort at any corpus size. */
  def topBigrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(25)

  /** Portable count-min sketch (Cormode & Muthukrishnan 2005) for
    * corpus term frequency — the third member of the oracle-gated
    * sketch family (with Relational.qHllPortable / qQuantileSketch):
    * d=3 salted md5 hash rows × w=512 counters, all exact integers, so
    * the sketch state and the point estimates hash-match DuckDB. The
    * report probes the exact top-10 tokens and shows estimate vs truth
    * (CMS never undercounts; overcount ≤ collisions' mass).
    *
    * Shape at scale: the sketch is a 1536-group map-side-combinable agg
    * — constant memory regardless of corpus size, the whole point of
    * CMS; the exact top-10 anchor (one token agg + TakeOrdered) exists
    * only to report the error and would be dropped in a real deploy.
    * Probing joins the 10×3 probe cells against the broadcast 1536-row
    * sketch. */
  private def cmsCellExpr(i: Int) =
    expr(s"CAST(conv(substr(md5(concat('$i:', w)), 1, 15), 16, 10) AS BIGINT) % 512")

  /** The (row_i, cell, cnt) CMS counter table for an arbitrary
    * single-column ("w", string) token relation — the mergeable sketch
    * state: counters of A ∪ B = sum-merge of A's and B's counters
    * (Spark's map-side partial sum), which a spec asserts. */
  private[graft] def cmsSketch(toks: DataFrame): DataFrame = toks
    .select(posexplode(array((0 until 3).map(cmsCellExpr): _*)).as(Seq("row_i", "cell")))
    .groupBy(col("row_i"), col("cell")).agg(count(lit(1)).as("cnt"))

  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w")))
    val sketch = cmsSketch(toks)
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_c"))
      .orderBy(col("exact_c").desc, col("w")).limit(10)
    top
      .select(col("w"), col("exact_c"),
        posexplode(array((0 until 3).map(cmsCellExpr): _*)).as(Seq("row_i", "cell")))
      .join(broadcast(sketch), Seq("row_i", "cell"))
      .groupBy(col("w"), col("exact_c"))
      .agg(min(col("cnt")).as("cms_estimate"))
      .withColumn("overcount", col("cms_estimate") - col("exact_c"))
      .orderBy(col("exact_c").desc, col("w"))
  }

    /** Per-source Jensen–Shannon divergence from the corpus unigram
    * distribution — the mix-drift metric a corpus build monitors per
    * ingest source: a source whose token distribution diverges from
    * the blend is either a new domain (keep, reweight) or garbage
    * (quarantine); the JS value (0..ln 2) is symmetric and finite even
    * on disjoint vocabularies, unlike raw KL.
    *
    * Shape at scale: one (source, token) count agg (map-side
    * combinable), one token-grain corpus agg joined back on the token
    * key, then a per-source sum — the same two-bounded-shuffle shape
    * as [[tfidf]]. Zero-count terms contribute exactly their m-side
    * mass via the closed form (summing only observed (source, token)
    * pairs plus a per-source correction), so no vocabulary×source
    * dense fan-out ever materializes. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"),
        explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w"))
    val st = graft.Caches.persistTracked(
      tok.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c")))
    val sTot = st.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val corpus = st.groupBy(col("w")).agg(sum(col("c")).as("cc"))
    val cTot = corpus.agg(sum(col("cc")).as("nc"))
    // p = within-source prob, q = corpus prob, m = (p+q)/2.
    // JS = 0.5·Σ p·ln(p/m) + 0.5·Σ q·ln(q/m); tokens absent from the
    // source contribute 0.5·q·ln(2) — folded in as ln2·(1 − seen q
    // mass) so only observed pairs are summed.
    val joined = st.join(sTot, "source").join(corpus, "w").crossJoin(broadcast(cTot))
      .withColumn("p", col("c") / col("ns"))
      .withColumn("q", col("cc") / col("nc"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .groupBy(col("source"))
      .agg(
        sum(col("p") * log(col("p") / col("m"))).as("kl_pm"),
        sum(col("q") * log(col("q") / col("m"))).as("kl_qm_seen"),
        sum(col("q")).as("q_seen"))
    joined
      .withColumn("js", round(
        (col("kl_pm") + col("kl_qm_seen") + (lit(1.0) - col("q_seen")) * log(lit(2.0))) / 2, 6))
      .select(col("source"), col("js"))
      .orderBy(col("source"))
  }

  /** Per-doc n-gram novelty — the redundancy-growth telemetry of a
    * crawl: a doc's novelty is the fraction of its DISTINCT bigrams
    * whose corpus-wide first appearance (min doc_id — ingest-order
    * proxy) is this doc. When the marginal docs' novelty flatlines,
    * additional crawl is buying pure duplication — the saturation
    * curve that decides when to stop ingesting a source.
    *
    * Shape at scale: doc-distinct grams → min-doc agg on the gram key
    * (map-side combinable) → join back on the same gram key (no
    * second shuffle of the gram relation under co-partitioning) →
    * doc-grain agg. Two bounded shuffles, no window, no global sort;
    * the gram relation is the only unbounded one and it shuffles on
    * the collision-bounded gram key like every shingle-family op. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(toks) >= 2 THEN
               transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))
             ELSE array() END""")).as("gram"))
        .distinct())
    val first = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_grams"), 6))
      .orderBy(col("doc_id"))
  }

  /** Yule's K vocabulary-richness characteristic (Yule 1944) per doc —
    * the repetitiveness-of-VOCABULARY axis ([[repetition]] measures
    * adjacent repeats; K measures whether the doc leans on few types
    * regardless of position, the signature of templated/boilerplate
    * text): K = 10⁴·(Σ tf² − N)/N² over the token frequency spectrum.
    * Σ tf² and N are exact integers, so K is a single exact-input
    * division — no float accumulates across rows.
    *
    * Shape at scale: (doc, token) partial agg → per-doc agg, both
    * map-side combinable; the same first shuffle [[oovRate]] and
    * [[tfidf]] key off. */
  def yuleK(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("tf") * col("tf")).as("s2"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(lit(10000.0) * (col("s2") - col("n_tokens")) /
          (col("n_tokens") * col("n_tokens")).cast("double"), 6).as("yule_k"))
      .orderBy(col("doc_id"))

  /** Term burstiness (Church & Gale's variance-to-mean ratio) for the
    * top-20 document-frequency terms: a term with VMR ≈ 1 arrives
    * Poisson-like (function words); VMR ≫ 1 clumps into few documents
    * (topical/content words — and boilerplate, which is why dedup
    * pipelines read this table next to [[boilerplateNgrams]]). The
    * zero-count documents are IN the moments (mean and E[c²] divide
    * by the full corpus size), computed from integer Σc/Σc² — no
    * per-doc zero rows ever materialize.
    *
    * Shape at scale: one token explode → (term, doc) count agg →
    * per-term integer moment agg; the top-20 cut is a TakeOrdered on
    * the |vocab|-row table and the corpus size broadcasts back. */
  def burstiness(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val perDoc = docs
      .select(col("doc_id"),
        explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tf"),
        sum(col("c") * col("c")).as("s2"))
      .crossJoin(broadcast(nDocs))
      .withColumn("mean", col("tf") / col("n_docs").cast("double"))
      .withColumn("vmr",
        (col("s2") / col("n_docs").cast("double") - col("mean") * col("mean")) /
          col("mean"))
      .select(col("term"), col("df"), col("tf"),
        round(col("mean"), 6).as("mean_count"),
        round(col("vmr"), 6).as("burstiness"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)
  }

  /** Heaps'-law vocabulary growth: distinct-type count and token
    * count at four corpus checkpoints (¼, ½, ¾, all of the doc-id
    * order), plus the fitted Heaps exponent β from a log-log OLS over
    * the four points (V ≈ K·Nᵝ; β ≈ 0.5 for natural text, higher for
    * noisy/unbounded vocab, lower for templated corpora) — the
    * corpus-composition audit that says whether MORE data keeps
    * buying new vocabulary. The OLS runs on 6-dp-rounded decimal
    * logs (the [[graft.operators.Relational.qPriorityTrend]] moment
    * discipline), so the fit is exact arithmetic.
    *
    * Shape at scale: each term reduces to its FIRST-occurrence doc
    * (one (term) agg over the token stream — map-side combinable);
    * checkpoint vocab counts come from that |vocab|-row table joined
    * against a broadcast 4-row checkpoint list; token totals from the
    * per-doc count relation the same way. The corpus is scanned
    * once. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val maxId = docs.agg(max(col("doc_id")).as("mx"))
    val ck = maxId.select(explode(expr(
      "transform(sequence(1, 4), i -> struct(i AS q, CAST(mx * i DIV 4 AS BIGINT) AS ckpt))"))
      .as("c")).select(col("c.q").as("q"), col("c.ckpt").as("ckpt"))
    val tok = docs.select(col("doc_id"),
      explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("term"))
    val firstSeen = tok.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
    val perDoc = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
    val vocabAt = firstSeen.crossJoin(broadcast(ck))
      .filter(col("fd") <= col("ckpt"))
      .groupBy(col("q"), col("ckpt")).agg(count(lit(1)).as("vocab"))
    val tokensAt = perDoc.crossJoin(broadcast(ck))
      .filter(col("doc_id") <= col("ckpt"))
      .groupBy(col("q")).agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    // 4 rows, TWO consumers (the Heaps regression + the output join) —
    // uncached, each consumer re-derived the whole tokenize chain
    // (8 corpus scans in the final plan; the r9 boundary discipline)
    val pts = graft.Caches.persistTracked(vocabAt.join(tokensAt, Seq("q"))
      .withColumn("x", round(log(col("n_tokens").cast("double")), 6)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .withColumn("y", round(log(col("vocab").cast("double")), 6)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6))))
    val beta = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(round(((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .cast("double"), 6).as("heaps_beta"))
    pts.crossJoin(broadcast(beta))
      .select(col("q").cast("long").as("quarter"), col("ckpt"), col("n_docs"),
        col("n_tokens"), col("vocab"), col("heaps_beta"))
      .orderBy(col("quarter"))
  }

  /** Collocation extraction: top-25 adjacent-token pairs by pointwise
    * mutual information (min joint count 5) — the multi-word-unit
    * detector ("new york"-style) run before tokenizer training and
    * phrase-aware dedup; [[topBigrams]] ranks by raw count (function-
    * word pairs win), PMI ranks by ASSOCIATION. All counts are exact
    * integers; PMI is one scalar log per surviving pair.
    *
    * Shape at scale: the bigram and unigram counts are two map-side-
    * combinable aggs over one token stream; unigram totals broadcast
    * onto the ≥5-count pair table (collapsed far below |bigrams|);
    * top-k via TakeOrdered. */
  def pmiPairs(spark: SparkSession, dir: String, minCount: Int = 5,
      k: Int = 25): DataFrame = {
    val toks = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks")))
    toks.count()
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val uniTot = uni.agg(sum(col("cw")).as("nu"))
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    val biTot = toks.filter(size(col("toks")) >= 2)
      .agg(sum(size(col("toks")) - 1).cast("long").as("nb"))
    import graft.operators.Scale.maybeBroadcast
    bi
      .join(maybeBroadcast(uni.select(col("w").as("w1"), col("cw").as("cx"))), Seq("w1"))
      .join(maybeBroadcast(uni.select(col("w").as("w2"), col("cw").as("cy"))), Seq("w2"))
      .crossJoin(broadcast(uniTot)).crossJoin(broadcast(biTot))
      .select(col("w1"), col("w2"), col("cxy"),
        round(log((col("cxy") / col("nb").cast("double")) /
          ((col("cx") / col("nu").cast("double")) *
           (col("cy") / col("nu").cast("double")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** RAKE-style keyword extraction (Rose et al. 2010): candidate
    * phrases are maximal runs of non-stopword tokens (the same 6-word
    * stop set [[quality]] scores against); each word scores
    * deg(w)/freq(w), where deg sums the lengths of every phrase the
    * word appears in and freq counts its occurrences — words that
    * live in LONG phrases outrank equally-frequent words that stand
    * alone. Top 25 by (score, word). The score is an exact integer
    * rational, 6-dp via the tie-free (2·num·10⁶+den) div (2·den)
    * rule.
    *
    * Shape at scale: tokenize map-side, phrase segmentation is two
    * windows BOTH partitioned by doc (one exchange — the running
    * stopword count that assigns phrase ids, then the per-phrase
    * length), one word-grain agg (map-side combinable), TakeOrdered
    * top-k. No joins. */
  def rakeKeywords(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("phrase_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")))
      .withColumnRenamed("col", "w").withColumnRenamed("pos", "pos")
      .withColumn("is_stop",
        col("w").isin("the", "a", "of", "and", "to", "in").cast("long"))
      .withColumn("phrase_id", sum(col("is_stop")).over(wd))
      .filter(col("is_stop") === 0)
      .withColumn("phrase_len", count(lit(1)).over(wp))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("phrase_len")).as("deg"))
      .select(col("w"), col("freq"), col("deg"),
        expr("CAST((2 * deg * 1000000 + freq) div (2 * freq) AS DOUBLE) " +
          "/ 1000000.0").as("score"))
      .orderBy(col("score").desc, col("w"))
      .limit(k)
  }

  /** Code-vs-prose screen — the pretraining router that decides
    * whether a doc goes to the code pipeline, the prose pipeline, or
    * the bin: per doc the density of code-marker characters
    * (`{}();=<>[]`) over total length; a doc is code-like at ≥5%
    * density, compared as the exact integer sym·20 ≥ len (no float
    * boundary). Per source: docs, code-like docs, and the tie-free
    * micro-unit mean density — [[langid]] tells you the human
    * language, this tells you whether it's a language at all.
    *
    * Shape at scale: one map-side regexp count per doc, one
    * |sources|-group agg. */
  def codeDetection(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), length(col("text")).cast("long").as("len"),
        size(expr("regexp_extract_all(text, '[{}();=<>\\\\[\\\\]]', 0)"))
          .cast("long").as("sym"))
      .filter(col("len") > 0)
      .withColumn("r6", expr("(2 * sym * 1000000 + len) div (2 * len)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sym") * 20 >= col("len"), 1L).otherwise(0L)).as("n_code_like"),
        sum(col("r6")).as("s6"))
      .select(col("source"), col("n_docs"), col("n_code_like"),
        expr("CAST((2 * s6 + n_docs) div (2 * n_docs) AS DOUBLE) / 1000000.0")
          .as("mean_symbol_density"))
      .orderBy(col("source"))

  /** Compression-ratio proxy (the Gopher "repetitious document" family
    * of filters without a codec in the loop): per doc the ratio of
    * DISTINCT character 4-grams to total 4-gram windows — boilerplate
    * and template spam compress (low ratio), organic prose doesn't.
    * Per source: doc count, the mean per-doc ratio (per-doc ratios are
    * exact 6-dp rationals; the mean sums their integer micro-units and
    * divides ONCE, tie-free — the mm_audio_energy discipline), and the
    * count of low-diversity docs (ratio < 0.2, compared as the exact
    * integer d·5 < n — no float boundary).
    *
    * Shape at scale: the 4-gram windows never leave the row
    * (transform + array_distinct inside codegen, O(len) per doc, no
    * explode); ONE |sources|-group agg, map-side combinable. */
  def compressionProxy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 4)
      .select(col("source"),
        (length(col("text")) - 3).cast("long").as("n4"),
        expr("""CAST(size(array_distinct(transform(
            sequence(0, length(text) - 4),
            i -> substr(text, i + 1, 4)))) AS BIGINT)""").as("d4"))
      .withColumn("r6", expr("(2 * d4 * 1000000 + n4) div (2 * n4)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("r6")).as("s6"),
        sum(when(col("d4") * 5 < col("n4"), 1L).otherwise(0L))
          .as("n_low_diversity"))
      .select(col("source"), col("n_docs"),
        expr("CAST((2 * s6 + n_docs) div (2 * n_docs) AS DOUBLE) / 1000000.0")
          .as("mean_distinct_ratio"),
        col("n_low_diversity"))
      .orderBy(col("source"))

  /** Pairwise bigram-vocabulary Jaccard between sources — the
    * corpus-mixing diagnostic read beside [[sourceDivergence]]'s JS
    * view: JS weighs by token MASS, this weighs by phrase MEMBERSHIP,
    * so a source whose words all exist elsewhere but combine
    * differently scores low here and high there. The unit is the word
    * BIGRAM (unigram membership saturates on any bounded vocabulary —
    * on this corpus every source carries the whole word list, all
    * pairs ≈ 1.0; bigram sets discriminate, measured 0.54–0.70).
    * |A∩B| comes from one self-join of the (source, bigram) distinct
    * relation on the bigram key; |A∪B| = |A| + |B| − |A∩B| in
    * integers, and the Jaccard division is the tie-free non-negative
    * rounding formula — no floats until the final cast.
    *
    * Shape at scale: the distinct relation is phrase-vocabulary-
    * bounded per source; the self-join shuffles on the bigram key
    * (collision-bounded — a bigram pairs only the ≤|sources| sources
    * containing it), and the output is the |sources|² pair table. No
    * window, no global sort, no driver state. */
  def jaccardSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sw = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("source"),
          expr(raw"regexp_extract_all(lower(text), '\\S+', 0)").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as("w"))
        .distinct())
    val sizes = sw.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val inter = sw.as("a").join(sw.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("source").as("source_a"), col("nv").as("na")), "source_a")
      .join(sizes.select(col("source").as("source_b"), col("nv").as("nb")), "source_b")
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .select(col("source_a"), col("source_b"), col("n_inter"), col("n_union"),
        expr("""CAST((2 * n_inter * 1000000 + n_union) div (2 * n_union)
               AS DOUBLE) / 1000000.0""").as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
