package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines (driver
  * mandate; SURVEY.md §7.5): token counting, quality scoring,
  * language-ID heuristic, and simhash fingerprinting over a text
  * column. All built-ins (regexp/HOF/xxhash64) — zero UDFs; every
  * scorer is a per-row projection, so at 100 TB these are map-only
  * passes with no shuffle at all.
  */
object TextAnalysis {

  /** Whitespace token count over normalized text. */
  def tokenCount(text: Column): Column =
    size(split(Dedup.normalized(text), " "))

  /** The SEARCH tokenizer's split pattern: maximal `[a-z0-9]` runs of
    * the lowercased text are tokens; everything else is a separator.
    * Deliberately punctuation-insensitive (a keyword probe should hit
    * "alert," and "alert!" alike) — the same token definition
    * ClickHouse's `tokenbf_v1` skipping index uses — and therefore a
    * DIFFERENT stream than the whitespace tokens BM25 ranks on
    * ([[tokenCount]]/`tokenStream`), where punctuation stays attached.
    * This exact string is part of the on-disk token-bloom contract:
    * [[graft.ops.ManifestTable]] builds per-dir token blooms over
    * `split(lower(col), TokenSplitRe)` and
    * [[graft.ops.GraftFileIndex]] recognizes the [[tokenMatch]]
    * expression tree by matching this literal. */
  val TokenSplitRe: String = "[^a-z0-9]+"

  /** Whole-token keyword search: true iff `token` appears as a
    * maximal alphanumeric run in `text` (case-insensitive). Built as
    * `array_contains(split(lower(text), TokenSplitRe), token)` — a
    * codegen'd built-in chain, and the EXACT expression shape
    * [[graft.ops.GraftFileIndex]] prunes dirs on when the manifest
    * carries a committed token bloom for the column
    * (`ManifestTable.merge(tokenBloomColumns = …)`). At 100 TB a
    * keyword probe over a token-indexed corpus touches only dirs
    * whose bloom might contain the token — the scan never sees the
    * rest. `token` must be a non-empty lowercase alphanumeric run
    * (anything else can never equal a split element). */
  def tokenMatch(text: Column, token: String): Column = {
    require(token.nonEmpty && token.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')),
      s"tokenMatch: token must be a non-empty lowercase [a-z0-9]+ run, got '$token'")
    array_contains(split(lower(text), TokenSplitRe), token)
  }

  /** ANY-of keyword search: true iff at least one of `tokens` appears
    * as a whole token in `text` — the keyword-list filter (denylist
    * scan, topic probe). Built as `arrays_overlap` over the same
    * split, and pruned by [[graft.ops.GraftFileIndex]] through the
    * committed token bloom: a dir is opened only when the bloom might
    * hold AT LEAST ONE of the tokens. AND-of-keywords needs no
    * helper — `tokenMatch(a) && tokenMatch(b)` prunes per conjunct. */
  def tokenMatchAny(text: Column, tokens: Seq[String]): Column = {
    require(tokens.nonEmpty, "tokenMatchAny: empty token list")
    tokens.foreach(t => require(
      t.nonEmpty && t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')),
      s"tokenMatchAny: tokens must be non-empty lowercase [a-z0-9]+ runs, got '$t'"))
    arrays_overlap(split(lower(text), TokenSplitRe), typedLit(tokens))
  }

  /** GOPHER-STYLE REPETITION SIGNALS (Rae et al. 2021 §A1.1) — the
    * quality-filter family that catches degenerate/templated text the
    * length/punct scorers miss. One row per document:
    *   - `n_lines` — nonempty (trimmed) line count;
    *   - `dup_line_frac_e6` — fraction of lines whose exact trimmed
    *     content repeats within the document
    *     (`(n_lines − n_distinct) / n_lines`);
    *   - `dup_line_char_frac_e6` — fraction of line characters in the
    *     REPEATED occurrences (`Σ (cnt−1)·len / Σ cnt·len`);
    *   - `top_bigram_char_frac_e6` — fraction of the tokenized text's
    *     characters covered by the single most frequent word bigram
    *     (`cnt · len(bigram) / len(tokens joined by ' ')`; ties break
    *     to the lexicographically smallest bigram).
    * All ratios are floor-quantized to integer MICRO-units via `div`
    * (truncating integer division — engine-portable exactly, the
    * q119/q208 idiom). Documents with no qualifying lines/bigrams
    * report 0.
    *
    * Scale: two per-document aggregations and one per-document window
    * (row_number → WindowGroupLimit) — every exchange is doc-keyed,
    * nothing corpus-pairwise. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lineGroups = docs
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__raw"))
      .withColumn("__content", trim(col("__raw")))
      .filter(col("__content") =!= "")
      .groupBy(col(idCol), col("__content"))
      .agg(count(lit(1)).as("__cnt"), length(col("__content")).cast("long").as("__len"))
    val lineSig = lineGroups.groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_lines"),
        count(lit(1)).as("__ndist"),
        sum((col("__cnt") - 1) * col("__len")).as("__dup"),
        sum(col("__cnt") * col("__len")).as("__tot"))
      .select(col(idCol), col("n_lines"),
        expr("CAST((1000000 * (n_lines - __ndist)) div n_lines AS BIGINT)")
          .as("dup_line_frac_e6"),
        expr("CAST((1000000 * __dup) div __tot AS BIGINT)")
          .as("dup_line_char_frac_e6"))
    val topSig = topNgramCharFracE6(docs, 2, idCol, textCol)
      .withColumnRenamed("top2gram_char_frac_e6", "top_bigram_char_frac_e6")
    docs.select(col(idCol)).distinct()
      .join(lineSig, Seq(idCol), "left_outer")
      .join(topSig, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("dup_line_frac_e6"), lit(0L)).as("dup_line_frac_e6"),
        coalesce(col("dup_line_char_frac_e6"), lit(0L)).as("dup_line_char_frac_e6"),
        coalesce(col("top_bigram_char_frac_e6"), lit(0L)).as("top_bigram_char_frac_e6"))
  }

  /** Per-document TOP-n-gram character coverage, micro-quantized:
    * `cnt · len(gram) div len(tokens joined by ' ')` for the most
    * frequent word n-gram (ties → lexicographically smallest).
    * Returns `(idCol, top{n}gram_char_frac_e6)`; docs with fewer than
    * n tokens are absent (callers coalesce to 0). Tokens are the
    * lowercased `[a-z0-9]+` runs — the [[repetitionSignals]] stream. */
  def topNgramCharFracE6(docs: DataFrame, n: Int, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"topNgramCharFracE6: n must be >= 1, got $n")
    val grams = ngramCounts(docs, n, idCol, textCol)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__c").desc, col("__g").asc)
    grams.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col(idCol),
        expr("CAST((1000000 * __c * length(__g)) div __den AS BIGINT)")
          .as(s"top${n}gram_char_frac_e6"))
  }

  /** Per-document DUPLICATE-n-gram redundancy, micro-quantized:
    * `Σ_{gram: cnt>1} (cnt−1)·len(gram) div len(tokens joined by ' ')`
    * — the characters in the REPEATED occurrences, the same
    * definition [[repetitionSignals]] uses for duplicate lines
    * (implementations of Gopher's A1.1 vary on overlap handling;
    * this one is order-free and engine-portable exactly). */
  def dupNgramCharFracE6(docs: DataFrame, n: Int, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(n >= 1, s"dupNgramCharFracE6: n must be >= 1, got $n")
    ngramCounts(docs, n, idCol, textCol)
      .groupBy(col(idCol), col("__den"))
      .agg(sum(when(col("__c") > 1, (col("__c") - 1) * length(col("__g")).cast("long"))
        .otherwise(lit(0L))).as("__dup"))
      .select(col(idCol),
        expr("CAST((1000000 * __dup) div __den AS BIGINT)")
          .as(s"dup${n}gram_char_frac_e6"))
  }

  /** `(idCol, __den, __g, __c)`: per-doc word n-gram counts over the
    * `[a-z0-9]+` token stream, with the doc's joined-token char length
    * as the shared denominator. */
  private def ngramCounts(docs: DataFrame, n: Int, idCol: String,
                          textCol: String): DataFrame = {
    val toks = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "), " "),
      t => t =!= "")
    docs.select(col(idCol), toks.as("__ts"))
      .withColumn("__den", length(array_join(col("__ts"), " ")).cast("long"))
      .where(size(col("__ts")) >= n)
      .select(col(idCol), col("__den"), explode(transform(
        sequence(lit(0), size(col("__ts")) - n),
        i => array_join(slice(col("__ts"), i + 1, lit(n)), " "))).as("__g"))
      .groupBy(col(idCol), col("__den"), col("__g"))
      .agg(count(lit(1)).as("__c"))
  }

  /** BPE-ish subword count: runs of alphanumerics or single
    * non-alphanumeric marks (≈ a GPT-style pre-tokenizer's word/punct
    * split; the real merge table isn't needed for a count heuristic). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = {
    val t = Dedup.normalized(text)
    when(length(t) === 0, lit(0.0))
      .otherwise(length(regexp_replace(t, "[a-z0-9 ]", "")).cast("double") /
        length(t).cast("double"))
  }

  /** English stopword list used by the quality scorer and lang-ID
    * (fixed: part of the operator contract, mirrored in oracle SQL). */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(Dedup.normalized(text), " ")
    when(size(toks) === 0, lit(0.0))
      .otherwise(hitCount(toks, EnStopwords).cast("double") / size(toks).cast("double"))
  }

  /** Mean token length (characters excluding spaces / token count). */
  def meanTokenLen(text: Column): Column = {
    val t = Dedup.normalized(text)
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(t, " ", "")).cast("double") / n.cast("double"))
  }

  /** HTML boilerplate removal — the web-scrape cleaning step of a
    * pre-training text pipeline (trafilatura's job, reduced to the
    * deterministic regex core a cross-engine gate can pin): drop
    * `<script>`/`<style>` blocks and comments wholesale, strip the
    * remaining tags, unescape the five predefined HTML entities
    * (`&amp;` LAST, so `&amp;lt;` correctly yields the literal
    * `&lt;`), and collapse runs of whitespace. Map-only — codegen'd
    * string expressions over the scan, no UDF, nothing shuffles.
    *
    * Regex notes for engine parity (the oracle runs the SAME chain in
    * DuckDB/RE2 against Spark's java.util.regex): only `(?s)`,
    * non-greedy `.*?`, and explicit character classes are used —
    * semantics identical in both engines. `\s` is AVOIDED on purpose:
    * Java's includes U+000B, RE2's does not, so a vertical tab in a
    * document would silently diverge; the explicit class can't. */
  def stripHtml(html: Column): Column = {
    // Closed blocks first (non-greedy), then a fallback that strips an
    // UNCLOSED opener to end-of-string: truncated/malformed HTML (a
    // <script> whose close tag was cut off) must not leak the script
    // body into the cleaned text via the generic tag-strip below.
    // Greedy `(?s).*` with no `$` anchor on purpose — it consumes to
    // end-of-text in both engines, while Java's `$` (before a final
    // newline) and RE2's `$` (end of text) disagree.
    val noScript = regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<script[^>]*>.*", " ")
    val noStyle = regexp_replace(
      regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " "),
      "(?s)<style[^>]*>.*", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // Tag-shaped spans only: the char after '<' must start a tag name
    // (letter, '/', '!'), so a literal "x < 3 and y > 0" in prose is
    // NOT eaten as a pseudo-tag — a bare '<[^>]+>' destroys any
    // such span wholesale, invisibly to a same-regex oracle.
    val noTags = regexp_replace(noComment, "<[/!]?[A-Za-z][^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(unescaped, "[ \\t\\n\\r\\f]+", " "))
  }

  /** Tag count of raw HTML (tag-shaped spans, same shape
    * [[stripHtml]] strips — script/style openers included; the
    * boilerplate-density numerator). */
  def htmlTagCount(html: Column): Column =
    regexp_count(html, lit("<[/!]?[A-Za-z][^>]*>")).cast("long")

  /** Anchor count of raw HTML (link density — the classic
    * boilerplate-page signal: navigation chrome is mostly links).
    * Accepts any whitespace, '/', or '>' after the tag name —
    * prettified markup routinely breaks the line after `<a`. */
  def htmlLinkCount(html: Column): Column =
    regexp_count(html, lit("(?i)<a[ \\t\\n\\r\\f/>]")).cast("long")

  /** Invisible-character class: zero-widths (ZWSP/ZWNJ/ZWJ), the BOM
    * (which doubles as ZWNBSP mid-text), the soft hyphen, and the C0
    * controls EXCEPT tab/newline/carriage-return. Copy-pasted web
    * text is full of these; they poison exact-hash dedup (two
    * visually identical documents hash apart), inflate token counts,
    * and leak into training text as garbage codepoints. Explicit
    * code-point class — identical under java.regex and RE2, so the
    * oracle runs the same pattern (the stripHtml parity discipline). */
  private val InvisibleClass =
    "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}\\x{00AD}\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}]"

  /** Strip invisible characters (see [[InvisibleClass]]). Map-only
    * codegen'd regexp, no shuffle. */
  def stripInvisible(text: Column): Column =
    regexp_replace(text, InvisibleClass, "")

  /** How many invisible characters the text carries — the detector
    * half (quarantine-report metric) of [[stripInvisible]]. */
  def invisibleCount(text: Column): Column =
    regexp_count(text, lit(InvisibleClass)).cast("long")

  /** All character trigrams of an ALREADY-NORMALIZED text column, in
    * position order (occurrences, not distinct — coverage weights
    * repeated trigrams). Map-only HOF; empty array below 3 characters.
    *
    * Takes the normalized column (project `Dedup.normalized(text)` as
    * its own alias first), NOT raw text: this expression references
    * its input once per trigram position inside the `transform`
    * lambda, so an embedded normalization subtree would re-run the
    * whole-document regexp per position — O(len²) per document, the
    * round-2 expression-tree recompute class. A projected attribute
    * is a row-value read; the multi-reference of a non-cheap alias
    * also keeps CollapseProject from inlining it back. */
  def charTrigrams(normalized: Column): Column =
    when(length(normalized) >= 3,
      transform(sequence(lit(1), length(normalized) - 2),
        i => normalized.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** Composite [0,1] quality score — the standard pre-training
    * heuristics (length, punctuation noise, stopword density, token
    * shape), equal-weighted. Deterministic double arithmetic, written
    * identically in the oracle SQL.
    *
    * NOTE this single-Column form re-derives the normalize/tokenize
    * subtree inside each component (Column expressions are trees, not
    * CSE'd values) — fine for one-off use; pipelines that also want
    * the component ratios should use [[withTextFeatures]], which
    * materializes the normalization once per row. */
  def qualityScore(text: Column): Column =
    lit(0.25) * least(lit(1.0), tokenCount(text).cast("double") / lit(50.0)) +
    lit(0.25) * (lit(1.0) - least(lit(1.0), punctRatio(text) * lit(5.0))) +
    lit(0.25) * least(lit(1.0), stopwordRatio(text) * lit(5.0)) +
    lit(0.25) * least(lit(1.0), meanTokenLen(text) / lit(8.0))

  /** [[qualityScore]] assembled from already-computed components —
    * identical arithmetic shape (association order matters for
    * bit-exact oracle parity). */
  def qualityScoreFrom(nTokens: Column, punct: Column,
                       stopword: Column, meanLen: Column): Column =
    lit(0.25) * least(lit(1.0), nTokens.cast("double") / lit(50.0)) +
    lit(0.25) * (lit(1.0) - least(lit(1.0), punct * lit(5.0))) +
    lit(0.25) * least(lit(1.0), stopword * lit(5.0)) +
    lit(0.25) * least(lit(1.0), meanLen / lit(8.0))

  /** All text-quality features from ONE normalization pass (the
    * round-3 verdict's q24 fix): materializes `normalized(text)` and
    * its token array once as named columns — CollapseProject keeps
    * non-cheap multi-referenced aliases, so each evaluates once per
    * row — then builds every scorer from them. The single-Column
    * scorers above would re-run the normalize/split subtree once per
    * scorer per row (~10× for the q24 column set).
    *
    * `mean token length` uses the arithmetic identity
    * `chars_without_spaces = length(t) - (n_tokens - 1)` (exact
    * because `t` is single-space normalized and trimmed) instead of a
    * third regexp_replace; the integer is identical, so the double
    * ratio is bit-identical to [[meanTokenLen]] (spec-asserted).
    *
    * Appends: n_tokens, n_subtokens, punct_ratio, stopword_ratio,
    * quality. Per-row projection — zero shuffle at any scale. */
  def withTextFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col("__t")
    val toks = col("__toks")
    val meanLen = when(size(toks) === 0, lit(0.0))
      .otherwise((length(t) - (size(toks) - lit(1))).cast("double") /
        size(toks).cast("double"))
    docs
      .withColumn("__t", Dedup.normalized(col(textCol)))
      .withColumn("__toks", split(t, " "))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_subtokens", regexTokenCount(col(textCol)).cast("long"))
      .withColumn("punct_ratio",
        when(length(t) === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "[a-z0-9 ]", "")).cast("double") /
            length(t).cast("double")))
      .withColumn("stopword_ratio",
        when(size(toks) === 0, lit(0.0))
          .otherwise(hitCount(toks, EnStopwords).cast("double") /
            size(toks).cast("double")))
      .withColumn("quality",
        qualityScoreFrom(col("n_tokens"), col("punct_ratio"),
          col("stopword_ratio"), meanLen))
      .drop("__t", "__toks")
  }

  /** Per-language marker words for the lang-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** Argmax with earlier-entry tie-break: lang_i wins if its score is
    * >= every later score and > every earlier score (strictly, since
    * earlier already won ties). Each score Column is referenced in
    * ~2·|langs| comparison arms — callers MUST pass cheap columns
    * (named attributes), or the score subtree is recomputed per arm. */
  private def argmaxLang(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.foldRight(lit(scores.head._1)) {
      case (((lang, s), i), elseCol) =>
        val beatsEarlier = scores.take(i).map { case (_, s2) => s > s2 }
        val beatsLater = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
        val cond = (beatsEarlier ++ beatsLater).reduceOption(_ && _).getOrElse(lit(true))
        when(cond, lit(lang)).otherwise(elseCol)
    }

  /** N-gram/stopword-profile language ID: argmax of marker-word hit
    * counts, first-listed language wins ties (so 'en' on all-zero).
    * A real system would use char n-gram profiles; the marker-argmax
    * form is the portable deterministic core of that approach.
    *
    * ONE-EXPRESSION FORM — fine for a single ad-hoc projection, but
    * the `toks` subtree is referenced once per language and each
    * score ~8× by the argmax arms, so the normalize/split tree is
    * recomputed ~25-40× per row (the round-4 bench caught q25 at
    * 2.45 s for exactly this). Corpus-scale callers use
    * [[withLangId]], which materializes toks and scores as named
    * columns computed once per row. */
  def langId(text: Column): Column = {
    val toks = split(Dedup.normalized(text), " ")
    argmaxLang(LangMarkers.map { case (lang, words) => lang -> hitCount(toks, words) })
  }

  /** Corpus-scale language ID: the [[withTextFeatures]] pattern.
    * Materializes the token array and the five per-language scores as
    * named columns (CollapseProject keeps non-cheap multi-referenced
    * aliases as separate projections), then argmaxes over the named
    * score attributes — every expensive subtree is computed exactly
    * once per row regardless of how many comparison arms read it.
    * Per-row projection, zero shuffle at any scale. */
  def withLangId(docs: DataFrame, textCol: String = "text",
                 outCol: String = "pred_lang"): DataFrame = {
    val toks = col("__lid_toks")
    val withScores = LangMarkers.foldLeft(
      docs.withColumn("__lid_toks", split(Dedup.normalized(col(textCol)), " "))) {
      case (df, (lang, words)) =>
        df.withColumn(s"__lid_s_$lang", hitCount(toks, words))
    }
    val named = LangMarkers.map { case (lang, _) => lang -> col(s"__lid_s_$lang") }
    withScores.withColumn(outCol, argmaxLang(named))
      .drop("__lid_toks" +: LangMarkers.map { case (l, _) => s"__lid_s_$l" }: _*)
  }

  /** MIXED-LANGUAGE DETECTION — the doc-level flag a multilingual
    * curation pass sets before routing: language ID over the WHOLE
    * document hides a bilingual page (boilerplate in one language,
    * body in another — the classic scraped-site shape), so the text
    * is chunked ([[graft.ext.Curate.chunk]] geometry) and each chunk
    * classified independently via [[withLangId]]'s one-pass scoring;
    * a doc whose chunks disagree is `is_mixed`. Per doc: chunk count,
    * distinct predicted languages, the DOMINANT language (most
    * chunks, ties to the alphabetically first — deterministic), and
    * its chunk count. One doc-keyed exchange; chunking and scoring
    * are map-only. */
  def mixedLanguage(docs: DataFrame, chunkChars: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val ch = graft.ext.Curate.chunk(docs, chunkChars, textCol, idCol)
    val tagged = withLangId(ch, "chunk", "clang")
    val per = tagged.groupBy(col(idCol), col("clang"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("n").desc, col("clang"))
    per.withColumn("__r", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_langs"),
        max(when(col("__r") === 1, col("clang"))).as("dom_lang"),
        max(when(col("__r") === 1, col("n"))).as("dom_n"))
      .withColumn("is_mixed", col("n_langs") > 1)
  }

  /** Smooth inverse document frequency: ln((n+1)/(df+1)) + 1 — the
    * sklearn-style smoothing that keeps corpus-wide terms positive.
    * Float-valued, so fine for ranking/filtering inside one engine
    * but NOT for cross-engine hash gates (java Math.log vs libm can
    * differ in the last ulp); the driver-gated query (q56) ranks by
    * the integer tf/df ratio instead. */
  def idf(df: Column, nDocs: Column): Column =
    log((nDocs.cast("double") + 1.0) / (df.cast("double") + 1.0)) + 1.0

  /** Top-`k` characteristic terms per document by rare-term weight —
    * the TF-IDF keyword-extraction shape (vocabulary pruning, topic
    * sniffing, dedup explanation) as three hash aggregates and one
    * per-doc top-k:
    *
    *   1. explode tokens → per-(doc, term) counts (tf) — map-side
    *      combine collapses repeats before the shuffle;
    *   2. per-term document frequency (df) = one more hash agg over
    *      the (doc, term) rows (already distinct per doc);
    *   3. weight = (tf·1e6) div df, integer fixed-point — monotone in
    *      the tf/df ratio, engine-exact (see [[idf]] for why the
    *      float log form can't feed a cross-engine hash gate; rank
    *      by [[idf]]·tf when portability isn't required);
    *   4. per-doc top-k by (weight desc, term asc) — a rank-k window
    *      over the doc-partitioned weights.
    *
    * Scale: the df table is vocabulary-sized; the tf↔df join
    * shuffles on term — at 100 TB both sides are already term-keyed
    * from their aggregates, so AQE plans it without an extra
    * exchange. No step touches the raw text twice. The tf frame is
    * persisted via [[graft.ops.Intermediates.shared]] (it feeds both
    * the df agg and the join); its blocks are freed at the harness's
    * next `Intermediates.sweep`. */
  def topTermsTfIdf(docs: DataFrame, k: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(split(Dedup.normalized(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // Both df (aggregated again) and the join read tf — as a plain
    // plan the explode+count corpus pass would run twice (the
    // self-join/recompute class; same fix as
    // Similarity.nearDupPairsIvf's membership table).
    val tf = graft.ops.Intermediates.shared(
      terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score_e6").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("score_e6", expr("(tf * CAST(1000000 AS BIGINT)) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"), col("score_e6"))
  }

  /** Distinct-token xxhash64 array — materialize this as a named
    * column and feed it to [[simhashFromHashes]]: the fingerprint
    * references it 64 times, and an inline expression would be
    * re-hashed per bit (the round-2 bench caught that at 10 s/query;
    * a named non-cheap alias is computed once per row). */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(split(Dedup.normalized(text), " ")), t => xxhash64(t))

  /** 64-bit simhash fingerprint over a materialized token-hash array:
    * bit j of the fingerprint is the sign of sum over tokens of ±1
    * for that bit. Near-identical documents land within a few bits of
    * Hamming distance (spec-verified); banded over 4×16-bit chunks it
    * gives the classic simhash near-dup join. Not oracle-expressible
    * (xxhash64 is Spark-specific) → rows-only driver check + spec.
    */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Convenience one-expression form (fine for single use; prefer
    * [[simhashCorpus]] when fingerprinting a corpus). */
  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Corpus-scale simhash as an explode + hash-aggregate plan: one row
    * per (doc, token-hash), 64 `sum(±1)` bit-vote aggregates, then a
    * cheap projection packs the signs into the fingerprint. Same
    * rationale as `Dedup.minhashSignatures`: everything codegen'd,
    * map-side partial aggregation, no HOF re-evaluation of the
    * tokenize/hash subtree. Output: (idCol, fingerprint). */
  def simhashCorpus(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val hashed = docs
      .select(col(idCol), explode(tokenHashes(col(textCol))).as("__h"))
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"__v$j")
    }
    val packed = (0 until 64).map { j =>
      when(col(s"__v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("fingerprint"))
  }

  /** Ordered (non-distinct, position-preserving) token k-gram array —
    * the winnowing input. Same shifted-zip construction as
    * `Dedup.shinglesFromToks` but WITHOUT the distinct: winnowing
    * needs the gram SEQUENCE. Pass a materialized token column. */
  def orderedGramsFromToks(toks: Column, k: Int = 3): Column = {
    val zipped = (1 until k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), size(toks)), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= k, filter(zipped, x => x.isNotNull))
      .otherwise(array().cast("array<string>"))
  }

  /** Winnowing selection over a materialized gram-hash sequence: the
    * distinct minima of every `w`-length window (Schleimer/Wilkerson/
    * Aiken "winnowing" — the rolling-hash fingerprint family; the
    * declarative form hashes each gram directly instead of rolling
    * the hash incrementally, which changes cost constants, not the
    * selected fingerprints). Documents with fewer than `w` windows
    * contribute their single global min. */
  def winnowFromHashes(hashes: Column, w: Int = 4): Column = {
    val m = size(hashes) - (w - 1)
    when(size(hashes) === 0, array().cast("array<bigint>"))
      .when(m <= 0, array(array_min(hashes)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), m - 1), j => array_min(slice(hashes, j + 1, lit(w))))))
  }

  /** Winnowing document fingerprints over a corpus: (idCol,
    * fingerprints: array<bigint>). The selection guarantee is LOCAL:
    * any shared token run of length ≥ k+w-1 shares at least one
    * fingerprint — so quotes/boilerplate/partial plagiarism between
    * documents are detectable from fingerprint intersection, which
    * global-similarity schemes (minhash jaccard, simhash) miss when
    * the shared span is a small fraction of both docs. In particular
    * a token-aligned excerpt's fingerprint set is a SUBSET of its
    * source's (every excerpt window is a source window — a theorem,
    * gated by q53). Per-row projection; at scale, explode to
    * (fingerprint, doc) and equi-join to find sharing pairs — the
    * q18 band-join shape. */
  def winnowCorpus(docs: DataFrame, k: Int = 3, w: Int = 4,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__toks", split(Dedup.normalized(col(textCol)), " "))
      .withColumn("__grams", orderedGramsFromToks(col("__toks"), k))
      .withColumn("__h", transform(col("__grams"), g => xxhash64(g)))
      .select(col(idCol), winnowFromHashes(col("__h"), w).as("fingerprints"))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Simhash near-duplicate pairs with Hamming distance ≤ `maxHamming`
    * (≤ 3): the 64-bit fingerprint splits into 4 × 16-bit chunks; by
    * pigeonhole, two fingerprints within Hamming 3 share at least one
    * chunk, so a chunk equi-join finds ALL qualifying pairs — the
    * classic simhash dedup layout (banded like minhash, but with a
    * recall GUARANTEE instead of a probability). Candidates carry only
    * (ids, fingerprints); verification is one bit_count.
    *
    * 16-bit chunks (not 8): on a clustered corpus narrow chunks
    * collide pervasively and the candidate join goes quadratic — the
    * round-2 bench measured 8-bit chunks at 24 s/5 k docs. Chunk
    * width is the recall-horizon vs candidate-volume dial; 4×16 is
    * the standard production point. */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    simhashNearDupFromFp(simhashCorpus(docs, textCol, idCol), maxHamming, idCol)

  /** [[simhashNearDup]] over an already-computed (idCol, fingerprint)
    * frame — lets callers share one fingerprint pass across the
    * banded join and other consumers (e.g. q30's in-plan brute-force
    * recall check). */
  def simhashNearDupFromFp(fp: DataFrame, maxHamming: Int = 3,
                           idCol: String = "doc_id"): DataFrame = {
    require(maxHamming <= 3, s"4x16-bit chunking guarantees recall only for hamming <= 3, got $maxHamming")
    val chunks = array((0 until 4).map { c =>
      struct(lit(c).as("band"),
        shiftright(col("fingerprint"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))
    }: _*)
    val banded = fp.select(col(idCol).as("__id"), col("fingerprint"),
      explode(chunks).as("__b"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.__b") === col("b.__b") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.fingerprint").as("__fa"), col("b.fingerprint").as("__fb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("__fa"), col("__fb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exploded multiset token stream (idCol, tok) over normalized
    * whitespace tokens — the shared front end of the corpus-level
    * statistics below. One map-only explode; empty tokens dropped. */
  def tokenStream(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Per-document document-frequency profile — a rare-token quality
    * signal: documents dominated by tokens no other document uses
    * (OCR noise, mojibake, boilerplate IDs) profile as hapax-heavy.
    * For each document's DISTINCT tokens: n_distinct, sum_df (sum of
    * each token's corpus document frequency), hapax_cnt (tokens with
    * df = 1 — this document is their only home), and the flag
    * hapax_cnt·4 > n_distinct (> 25 % hapax) as an integer
    * cross-multiply — every gated value an exact integer.
    *
    * Shape: explode → distinct → df hash-agg → tok equi-join back →
    * per-doc hash-agg. The tok join is vocabulary-keyed and
    * stopword-skewed at 100 TB — exactly the AQE-skew-join /
    * salting case ([[graft.ops.Scale]]'s recipe); df itself is
    * map-side combinable. Nothing is quadratic. */
  def docFrequencyProfile(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val d = tokenStream(docs, idCol, textCol).distinct()
    val df = d.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    d.join(df, Seq("tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(col("__df")).as("sum_df"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("hapax_cnt"))
      .withColumn("low_quality", col("hapax_cnt") * 4 > col("n_distinct"))
  }

  /** Total-variation distance between the unigram distributions of
    * two corpus sides (mixture-drift monitoring: did the token
    * distribution of shard A drift from shard B / yesterday's
    * snapshot?). With per-token counts aᵢ, bᵢ and totals Nₐ, N_b,
    *
    *   TV = ½ Σᵢ |aᵢ/Nₐ − bᵢ/N_b| = Σᵢ |aᵢ·N_b − bᵢ·Nₐ| / (2·Nₐ·N_b)
    *
    * — clearing denominators keeps the summand an exact integer, so
    * tv_num is bit-portable (the q69 posture). The convenience
    * tv_e9 divides the exact integers in double, mirrored
    * expression-for-expression. Integer ceiling: aᵢ·N_b ≤ Nₐ·N_b
    * must stay below 2⁶³ — fine to ~3·10⁹ tokens per side; past
    * that, production would sum the normalized |p−q| in DECIMAL(38)
    * or double (documented, like MergeWriter's ceiling).
    *
    * Shape: one conditional-sum hash-agg per token (map-side
    * combinable), a broadcast of the 1-row totals, one final agg —
    * no join on data keys at all. */
  def unigramTvDrift(docs: DataFrame, side: Column,
                     textCol: String = "text"): DataFrame = {
    val t = docs.select(side.cast("boolean").as("__a"),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = t.groupBy(col("tok")).agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("cnt_b"))
    val tot = counts.agg(sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
    counts.crossJoin(broadcast(tot))
      .agg(
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("n_vocab"),
        sum(abs(col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a"))).as("tv_num"))
      .select(col("n_a"), col("n_b"), col("n_vocab"), col("tv_num"),
        floor(col("tv_num").cast("double") /
            (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")) * lit(1e9))
          .cast("long").as("tv_e9"))
  }

  /** BM25-family per-term relevance contribution, in 1e6 fixed point.
    *
    * Cross-engine exactness: every operation here is IEEE-754 double
    * +,-,*,/ on identical inputs (integers < 2^53 and decimal
    * literals, both of which parse to identical doubles everywhere),
    * and those four ops are correctly rounded — so the oracle
    * computing the LITERALLY same expression gets bit-identical
    * doubles and the e6 floor cannot straddle. That rules the
    * standard `ln` idf out (libm vs libm drifts in the last ulp);
    * this uses Robertson's raw odds idf, (N − df + ½)/(df + ½),
    * WITHOUT the log — a documented variant: log is monotone, so
    * single-term rankings agree with classic BM25 and multi-term
    * score sums weight rare terms more sharply. k1 = 1.2, b = 0.75
    * (the textbook constants). Inputs: tf (term freq in doc), df
    * (docs containing term), len (doc token count), nn (corpus doc
    * count), total_len (corpus token count). MUST stay literally in
    * sync with q103's oracle SQL. */
  val Bm25ContribE6: String =
    "CAST(floor(1000000.0 * ((((nn - df) + 0.5) / (df + 0.5)) * " +
      "((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ((len * nn) / total_len)))))) AS LONG)"

  /** Full-text relevance search: BM25-variant top-k over the token
    * stream ([[Bm25ContribE6]] summed per document).
    *
    * The 100 TB plan: per-term stats prune to the QUERY's terms
    * before anything joins — `tf ⋈ broadcast(query ⋈ df)` touches
    * only rows for queried terms (an inverted-index posting-list
    * fetch, as a broadcast hash join) — then one doc-keyed join
    * attaches lengths (bucketable on doc id), one hash aggregate
    * sums contributions, and TakeOrderedAndProject keeps k rows.
    * Corpus-wide scalars (N, total length) ride a broadcast 1-row
    * frame. Nothing corpus-sized ever shuffles on a term key. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], topK: Int = 20,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE tokenize-and-count pass: tf is materialized once
    // (Intermediates, swept at the harness's query boundary) and
    // lens / dfs / stats all derive from it — tf already holds one
    // row per (doc, term), so len = Σ tf per doc, df = row count per
    // term, and the corpus scalars are one aggregate over the same
    // frame. The naive form re-tokenized the corpus four times.
    val tf = graft.ops.Intermediates.shared(
      tokenStream(docs, idCol, textCol)
        .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf")))
    val lens = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("len"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = tf.agg(
      count_distinct(col(idCol)).as("nn"), sum(col("tf")).as("total_len"))
    val q = queryTerms.distinct.toDF("tok")
    tf.join(broadcast(dfs.join(q, Seq("tok"))), Seq("tok"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("contrib_e6", expr(Bm25ContribE6))
      .groupBy(col(idCol))
      .agg(sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col(idCol))
      .limit(topK)
  }
}
