package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators a large-scale training-data pipeline
  * needs around the dedup/similarity/quality core (driver mandate;
  * SURVEY.md §7.5): reproducible splits, deterministic sampling,
  * context-window chunking, and PII redaction.
  *
  * Everything here is a per-row projection or a bounded per-group
  * top-k — map-only (or one WindowGroupLimit) at any scale, zero UDFs.
  *
  * Determinism is the design center: splits and samples key on a
  * CONTENT-STABLE hash (`md5` of the id — identical in every engine,
  * unlike xxhash64/rand which are Spark-specific), so re-running the
  * pipeline on a grown corpus keeps every previously-assigned row in
  * its split — the property that makes train/test contamination
  * auditable at 100 TB. No RNG state, no seed plumbing, no shuffle.
  */
object Curate {

  /** Engine-portable deterministic bucket in [0, buckets): the first
    * 8 hex chars of md5(id) as an integer, mod buckets. Uniform
    * (md5 avalanche), content-stable, and expressible in DuckDB as
    * `CAST(('0x' || substr(md5(id::VARCHAR),1,8)) AS UBIGINT) % b`. */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Reproducible train/val/test split: adds a `split` column keyed
    * on [[hashBucket]] over 100 buckets — `trainPct`% train, `valPct`%
    * val, remainder test. Rows never migrate between splits when the
    * corpus grows (assignment depends only on the row's own id). */
  def withSplit(df: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, s"train+val must leave room for test, got $trainPct+$valPct")
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified sample: `n` rows per stratum, chosen by
    * ordering each stratum on (md5(id), id) — a reproducible
    * pseudo-random order with no RNG. One WindowGroupLimit per
    * stratum (rank ≤ n prunes before the final sort), not a global
    * sample: every stratum is guaranteed its quota, which
    * `TABLESAMPLE`-style Bernoulli sampling cannot promise. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Context-window chunking: one output row per `maxChars` segment
    * of the text — the pre-tokenization analog of sequence packing.
    * Explode over a computed index range + substring: map-only, no
    * shuffle; empty documents yield zero chunks (not one empty one).
    * Output: (idCol, chunk_id, offset [1-based], chunk). */
  def chunk(df: DataFrame, maxChars: Int,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxChars >= 1, s"maxChars must be >= 1, got $maxChars")
    df.filter(length(col(textCol)) > 0)
      .withColumn("__n", expr(s"(length($textCol) + ${maxChars - 1}) div $maxChars"))
      .select(col(idCol), col(textCol),
        explode(expr("sequence(0, __n - 1)")).as("chunk_id"))
      .withColumn("offset", col("chunk_id") * maxChars + 1)
      .select(col(idCol), col("chunk_id"), col("offset"),
        expr(s"substring($textCol, offset, $maxChars)").as("chunk"))
  }

  /** OVERLAPPING chunking — the RAG / retrieval-index standard where
    * [[chunk]]'s disjoint slices lose the sentences that straddle a
    * boundary: windows of `size` chars start every `stride` chars
    * (stride < size ⇒ `size - stride` chars of overlap), and the last
    * window starts at the final stride position that still has text.
    * Window count = 1 + max(0, ⌈(len − size)/stride⌉) — one window
    * covers a short doc whole, and no window is a pure suffix of its
    * predecessor. Map-only explode; no shuffle. */
  def chunkOverlap(df: DataFrame, size: Int, stride: Int,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(size >= 1, s"chunkOverlap: size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"chunkOverlap: stride must be in [1, size], got $stride")
    df.filter(length(col(textCol)) > 0)
      .withColumn("__n",
        expr(s"1 + greatest(0L, (length($textCol) - $size + ${stride - 1}) " +
          s"div $stride)"))
      .select(col(idCol), col(textCol),
        explode(expr("sequence(0, __n - 1)")).as("chunk_id"))
      .withColumn("offset", col("chunk_id") * stride + 1)
      .select(col(idCol), col("chunk_id"), col("offset"),
        expr(s"substring($textCol, offset, $size)").as("chunk"))
  }

  /** [[hashBucket]] with a salt, so independent sampling decisions
    * (split vs mixture) are uncorrelated — sharing one hash would
    * drop all of a key's mixture losses from the same split region. */
  def hashBucketSalted(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Weighted dataset mixture — the language/source rebalancing step
    * of a pretraining pipeline: per-key deterministic subsampling at
    * `ratesPct` percent (keys absent from the list keep
    * `defaultPct`). Same content-stable hash mechanics as
    * [[withSplit]] (salted; no RNG), so the mixture is reproducible
    * and composes with the split without correlation. Map-only. */
  def mixture(df: DataFrame, keyCol: String, idCol: String,
              ratesPct: Seq[(String, Int)], defaultPct: Int = 100,
              salt: String = "#mix"): DataFrame =
    df.filter(hashBucketSalted(col(idCol), salt, 100) <
      rateFor(col(keyCol), ratesPct, defaultPct))

  /** EPOCH-WEIGHTED MIXTURE (upsampling): where [[mixture]] can only
    * DOWN-sample (rates ≤ 100%), training recipes routinely weight a
    * high-quality source ABOVE 1 epoch — "Wikipedia ×3.5" means every
    * document appears 3 times and a deterministic 50% md5-chosen
    * subset a 4th. Each output row carries `epoch` (0-based copy
    * index), so a downstream shuffle-shard spreads the copies apart.
    * Implementation: one `explode(sequence(0, ⌈w⌉−1))` per row — the
    * integer copies are unconditional, the final fractional copy
    * keeps only rows whose salted [[hashBucket]] falls under the
    * remainder — map-only, content-stable, no RNG, and a grown
    * corpus never flips a previously-kept fractional copy. Weights
    * are given in PERCENT (350 = 3.5 epochs) to keep the rule exact
    * integer arithmetic. */
  def withEpochs(df: DataFrame, keyCol: String, idCol: String,
                 epochsPct: Seq[(String, Int)], defaultPct: Int = 100,
                 salt: String = "#epoch"): DataFrame = {
    require(epochsPct.forall(_._2 >= 0), "withEpochs: negative epoch weight")
    val pct = rateFor(col(keyCol), epochsPct, defaultPct)
    val fullCopies = (pct.cast("long") / 100L).cast("long") // ⌊w⌋ epochs
    val fracPct = pct.cast("long") % 100L                   // remainder, in %
    val keepFrac = hashBucketSalted(col(idCol), salt, 100) < fracPct
    val copies = (fullCopies + when(keepFrac, 1L).otherwise(0L)).cast("int")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** The per-key sampling rate [[mixture]] applies — exposed so
    * reports can state the rate they were filtered at from the SAME
    * expression (a re-implemented chain could silently drift). */
  def rateFor(key: Column, ratesPct: Seq[(String, Int)], defaultPct: Int = 100): Column =
    ratesPct.foldRight(lit(defaultPct): Column) { case ((k, p), acc) =>
      when(key === k, lit(p)).otherwise(acc)
    }

  /** Concat-and-split sequence packing (the LM-training layout): rows
    * are laid out in deterministic `idCol` order within each group
    * and cut into `budget`-token bins; a row's bin is where its FIRST
    * token lands (`exclusive-prefix-sum DIV budget`) — the standard
    * "concatenate documents, slice at context length" packing,
    * expressed as one window prefix-sum + integer division.
    *
    * Scale posture: the prefix-sum needs a total order per group, so
    * at 100 TB packing runs per (shard, group) — which is also what
    * training wants (each worker packs its own shard); the operator
    * is the per-shard kernel. Appends: bin_id. */
  def packBins(df: DataFrame, groupCol: String, idCol: String,
               tokensCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prior", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__prior div $budget"))
      .drop("__prior")
  }

  /** PII patterns (emails; NANP-style phone runs). Deliberately plain
    * regex — identical semantics under Java regex and RE2, so the
    * oracle can restate them verbatim. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** Count of PII matches (emails + phones) in the text. */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(PhoneRe), lit(0)))).cast("long")

  /** Replace PII with typed placeholder tokens. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Systematic probability-proportional-to-size (PPS) sampling —
    * weighted sampling for mixture construction (e.g. "sample 50
    * documents with probability ∝ length/quality-score"), in EXACT
    * integer arithmetic.
    *
    * Rows are laid out in the content-stable pseudo-random order
    * (md5(id), id) — [[stratifiedSample]]'s idiom, no RNG state —
    * and a conceptual tape of cumulative integer weights is cut at
    * every multiple of total/n: row i is picked once per multiple
    * of total that (cum_{i-1}·n, cum_i·n] contains, i.e.
    * `n_picks = (cum_i·n) div total − (cum_{i-1}·n) div total`.
    * Every quantity is a BIGINT — no float ever enters the
    * selection, so the sample is bit-portable across engines
    * (the q69 integer posture applied to sampling). A row heavier
    * than the total/n stride can be picked multiple times
    * (n_picks > 1), exactly as PPS prescribes; Σ n_picks = n by
    * telescoping — a theorem, which the q75 gate states as a
    * constant.
    *
    * The prefix sum is computed DISTRIBUTED: range-partition by the
    * order key, one window pass per partition, then a broadcast join
    * of per-partition offsets (the two-phase scan pattern) — no
    * global single-task window at any scale. Weights must be
    * positive integers (callers bucket float scores first).
    *
    * Output: the picked rows (original columns) + n_picks ≥ 1. */
  def ppsSystematicSample(df: DataFrame, weightCol: String, n: Int,
                          idCol: String = "doc_id", partitions: Int = 32): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    val cols = df.columns.toSeq
    // Enforce the documented weight contract instead of silently
    // mis-sampling: an all-zero total would make every `div __total`
    // NULL (empty sample, no error) and a negative weight makes the
    // prefix sums non-monotone (pick counts telescope wrong). One
    // bounded min() aggregate — the refuse-loudly posture of
    // approxDistinct applied here (the validation pass re-reads the
    // input; cache upstream if it is expensive). min() skips NULLs,
    // so a null weight is pinned to Long.MinValue first — it must
    // refuse, not vanish from the aggregate. An EMPTY input is not a
    // contract violation: it returns an empty sample, the pre-guard
    // behavior (per-stratum pipelines legitimately hit empty cuts).
    val minW = df.agg(min(coalesce(col(weightCol).cast("long"),
      lit(Long.MinValue)))).head().get(0)
    if (minW == null)
      return df.withColumn("n_picks", lit(1L))
        .select((cols.map(col) :+ col("n_picks")): _*).limit(0)
    require(minW.asInstanceOf[Long] >= 1L,
      s"ppsSystematicSample: weights must be positive integers — " +
        s"min($weightCol) is ${
          if (minW == Long.MinValue) "NULL (null weight)" else minW.toString}")
    val ranged = df
      .withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .repartitionByRange(partitions, col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // feeds both the offsets aggregate and the final join — one
    // materialization, not two range-partition passes; swept at query
    // end (MEMORY_AND_DISK blocks never drop in-session, so both
    // consumers see one consistent partition layout)
    val local = graft.ops.Intermediates.shared(
      ranged.withColumn("__cum_local", sum(col("__w")).over(wLocal)))
    val offsets = local.groupBy(col("__pid")).agg(sum(col("__w")).as("__psum"))
      .withColumn("__offset", coalesce(
        sum(col("__psum")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__total", sum(col("__psum")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__offset"), col("__total"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__cum", col("__cum_local") + col("__offset"))
      .withColumn("n_picks",
        expr(s"(__cum * $n) div __total - ((__cum - __w) * $n) div __total"))
      .filter(col("n_picks") >= 1)
      .select((cols.map(col) :+ col("n_picks")): _*)
  }

  /** DETERMINISTIC SHUFFLE-AND-SHARD — the training-export step: every
    * row gets a `shard` in [0, n) by a seeded hash of its id and a
    * `shard_pos` by a SECOND, independent seeded hash (so the
    * within-shard order is uncorrelated with the shard assignment —
    * one hash for both would sort each shard by the same bits that
    * chose it). The result is a reproducible global shuffle: same
    * corpus + seed ⇒ identical shards and identical order, across
    * cluster sizes and re-runs — what makes a training run repeatable
    * and resumable mid-epoch. Materialize with
    * `write.partitionBy("shard")` after `sortWithinPartitions(shard,
    * shard_pos)`; one hash-keyed exchange + per-shard sort, no global
    * sort. Ties cannot occur (the id is the rank tiebreak), and the
    * md5-based hashes are the engine-portable q46/q123 scheme. */
  def shuffleShards(df: DataFrame, n: Int, seed: String,
                    idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"shuffleShards: need n >= 1, got $n")
    val assignHash = md5(concat_ws("#", lit(seed), col(idCol).cast("string")))
    val orderHash = md5(concat_ws("#", lit(s"$seed:o"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(orderHash, col(idCol))
    df.withColumn("shard",
        pmod(conv(substring(assignHash, 1, 8), 16, 10).cast("long"), lit(n.toLong))
          .cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** GROUP-CONSISTENT train/val/test split: like [[withSplit]], but
    * keyed on md5 of a GROUP column (registered domain, cluster id,
    * source) so every row of a group lands in the same split. This is
    * the leakage-safe form: near-duplicate pages of one site — or
    * members of one dedup cluster — can never straddle train and
    * test, which per-doc splitting silently allows and which inflates
    * eval scores exactly like test-set contamination. Same
    * content-stable property as withSplit: groups never migrate when
    * the corpus grows. */
  def withGroupSplit(df: DataFrame, groupCol: String,
                     trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100,
      s"train+val must leave room for test, got $trainPct+$valPct")
    val b = hashBucket(col(groupCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** The registered domain of a URL: the last two dot-labels of its
    * host (port stripped). A regex both engines evaluate identically
    * — no `parse_url` (Spark-only) and no public-suffix list (co.uk
    * style multi-label suffixes are out of scope; a real deployment
    * broadcasts the PSL as a longest-suffix join on this column). */
  def registeredDomain(url: Column): Column =
    regexp_extract(
      // scheme matches case-insensitively and the host lowercases —
      // HTTPS://Spam.Bad.Org/x must hit the same domain bucket (and
      // the same blocklist entry) as its lowercase twin; without this
      // a mixed-case scheme extracted an empty host and silently
      // bypassed domainCap's block AND cap.
      lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)),
      "([^.]+\\.[^.]+)$", 1)

  /** URL CANONICALIZATION — the normalization before any URL-keyed
    * dedup: the same page arrives as `http://Site.com/a/`,
    * `http://site.com/a?utm_source=x`, and `http://site.com:80/a#top`,
    * and URL-exact dedup sees four documents until these collapse.
    * Rules (each a plain string/regex op with IDENTICAL java.regex /
    * RE2 semantics — no replacement backrefs, whose `$1` vs `\\1`
    * syntax differs between engines):
    *   1. drop the fragment (`#…`);
    *   2. lowercase the scheme://host[:port] head (paths stay
    *      case-sensitive — they are);
    *   3. strip the scheme-default port (`:80` http, `:443` https);
    *   4. drop tracking params (`utm_*`, `fbclid`, `gclid`) wherever
    *      they sit in the query string, tidying separators;
    *   5. strip one trailing `/`.
    * Map-only codegen'd expressions; no shuffle. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val head = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest = substring(noFrag, length(head) + 1, lit(1000000))
    val lowHead = lower(head)
    val noPort = when(lowHead.startsWith("http://") && lowHead.endsWith(":80"),
        substring(lowHead, lit(1), length(lowHead) - 3))
      .when(lowHead.startsWith("https://") && lowHead.endsWith(":443"),
        substring(lowHead, lit(1), length(lowHead) - 4))
      .otherwise(lowHead)
    val joined = concat(noPort, rest)
    // tracking params: mid-list (&k=v), list-head before more params
    // (?k=v& -> ?), then a lone ?k=v
    val t1 = regexp_replace(joined, "&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", "")
    val t2 = regexp_replace(t1, "\\?(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*&", "?")
    val t3 = regexp_replace(t2, "\\?(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*$", "")
    when(t3.endsWith("/"), substring(t3, lit(1), length(t3) - 1)).otherwise(t3)
  }

  /** DOMAIN-LEVEL CURATION — the CommonCrawl-pipeline step before any
    * content filter: cap every registered domain's share of the
    * corpus at `maxPerDomain` documents and drop blocked domains
    * outright. Without the cap, a handful of boilerplate-heavy sites
    * (forums, link farms, mirrors) dominate the token budget; the cap
    * is the crude-but-standard prior that no single site should
    * out-vote the rest of the web.
    *
    * Which documents survive a capped domain is DETERMINISTIC and
    * content-stable: each domain keeps its `maxPerDomain` lowest
    * (md5(seed#id), id) documents — the q46/q148 engine-portable
    * scheme — so a re-crawl that adds pages evicts predictably
    * instead of reshuffling the kept set. Adds a `domain` column.
    *
    * Scale: ONE domain-keyed exchange; the rank≤k predicate becomes a
    * WindowGroupLimit, so even a giant domain buffers only k rows per
    * partition before the final per-group sort. The blocklist is a
    * literal predicate (broadcast-sized by definition — block PATTERNS
    * belong in a real denylist join). */
  def domainCap(df: DataFrame, urlCol: String, maxPerDomain: Int,
                blockedDomains: Seq[String], seed: String,
                idCol: String = "doc_id"): DataFrame = {
    require(maxPerDomain >= 1, s"domainCap: need maxPerDomain >= 1, got $maxPerDomain")
    val tagged = df.withColumn("domain", registeredDomain(col(urlCol)))
    val unblocked =
      if (blockedDomains.isEmpty) tagged
      else tagged.filter(!col("domain").isInCollection(blockedDomains))
    val orderHash = md5(concat_ws("#", lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col("domain")).orderBy(orderHash, col(idCol))
    unblocked.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxPerDomain)
      .drop("__r")
  }

  /** GOPHER QUALITY FILTER (Rae et al. 2021 Table A1) — the composed
    * accept/reject rule cascade over the repetition and shape
    * signals, each document labeled with the FIRST failed rule (fixed
    * order below) or "ok". Words are the whitespace tokens of the
    * normalized text ([[Dedup.normalized]]); the n-gram repetition
    * family runs on the `[a-z0-9]+` token stream
    * ([[TextAnalysis.repetitionSignals]]). Every comparison is
    * integer micro-units or a cross-multiplied ratio — engine-portable
    * exactly, zero float thresholds.
    *
    * Rules, in order (thresholds from the paper; n-gram set
    * parameterized): word_count ∈ [minWords, maxWords];
    * mean_word_length ∈ [3, 10]; symbol_ratio ('#' + '…' + '...'
    * occurrences ≤ 0.1/word); bullet_lines (≤ 90% of lines start
    * '-'/'*'/'•'); ellipsis_lines (≤ 30% end '…'/'...');
    * alpha_words (≥ 80% contain a letter); stop_words (≥ 2 distinct
    * of [[TextAnalysis.EnStopwords]]); dup_line_frac ≤ 0.30;
    * dup_line_char_frac ≤ 0.20; topNgram / dupNgram caps per the
    * `topNs` / `dupNs` maps.
    *
    * Scale: every stage is a per-document aggregation or map-only
    * projection joined back on the id — doc-keyed exchanges only. */
  def gopherFilter(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   minWords: Int = 50, maxWords: Int = 100000,
                   topNs: Seq[(Int, Long)] =
                     Seq(2 -> 200000L, 3 -> 180000L, 4 -> 160000L),
                   dupNs: Seq[(Int, Long)] =
                     Seq(5 -> 150000L, 10 -> 100000L)): DataFrame = {
    import graft.ext.{TextAnalysis => TA}
    val base = docs.select(col(idCol), col(textCol))
    val words = base.select(col(idCol),
      filter(split(Dedup.normalized(col(textCol)), " "), w => w =!= "").as("__ws"),
      col(textCol))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_words"),
        expr("aggregate(__ws, 0L, (a, x) -> a + length(x))").as("__wchars"),
        size(filter(col("__ws"), w => w.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(array_intersect(array_distinct(col("__ws")),
          typedLit(TA.EnStopwords))).cast("long").as("n_stop"),
        (length(col(textCol)) - length(replace(col(textCol), lit("#"), lit(""))))
          .cast("long").as("__hash"),
        (length(col(textCol)) - length(replace(col(textCol), lit("…"), lit(""))))
          .cast("long").as("__ell1"),
        ((length(col(textCol)) - length(replace(col(textCol), lit("..."), lit("")))) / 3)
          .cast("long").as("__ell3"))
      .withColumn("mean_wl_e6", expr("CAST((1000000 * __wchars) div n_words AS BIGINT)"))
      .withColumn("n_symbols", col("__hash") + col("__ell1") + col("__ell3"))
    val lines = base
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__raw"))
      .withColumn("__l", trim(col("__raw")))
      .filter(col("__l") =!= "")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__l").startsWith("-") || col("__l").startsWith("*") ||
          col("__l").startsWith("•"), 1L).otherwise(0L)).as("n_bullet"),
        sum(when(col("__l").endsWith("...") || col("__l").endsWith("…"), 1L)
          .otherwise(0L)).as("n_ellipsis"))
    val rep = TA.repetitionSignals(base, idCol, textCol)
      .drop("n_lines") // lines re-derived above next to bullet/ellipsis
    val ngrams = (topNs.map { case (n, _) =>
      TA.topNgramCharFracE6(base, n, idCol, textCol) } ++
      dupNs.map { case (n, _) => TA.dupNgramCharFracE6(base, n, idCol, textCol) })
    val joined = ngrams.foldLeft(
      base.select(col(idCol)).distinct()
        .join(words, Seq(idCol), "left_outer")
        .join(lines, Seq(idCol), "left_outer")
        .join(rep, Seq(idCol), "left_outer")) {
      (acc, f) => acc.join(f, Seq(idCol), "left_outer") }
    def z(c: String): Column = coalesce(col(c), lit(0L))
    val reason =
      when(z("n_words") < minWords || z("n_words") > maxWords, "word_count")
        .when(z("mean_wl_e6") < 3000000L || z("mean_wl_e6") > 10000000L,
          "mean_word_length")
        .when(z("n_symbols") * 10L > z("n_words"), "symbol_ratio")
        .when(z("n_bullet") * 10L > z("n_lines") * 9L, "bullet_lines")
        .when(z("n_ellipsis") * 10L > z("n_lines") * 3L, "ellipsis_lines")
        .when(z("n_alpha") * 5L < z("n_words") * 4L, "alpha_words")
        .when(z("n_stop") < 2L, "stop_words")
        .when(z("dup_line_frac_e6") > 300000L, "dup_line_frac")
        .when(z("dup_line_char_frac_e6") > 200000L, "dup_line_char_frac")
    val withNgrams = (topNs.map { case (n, cap) =>
      (s"top${n}gram_char_frac_e6", cap, s"top${n}gram") } ++
      dupNs.map { case (n, cap) =>
        (s"dup${n}gram_char_frac_e6", cap, s"dup${n}gram") })
      .foldLeft(reason) { case (r, (c, cap, name)) => r.when(z(c) > cap, name) }
      .otherwise("ok")
    joined.withColumn("reason", withNgrams)
      .withColumn("accept", col("reason") === "ok")
      .select(col(idCol), col("accept"), col("reason"))
  }

  /** CROSS-DOCUMENT line dedup — the CCNet/RefinedWeb boilerplate
    * removal step: a LINE whose normalized form appears in at least
    * `minDocs` DISTINCT documents is boilerplate (cookie banners,
    * nav menus, "subscribe" footers — the page furniture that
    * dominates web text verbatim) and is dropped from EVERY document;
    * each document's text is rebuilt from its surviving lines in
    * original order (original raw bytes, only whole lines removed).
    * Normalization is [[Dedup.normalized]] (lowercase, whitespace
    * collapse) so trivially re-spaced furniture still matches; empty
    * (all-whitespace) lines are never counted as boilerplate and
    * always survive.
    *
    * Returns one row per input document: `idCol`, the rebuilt
    * `textCol`, and `n_removed_lines`. A document whose every line
    * was boilerplate survives with empty text (callers filter).
    *
    * Scale: three keyed exchanges, none corpus-quadratic — (1) the
    * frequency aggregate on the normalized line (partial map-side
    * combine; its OUTPUT, the boilerplate set, is small by the
    * nature of the threshold), (2) a LEFT ANTI join of lines against
    * that set (AQE broadcasts it when it fits), (3) the per-document
    * reassembly groupBy. Line text must travel to its document's
    * reducer for reassembly, so the anti-join keys on the normalized
    * line directly; at extreme scale key it on xxhash64 instead and
    * accept the 2⁻⁶⁴ collision. */
  def dropBoilerplateLines(docs: DataFrame, minDocs: Int,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           keyOnHash: Boolean = false): DataFrame = {
    require(minDocs >= 2, s"dropBoilerplateLines: need minDocs >= 2, got $minDocs")
    val lines0 = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__nkey", Dedup.normalized(col("__line")))
    // keyOnHash: the extreme-scale shape — both the frequency
    // aggregate and the anti-join key on xxhash64(normalized line)
    // instead of the line text, shrinking the shuffled key to 8 bytes
    // at a 2⁻⁶⁴-per-pair collision risk (a collision only ever
    // REMOVES an innocent line alongside true furniture). Identical
    // output on collision-free corpora — spec-pinned.
    val lines = lines0.withColumn("__key",
      if (keyOnHash) xxhash64(col("__nkey")) else col("__nkey"))
    val emptyKey: Column =
      if (keyOnHash) col("__nkey") === "" else col("__key") === ""
    val boiler = lines.filter(!emptyKey)
      .groupBy(col("__key"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__key")
    val kept = lines.join(boiler, Seq("__key"), "left_anti")
    reassemble(lines, kept, idCol, textCol)
  }

  /** [[dropBoilerplateLines]] with a PRECOMPUTED boilerplate set —
    * the incremental/streaming form: maintain corpus-wide line
    * frequencies as an [[graft.ops.IncrementalAgg]] view over a
    * `(doc, normalized-line)` manifest table, derive
    * `boiler = view.filter(n >= k)`, and clean each arriving wave
    * against it WITHOUT ever rescanning the corpus (q222's
    * composition). `boiler(boilerKeyCol)` holds normalized line keys
    * ([[Dedup.normalized]] of the raw line); empty keys are ignored
    * (empty lines always survive, the batch form's rule). */
  def dropBoilerplateLinesAgainst(docs: DataFrame, boiler: DataFrame,
                                  boilerKeyCol: String = "line_key",
                                  idCol: String = "doc_id",
                                  textCol: String = "text"): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__key", Dedup.normalized(col("__line")))
    val keys = boiler.select(col(boilerKeyCol).as("__key"))
      .where(col("__key") =!= "").distinct()
    val kept = lines.join(keys, Seq("__key"), "left_anti")
    reassemble(lines, kept, idCol, textCol)
  }

  /** Rebuild each document from its surviving lines in original
    * order; all-removed docs survive with empty text. */
  private def reassemble(lines: DataFrame, kept: DataFrame,
                         idCol: String, textCol: String): DataFrame = {
    val rebuilt = kept.groupBy(col(idCol)).agg(
      concat_ws("\n", transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line"))).as("__text"),
      count(lit(1)).as("__kept"))
    val totals = lines.groupBy(col(idCol)).agg(count(lit(1)).as("__n_lines"))
    totals.join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__text"), lit("")).as(textCol),
        (col("__n_lines") - coalesce(col("__kept"), lit(0L))).as("n_removed_lines"))
  }
}
