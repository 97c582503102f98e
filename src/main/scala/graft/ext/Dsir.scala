package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style DATA SELECTION VIA IMPORTANCE RESAMPLING (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): given a small TARGET sample (the distribution you
  * want — e.g. curated reference text) and a huge RAW corpus, rank
  * raw documents by the log-likelihood ratio of hashed n-gram bag
  * models fit on each side, and keep the top slice. This is the
  * standard pretraining-data targeting move — "make the crawl look
  * like the reference corpus" — and is embarrassingly parallel:
  * feature hashing (map-only), two bounded bucket-count aggregates,
  * a broadcast ratio join, one per-doc sum, one top-k.
  *
  * EXACTNESS ACROSS ENGINES (the oracle contract): bucket ids use the
  * engine-portable md5 idiom ([[Curate.hashBucket]] / q46); the
  * per-bucket log-ratio is quantized ONCE to integer micro-nats
  * (`floor(ln(·)·1e6)` — q119's precedent: +,·,/ are IEEE-exact, only
  * ln's final ulp is engine-dependent and the floor makes that a
  * ~1e-10 boundary event per DISTINCT BUCKET, not per row), so doc
  * scores are exact BIGINT sums and the top-k is a total order on
  * `(score DESC, id)` — bit-reproducible, resumable, engine-portable.
  *
  * Scale posture: gram explosion is linear in corpus tokens; bucket
  * counts are bounded by `buckets` per side; the ratio table (≤
  * `buckets` rows) broadcasts; the only shuffle over data is the
  * per-doc score aggregation; selection is TakeOrderedAndProject.
  * Nothing is ever collected to the driver. */
object Dsir {

  /** Lowercased word tokens → adjacent-pair grams (`"a_b"`), one row
    * per gram occurrence. The feature space is deliberately simple —
    * hashing (below) is what bounds the model, not the gram choice. */
  def wordBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "), " "),
      t => t =!= "")
    df.select(col(idCol), toks.as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__ts")) - 2),
        i => concat(element_at(col("__ts"), i + 1), lit("_"),
          element_at(col("__ts"), i + 2)))).as("gram"))
  }

  /** The engine-portable hashed feature id: md5-derived bucket in
    * `[0, buckets)` (the oracle rebuilds it as
    * `CAST(('0x' || substr(md5(gram),1,8)) AS UBIGINT) % buckets`). */
  def bucketOf(gram: Column, buckets: Int): Column =
    (conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % buckets).cast("long")

  /** Per-bucket gram counts of one corpus: `(bucket, cnt)`, ≤
    * `buckets` rows however large the corpus. */
  def bucketCounts(grams: DataFrame, buckets: Int): DataFrame =
    grams.select(bucketOf(col("gram"), buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Integer micro-nat log-likelihood ratios per bucket: with add-1
    * smoothing over the full `buckets`-wide support,
    *
    *   lr_b = floor( ln( ((ct_b+1)/(Tt+B)) / ((cr_b+1)/(Tr+B)) ) · 1e6 )
    *
    * — positive where the target distribution overweights the bucket.
    * ≤ `buckets` rows; computed wholly in-plan (the totals ride in as
    * a broadcast cross join, no driver collect). */
  def fitLogRatios(targetGrams: DataFrame, rawGrams: DataFrame,
                   buckets: Int): DataFrame = {
    val ct = bucketCounts(targetGrams, buckets)
      .withColumnRenamed("cnt", "ct")
    val cr = bucketCounts(rawGrams, buckets)
      .withColumnRenamed("cnt", "cr")
    val tt = targetGrams.agg(count(lit(1)).as("tt"))
    val tr = rawGrams.agg(count(lit(1)).as("tr"))
    val b = lit(buckets.toDouble)
    ct.join(cr, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(tt)).crossJoin(broadcast(tr))
      .select(col("bucket"),
        // association order mirrored EXACTLY in the oracle SQL
        floor(log(
          ((col("ct") + lit(1.0)) / (col("tt") + b)) /
          ((col("cr") + lit(1.0)) / (col("tr") + b))) * lit(1e6))
          .cast("long").as("lr"))
  }

  /** Per-doc importance score: the MEAN micro-nat log-ratio per gram,
    * `floor( Σ cnt_b·lr_b / Σ cnt_b )` — exact BIGINT. The mean, not
    * the sum: per-gram log-ratios are net-negative for off-target
    * grams, so a raw SUM ranks docs by SHORTNESS before it ranks them
    * by target-likeness (DSIR's chunked setting side-steps this with
    * equal-length units; doc-level selection must normalize). Floor
    * division is made engine-portable by a +1e8-per-gram offset: the
    * dividend turns positive (|lr| < 1e8 always — a micro-nat ratio
    * of two probabilities each ≥ 1/(2^63+B) is under 88 nats), where
    * truncating and flooring division agree in both engines.
    * Docs of `universe` with no grams carry a NULL score — no
    * evidence is not "evidence of averageness", and 0 would outrank
    * every net-negative real mean; NULLs sort LAST in selection. */
  def score(universe: DataFrame, idCol: String, rawGrams: DataFrame,
            ratios: DataFrame, buckets: Int): DataFrame = {
    val perDoc = rawGrams
      .select(col(idCol), bucketOf(col("gram"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("cnt") * col("lr")).as("__s"),
        sum(col("cnt")).as("__n"))
      .select(col(idCol),
        (expr("(__s + __n * 100000000) div __n") - lit(100000000L))
          .as("dsir_score"))
    universe.join(perDoc, Seq(idCol), "left")
  }

  /** Zero-temperature importance selection: the k most target-like
    * docs under the total order `(score DESC NULLS LAST, id)` —
    * deterministic, a TakeOrderedAndProject (never a full sort at
    * scale). */
  def selectTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("dsir_score").desc_nulls_last, col(idCol)).limit(k)

  /** DSIR proper resamples rather than truncates: Gumbel-top-k =
    * weighted sampling WITHOUT replacement with per-doc weight
    * `exp(score / temperature)` (Efraimidis–Spirakis, Gumbel form) —
    * key_i = score_i/τ + G_i, G from the SEEDED engine-portable md5
    * hash of the id, so the sample is deterministic, reproducible
    * across runs and resumable across retries (no `rand()`, which
    * would also trip the planner rules' stability back-offs).
    * τ → 0 recovers [[selectTopK]]'s truncation; larger τ admits more
    * of the tail (diversity at the cost of average target-likeness).
    * NULL-scored (gramless) docs are excluded — no evidence is not a
    * sampling weight. Still a TakeOrderedAndProject. */
  def resampleGumbel(scored: DataFrame, idCol: String, k: Int,
                     temperature: Double, seed: Long): DataFrame = {
    require(temperature > 0, "Dsir.resampleGumbel: temperature must be > 0")
    // 52 uniform bits from the md5 prefix → u ∈ (0,1) exactly
    // representable; G = -ln(-ln(u))
    val u = (conv(substring(md5(concat_ws("#", lit(seed.toString),
      col(idCol).cast("string"))), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    val key = col("dsir_score").cast("double") / lit(1e6) / lit(temperature) -
      log(-log(u))
    scored.where(col("dsir_score").isNotNull)
      .withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol)).limit(k)
  }
}
