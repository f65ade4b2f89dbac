package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFns

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023, arXiv:2302.03169): select raw-corpus documents that look like a
  * target domain by importance-weighting hashed n-gram features and
  * Gumbel-top-k resampling. The standard pretraining-data selection
  * operator the reference's sync/filter surface does not cover; first-class
  * here per the LLM-pipeline mandate.
  *
  * Feature space: unigrams + bigrams of the lowercased text, hashed into
  * `nBuckets` buckets (the paper's hashed bag-of-ngrams). Bucket
  * distributions are fit on the target and raw corpora with add-one
  * smoothing; a document's log importance weight is the sum of its grams'
  * per-bucket log-ratios.
  *
  * Exactness discipline: per-bucket log-ratios and the per-document Gumbel
  * noise are quantized to integer MICRO-NATS (×1e6, rounded) before any
  * summation, so every aggregate in the pipeline adds LONGs — associative,
  * order-independent, bit-replayable by an ANSI SQL oracle — instead of
  * accumulating doubles whose sum depends on partition order. Micro-nat
  * resolution is far below any meaningful weight difference; the double
  * surface ([[importanceLogWeight]]) is the quantized value /1e6.
  *
  * Scale design (100 TB): the ratio table is `nBuckets` rows — broadcast.
  * The raw corpus pays ONE explode + broadcast join + hash-aggregate keyed
  * on the document id (map-side combined); document text never shuffles.
  * Target-corpus fitting is one explode + a `nBuckets`-row aggregate.
  * Resampling is a TakeOrdered top-k on an integer score, no global sort
  * materialization. Reference scope anchor: Meerschaum's closest surface is
  * `Pipe.filter_existing`/params filtering (`meerschaum/core/Pipe/_data.py`),
  * which has no notion of distributional selection.
  */
object Dsir {

  /** (id, bucket) rows: one per unigram+bigram occurrence of the lowercased
    * text. Hash = first 15 md5 hex nibbles as a 60-bit long (the repo's
    * oracle-replayable convention, [[graft.expressions.MinHashKernel]]),
    * mod `nBuckets`. Counts, not distinct grams — DSIR's bag-of-ngrams
    * weighs repeated grams repeatedly. */
  def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val toks = TextFns.tokens(lower(col(textCol)))
    val grams = concat(toks, TextFns.wordShingles(lower(col(textCol)), 2))
    docs.select(col(idCol), explode(grams).as("g"))
      .where(length(col("g")) > 0)
      .select(col(idCol),
        pmod(graft.functions.TextFns.md5Long60(col("g")).cast(LongType),
          lit(nBuckets.toLong)).as("bucket"))
  }

  /** (id, bucket, cnt) gram-bucket COUNTS — the compact one-pass form of
    * [[gramBuckets]] (≤ |docs|·min(grams, nBuckets) rows): ONE corpus
    * explode + map-side-combined aggregate. Persist this and both the
    * raw-side model fit AND the scoring join read it — without the shared
    * pass the corpus pays its gram explode (tokenize + shingle + md5 per
    * gram) once for the fit and again for the scoring, and Catalyst will
    * not merge the two subtrees on its own. */
  def docBucketCounts(docs: DataFrame, idCol: String, textCol: String,
                      nBuckets: Int): DataFrame =
    gramBuckets(docs, idCol, textCol, nBuckets)
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-bucket quantized log importance ratio
    * `round(1e6 · (ln((n_t+1)/(T+B)) − ln((n_r+1)/(R+B))))` over every
    * bucket in [0, nBuckets) — add-one-smoothed target vs raw bucket
    * distributions. `nBuckets` rows out; totals ride along as broadcast
    * 1-row cross joins (no driver collect). */
  def bucketLogRatiosMicro(targetBuckets: DataFrame, rawBuckets: DataFrame,
                           nBuckets: Int): DataFrame =
    bucketLogRatiosMicroFromCounts(targetBuckets,
      rawBuckets.groupBy(col("bucket")).agg(count(lit(1)).as("nr")), nBuckets)

  /** [[bucketLogRatiosMicro]] with the raw side pre-aggregated to
    * (bucket, nr) counts — the shared-pass entry ([[docBucketCounts]]
    * re-aggregated by bucket yields exactly the occurrence counts). */
  def bucketLogRatiosMicroFromCounts(targetBuckets: DataFrame,
                                     rawCounts: DataFrame,
                                     nBuckets: Int): DataFrame = {
    val spark = targetBuckets.sparkSession
    val b = nBuckets.toDouble
    val tgt = targetBuckets.groupBy(col("bucket")).agg(count(lit(1)).as("nt"))
    val raw = rawCounts
    // empty corpus → sum is null → coalesce to the degenerate uniform model
    // rather than null weights everywhere
    val tTot = tgt.agg(coalesce(sum(col("nt")), lit(0L)).as("t_tot"))
    val rTot = raw.agg(coalesce(sum(col("nr")), lit(0L)).as("r_tot"))
    spark.range(nBuckets).toDF("bucket")
      .join(tgt, Seq("bucket"), "left")
      .join(raw, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("bucket"),
        round(
          (log((coalesce(col("nt"), lit(0L)) + lit(1.0d)) /
               (col("t_tot") + lit(b))) -
           log((coalesce(col("nr"), lit(0L)) + lit(1.0d)) /
               (col("r_tot") + lit(b)))) * lit(1e6))
          .cast(LongType).as("lw_micro"))
  }

  /** Per-document importance log-weight in micro-nats: Σ over the doc's
    * gram buckets of the bucket's `lw_micro`. Documents whose text yields
    * no grams weigh 0. One broadcast join (ratio table is `nBuckets` rows)
    * + one LONG hash-aggregate keyed on the id. */
  def importanceWeightsMicro(docs: DataFrame, target: DataFrame,
                             idCol: String, textCol: String,
                             nBuckets: Int): DataFrame = {
    val (out, db) = weightsLazy(docs, target, idCol, textCol, nBuckets)
    // materialize (id, long) rows — 16 bytes/doc of spillable executor
    // storage at any scale — and RELEASE the persisted bucket table
    val materialized = out.localCheckpoint(true)
    db.unpersist()
    materialized
  }

  /** The lazy pipeline behind [[importanceWeightsMicro]]/[[select]],
    * returning the persisted [[docBucketCounts]] intermediate: the raw-side
    * model fit and the scoring join BOTH read it, so the corpus pays its
    * gram explode once (measured 2× end-to-end on the resample bench). */
  private[graft] def weightsLazy(docs: DataFrame, target: DataFrame,
                                 idCol: String, textCol: String,
                                 nBuckets: Int): (DataFrame, DataFrame) = {
    // persist the EXPLODED (id, bucket) rows, not a pre-aggregate: an
    // (id, bucket) groupBy would add a corpus-sized shuffle the original
    // shapes never had (measured net-slower); caching the 16-byte rows
    // keeps both downstream aggregates map-side combined exactly as before
    // while the tokenize/shingle/md5 work runs once
    // spread both gram explodes (guide §2.5 single-split input): the
    // tokenize/shingle/md5 kernel is the path's dominant per-row work and
    // the persisted rows feed only two aggregates
    val db = gramBuckets(graft.Tables.spread(docs), idCol, textCol, nBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ratios = bucketLogRatiosMicroFromCounts(
      gramBuckets(graft.Tables.spread(target), idCol, textCol, nBuckets),
      db.groupBy(col("bucket")).agg(count(lit(1)).as("nr")), nBuckets)
    val w = db.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("lw_micro")).as("logw_micro"))
    val out = docs.select(col(idCol))
      .join(w, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
    (out, db)
  }

  /** Double-valued surface: the quantized weight in nats. */
  def importanceLogWeight(logwMicro: Column): Column =
    logwMicro.cast("double") / lit(1e6)

  /** Deterministic per-id Gumbel(0,1) noise in micro-nats:
    * `u = (h32 + 0.5)/2^32` from the id's md5, `g = −ln(−ln(u))` — the same
    * engine-portable md5 coin as [[Sampling.hashBucket]], so the resample
    * is reproducible across engines, reruns, and reshards (no RNG state at
    * 1000 executors). */
  def gumbelMicro(id: Column): Column =
    round(-log(-log(
      (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast(LongType) +
        lit(0.5d)) / lit(4294967296.0d))) * lit(1e6)).cast(LongType)

  /** Gumbel-top-k resample WITHOUT replacement ∝ exp(logw): rank by
    * `logw_micro + gumbel_micro` (integer, exact ties broken by id) and
    * keep the top k — equivalent to sampling k docs from the softmax of
    * the importance weights (Vieira 2014). TakeOrdered, no global sort. */
  def resampleTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    weights
      .withColumn("score_micro",
        (col("logw_micro") + gumbelMicro(col(idCol))).cast(LongType))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** End-to-end: fit on `target`, weigh `docs`, resample `k`. The k-row
    * result checkpoints and the shared bucket table releases — no
    * corpus-sized materialization anywhere on this path. */
  def select(docs: DataFrame, target: DataFrame, idCol: String,
             textCol: String, nBuckets: Int, k: Int): DataFrame = {
    val (weights, db) = weightsLazy(docs, target, idCol, textCol, nBuckets)
    val out = resampleTopK(weights, idCol, k).localCheckpoint(true)
    db.unpersist()
    out
  }
}
