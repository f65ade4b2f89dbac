package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContain

/** Bloom-filter membership index for INCREMENTAL exact deduplication —
  * "is this new document already in the 100 TB corpus?" answered without
  * ever joining the new batch against corpus history.
  *
  * The reference deduplicates arriving rows against the target table by
  * querying the overlapping window back out and anti-joining
  * (`core/Pipe/_sync.py` filter_existing → `utils/dataframe.py` filter_unseen
  * semantics); that is exact but reads history proportional to the window on
  * every sync. The Bloom index replaces the history read with O(m) bits of
  * state: a false-positive-prone membership summary whose positives are then
  * exactly verified against the corpus with a BROADCAST semi-join of just
  * the candidates — the corpus is scanned once, never shuffled, and the
  * common case (a genuinely new document) never touches it at all.
  *
  * Layout: the filter is stored SPARSE as (word, bits) rows — a derived
  * pipe, incrementally maintained because bit_or is associative and
  * commutative: merging batch words == rebuilding from scratch (the
  * `q_bloom_index_sync` oracle proves this). The probe assembles the dense
  * long[] once on the driver (m/64 longs, e.g. 2^26 bits = 8 MiB) and ships
  * it to tasks as one reference object inside a generated expression
  * ([[graft.expressions.BloomMightContain]]).
  *
  * Hashes are md5-derived (two disjoint 60-bit slices of ONE md5, the
  * second forced odd for double hashing) so DuckDB replays bit positions
  * exactly; k ≤ 8 keeps `h1 + (k−1)·h2` inside a signed long.
  */
object BloomIndex {

  /** Words-index range check: the dense filter is addressed by int word
    * index, so m above 2^37 (= 64 · Int.MaxValue, a 16 GiB filter nobody
    * should build) must fail fast instead of silently truncating. */
  private def requireM(m: Long): Unit = {
    require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
    require(m / 64 <= Int.MaxValue.toLong,
      s"m = $m exceeds the int word-index range (max ${64L * Int.MaxValue})")
  }

  /** The two 60-bit slices of a hex md5 digest column (second forced odd
    * for double hashing). */
  private def slices(digest: Column): (Column, Column) = (
    conv(substring(digest, 1, 15), 16, 10).cast("long"),
    conv(substring(digest, 17, 15), 16, 10).cast("long").bitwiseOR(lit(1L)))

  /** Two 60-bit non-negative hashes from one md5 of the value. The md5
    * subtree appears in both outputs; stage the digest into its own
    * projected column (as [[bloomWords]] does) when evaluating outside
    * whole-stage codegen, whose subexpression elimination otherwise
    * deduplicates it. */
  def hashes(value: Column): (Column, Column) = slices(md5(value))

  /** Sparse filter build: (word: int, bits: long) rows, only words with at
    * least one set bit. ONE shuffle of ≤ k·|docs| integer rows with map-side
    * bit_or combine; output ≤ m/64 rows regardless of corpus size. Null
    * values hash to null positions and are simply not indexed (explode
    * drops them) — the probe side routes nulls through the "new" path. */
  def bloomWords(docs: DataFrame, valueCol: String, m: Long, k: Int): DataFrame = {
    requireM(m)
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    // Null values cannot be indexed (the probe routes them to "new"): drop
    // them BEFORE hashing — md5(null) is null, and explode keeps null array
    // ELEMENTS, so without the filter a null row would emit a (null, null)
    // word row that crashes assemble's getInt.
    // Stage the digest as its own column so md5 runs ONCE per row even on
    // the interpreted path; h1/h2/conv are cheap column refs over it.
    val staged = docs.where(col(valueCol).isNotNull)
      .select(md5(col(valueCol)).as("__digest"))
    val (h1, h2) = slices(col("__digest"))
    val positions = array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % lit(m)): _*)
    staged.select(explode(positions).as("pos"))
      // integral shift, matching the probe kernel's `pos >>> 6` — double
      // division would go inexact past 2^53
      .select(shiftright(col("pos"), 6).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("word"))
      .agg(bit_or(col("bit")).as("bits"))
  }

  /** Merge two sparse filters — the incremental-maintenance step. */
  def mergeWords(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("word"), col("bits")).unionByName(b.select(col("word"), col("bits")))
      .groupBy(col("word")).agg(bit_or(col("bits")).as("bits"))

  /** Densify a sparse filter into the probe-side long[]. Driver memory is
    * m/64 longs — the INDEX size, bounded by configuration, never by data
    * (same driver-state class as IVF centroids). */
  def assemble(words: DataFrame, m: Long): Array[Long] = {
    requireM(m)
    val dense = new Array[Long]((m / 64).toInt)
    words.select(col("word").cast("int"), col("bits").cast("long")).collect()
      .foreach(r => dense(r.getInt(0)) = dense(r.getInt(0)) | r.getLong(1))
    dense
  }

  /** Membership-probe Column over an assembled filter. */
  def mightContain(value: Column, dense: Array[Long], m: Long, k: Int): Column = {
    val (h1, h2) = hashes(value)
    GraftColumnBridge.column(BloomMightContain(
      GraftColumnBridge.expressionNow(h1), GraftColumnBridge.expressionNow(h2),
      dense, m, k))
  }

  /** Rows of `newDocs` whose `valueCol` does NOT already occur in `corpus`,
    * decided exactly: the Bloom probe routes the common case (new value,
    * filter says no) straight through with zero joins; probe positives —
    * true duplicates plus the false-positive rate worth of survivors — are
    * verified against the corpus via ONE corpus scan filtered by a
    * BROADCAST semi-join of the candidate values. The corpus never
    * shuffles, and the result is independent of (m, k): those only move
    * work between the fast path and the verify path.
    *
    * NULL values probe to a null hit; they are routed through the "new"
    * path explicitly (reference `utils/dataframe.py` filter_unseen keeps
    * null-keyed rows as unseen — a pandas merge anti-join never matches
    * NaN). The broadcasts carry the DISTINCT candidate values (true dups +
    * FP-rate·|batch|) — small next to the corpus by construction on a
    * normal sync batch. A duplicate-heavy batch (every row a probe hit)
    * would degrade the broadcast, so the candidate count is measured first
    * (cheap: `tagged` is persisted, the count reuses it) and above
    * `broadcastMaxCandidates` the verify switches to a shuffle hash
    * semi-join — the corpus shuffles once on the value, which is the
    * correct plan when the candidate side is genuinely big.
    */
  def notInCorpus(newDocs: DataFrame, corpus: DataFrame, valueCol: String,
                  dense: Array[Long], m: Long, k: Int,
                  broadcastMaxCandidates: Long = 4000000L): DataFrame = {
    val hitCol = "__graft_bloom_hit"
    require(!newDocs.columns.contains(hitCol),
      s"newDocs already has a column named $hitCol")
    // tagged feeds three branches (fast path, candidates, verify) — persist
    // so the batch is scanned and the probe expression evaluated once. Left
    // persisted for the consumer's lifetime; Spark evicts LRU.
    val tagged = newDocs.withColumn(hitCol,
      coalesce(mightContain(col(valueCol), dense, m, k), lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = tagged.where(col(hitCol))
    val distinctCand = candidates.select(col(valueCol).as("__v")).distinct()
    val useBroadcast = distinctCand.count() <= broadcastMaxCandidates
    val candSide = if (useBroadcast) broadcast(distinctCand) else distinctCand.hint("shuffle_hash")
    // corpus values that really do collide with a candidate (≤ |candidates|)
    val confirmed = corpus.select(col(valueCol).as("__v"))
      .join(candSide, Seq("__v"), "left_semi")
      .distinct()
    val confirmedSide = confirmed.withColumnRenamed("__v", valueCol)
    tagged.where(!col(hitCol)).drop(hitCol)
      .unionByName(candidates.drop(hitCol)
        .join(if (useBroadcast) broadcast(confirmedSide) else confirmedSide.hint("shuffle_hash"),
          Seq(valueCol), "left_anti"))
  }
}
