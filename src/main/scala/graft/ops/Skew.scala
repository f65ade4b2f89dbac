package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. AQE's skew-join handling rebalances
  * sort-merge joins at runtime; salting is the deterministic pre-planned
  * form for the cases AQE can't touch — broadcast-ineligible hot-key joins
  * and rank/window work keyed on a skewed column. (The reference never
  * needs this: its per-pipe workloads are single-node pandas. At 100 TB a
  * single hot id would pin one reducer without it.)
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join where `left` is large and skewed on `keys` and `right` is
    * too big to broadcast but small enough to replicate `salt`×: left rows
    * get a uniform salt, right rows are replicated once per salt value, the
    * join adds the salt to the key — identical results, hot keys spread
    * over `salt` reducer partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt factor must be > 1")
    // right/full outer joins would emit every UNMATCHED right row once per
    // salt replica — the construction is only result-identical when
    // unmatched right rows don't survive the join
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")(jt),
      s"saltedJoin replicates the right side — '$joinType' would duplicate unmatched right rows")
    val l = left.withColumn(SaltCol, floor(rand(42) * salt).cast("int"))
    val r = right.withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Two-phase top-1-per-key (the dedup/rank shape) for a skewed key: a
    * salted partial reduction bounds any single task's share of a hot key
    * to 1/salt of its rows, then a final reduction over `salt` survivors
    * per key. Equivalent to `row_number() = 1` with `orderBy` descending
    * (ties resolved by the greatest struct, so make the order columns a
    * total order). */
  def saltedKeepLatest(df: DataFrame, keys: Seq[String], orderBy: Seq[String],
                       salt: Int): DataFrame = {
    require(salt > 1, "salt factor must be > 1")
    val orderStruct = struct((orderBy.map(col) :+
      struct(df.columns.map(col).toIndexedSeq: _*).as("__row")): _*)
    val partial = df
      .groupBy((keys.map(col) :+ floor(rand(42) * salt).cast("int").as(SaltCol)): _*)
      .agg(max(orderStruct).as("__best"))
      .select(col("__best.__row.*")) // original schema, ≤ salt survivors/key
    val fin = partial
      .groupBy(keys.map(col): _*)
      .agg(max(orderStruct).as("__best")) // same expr resolves by name
    fin.select(col("__best.__row.*"))
  }
}
