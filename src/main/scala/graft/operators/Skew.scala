package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-spreading joins for heavy-hitter keys.
  *
  * A shuffled equi-join sends every row of a key to ONE reducer; at
  * 100 TB one viral key (a bot user, an empty-string URL, a default
  * tenant) turns a 1000-executor join into a one-task straggler. Spark's
  * AQE splits skewed SORT-MERGE partitions at runtime
  * (`spark.sql.adaptive.skewJoin`, on by default in [[graft.GraftSession]]),
  * which covers most batch cases — but it only fires for sort-merge joins
  * in adaptive plans, and only after a whole stage has materialized the
  * skew. Salting is the PLANNED alternative for the cases AQE can't
  * touch (streaming joins, broadcast-ineligible hash joins, or when the
  * skew is known up front): spread each hot key over `salts` reducers by
  * joining on (key, salt).
  *
  * Left rows get a deterministic pseudo-random salt in [0, salts) —
  * hashed from the WHOLE row, never the key alone (a key-derived salt
  * would put the hot key back on one reducer). The right side replicates
  * each row `salts` times, so every (key, salt) bucket can still match.
  * Result is row-identical to the plain join; the cost is an explicit
  * `salts`x replication of the (small) right side — the standard trade:
  * salt the build side you can afford to replicate, spread the probe
  * side you can't.
  *
  * Deterministic across retries: the salt is a pure function of row
  * content (xxhash64), so a recomputed partition salts identically —
  * `rand()`-salting breaks exactly-once under task retry.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** The row-content salt: xxhash64 over all of `df`'s columns, folded
    * into [0, salts). Duplicate full rows share a salt (they hash
    * equal); skew from MASSIVE exact-duplicate rows needs dedup, not
    * salting. */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int")

  /** Equi-join `left` with `right` on `key`, spreading each key over
    * `salts` shuffle buckets. Supports "inner" and "left" (an outer
    * right side would produce `salts` null-padded copies per unmatched
    * right row). Output columns: left's then right's (minus the
    * duplicate key), like a plain `join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val l = left.withColumn(SaltCol, rowSalt(left, salts))
    val r = right.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
