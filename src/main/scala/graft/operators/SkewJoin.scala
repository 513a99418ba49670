package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual form of what AQE's
  * skew-join splitting does at runtime, as a first-class operator for
  * the cases AQE can't see (pre-AQE planners, skew introduced after the
  * last exchange, or deliberately pinned physical layouts).
  *
  * A hot key routes ALL its big-side rows to one reducer in a plain
  * shuffle join; salting splits each key's rows across `nSalts`
  * sub-partitions (a per-row salt on the big side, a `nSalts`-way
  * replicated small side) so the hottest key's work spreads over
  * `nSalts` reducers. The result multiset is identical to the unsalted
  * join for any salt assignment — the salt only routes rows — which the
  * oracle gate proves by replaying the PLAIN join.
  *
  * Cost model: small side replicates x`nSalts` (use only when
  * |small| * nSalts stays shuffle-cheap or broadcastable), big side
  * carries one extra int column. Inner joins only.
  */
object SkewJoin {

  /** Join `big` to `small` on `bigKey === smallKey`, spreading each
    * key's big-side rows over `nSalts` sub-partitions. `salt` must be a
    * per-ROW expression over `big`'s columns that varies within a key
    * (e.g. a hash of the row id) — salting BY the key would put every
    * hot row back in one bucket. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column,
                 salt: Column, nSalts: Int): DataFrame = {
    require(nSalts >= 1 && nSalts <= (1 << 16), s"nSalts out of range: $nSalts")
    // a NULL salt must still route the row somewhere (bucket 0), not
    // silently fail the __salt equi-conjunct and drop a matching row
    val b = big.withColumn("__salt",
      coalesce(pmod(salt, lit(nSalts.toLong)), lit(0L)).cast("int"))
    val sm = small.withColumn("__salt_s",
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(sm, bigKey === smallKey && col("__salt") === col("__salt_s"))
      .drop("__salt", "__salt_s")
  }
}
