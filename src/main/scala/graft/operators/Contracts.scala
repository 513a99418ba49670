package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared fail-before-execute contract checker behind every CHECKED
  * operator bound in this package (the `connectedComponents` discipline:
  * verify the assumption, don't just document it).
  *
  * Shape: the caller hands in an (ideally already-materialized /
  * localCheckpoint'ed) frame plus one or more named long-valued
  * aggregate bounds; ONE aggregation job evaluates them all, each bound
  * predicate is enforced with a loud, operator-named message, and the
  * aggregate values come back so adaptive callers (pageRank's
  * driver-vs-distributed fork) can reuse the same job's output instead
  * of paying a second scan. Consolidating the shape keeps every future
  * checked contract to one line and one job — previously each operator
  * grew a slightly different eager-check idiom.
  */
private[graft] object Contracts {

  /** One long-valued aggregate bound: `stat` is evaluated over the
    * guarded frame, `ok` judges it, `msg` names the violation. A NULL
    * aggregate (empty input) passes vacuously and reads back as 0. */
  final case class Bound(stat: Column, ok: Long => Boolean,
                         msg: Long => String)

  /** An unchecked read-through: the aggregate is evaluated in the same
    * single job (for caller reuse) but never rejected. */
  def read(stat: Column): Bound = Bound(stat, _ => true, _ => "")

  /** Evaluates every bound's aggregate over `df` in ONE job, enforces
    * each predicate (fail-before-execute), and returns the values in
    * bound order (NULL cells read as 0 after passing vacuously). */
  def enforce(df: DataFrame, bounds: Bound*): IndexedSeq[Long] = {
    require(bounds.nonEmpty, "Contracts.enforce needs at least one bound")
    val row = df.agg(bounds.head.stat, bounds.tail.map(_.stat): _*).head()
    bounds.zipWithIndex.map { case (b, i) =>
      if (row.isNullAt(i)) 0L
      else {
        val v = row.getLong(i)
        require(b.ok(v), b.msg(v))
        v
      }
    }.toIndexedSeq
  }

  /** The bounded-per-key-histogram contract shared by the exact
    * median / CDF / KS / mode family: the heaviest key of `df` (usually
    * a localCheckpoint'ed per-(key, value) histogram, so the guard
    * reuses materialized rows) must hold at most `limit` rows. `what`
    * names the bounded quantity in the error ("distinct values",
    * "rows"); `hint` points the caller at the turnkey alternative. */
  def boundedPerKey(df: DataFrame, keyCol: String, limit: Long, op: String,
                    what: String, hint: String,
                    contract: String = "bounded-histogram"): Long =
    enforce(df.groupBy(col(keyCol)).agg(count(lit(1)).as("__k")),
      Bound(max(col("__k")), _ <= limit, m =>
        s"$op: a key holds $m $what, exceeding the $contract " +
          s"contract (limit=$limit). $hint")).head
}
