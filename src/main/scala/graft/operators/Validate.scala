package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the expectations-suite shape):
  * a check list compiles to the MINIMUM number of jobs — every
  * row-predicate check on the same table folds into ONE aggregation
  * pass (conditional sums, map-side combining), uniqueness adds one
  * groupBy, referential integrity one anti-join per dimension — and the
  * result is a uniform per-check report (check, violations, passed)
  * a pipeline gate can alert on. The contract-enforcement front door of
  * a 100 TB ingest: run before anything expensive touches the batch.
  */
object Validate {

  sealed trait Check { def name: String }

  /** Column must be non-null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }

  /** Column must lie in [lo, hi] (inclusive); nulls count as violations. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range:$col"
  }

  /** Column must be one of the accepted values; nulls violate. */
  final case class Accepted(col: String, values: Seq[String]) extends Check {
    def name = s"accepted:$col"
  }

  /** Row predicate must hold (violations = rows where it is false or
    * null). */
  final case class Predicate(label: String, expr: Column) extends Check {
    def name = s"predicate:$label"
  }

  /** The key columns must be unique (violations = rows beyond the first
    * of each duplicated key). */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Every foreign key must exist in `dim.pk` (violations = rows whose
    * non-null fk has no match; null fks pass — compose with NotNull to
    * forbid them). */
  final case class RefIntegrity(fk: String, dim: DataFrame, pk: String)
      extends Check {
    def name = s"ref:$fk"
  }

  /** `valueCol` must be non-decreasing within each key group under the
    * (orderCol, tieCol) order — the event-log sanity check (timestamps
    * never step backwards within a session, versions never regress per
    * doc). A violation is a row whose value is BELOW its predecessor's.
    * Costs one lag() window partitioned by the key columns (bounded by
    * one group's rows — the sessionize discipline, never global) — the
    * one check class that cannot fold into the shared aggregation
    * pass. */
  final case class MonotonicBy(keyCols: Seq[String], orderCol: String,
                               tieCol: String, valueCol: String)
      extends Check {
    def name = s"monotonic:$valueCol"
  }

  /** Run a check suite over one table. Returns
    * (check: string, violations: long, passed: boolean), one row per
    * check, deterministic order-independent content. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val spark = df.sparkSession

    def rowPredicate(c: Check): Option[(String, Column)] = c match {
      case NotNull(cl) => Some(c.name -> col(cl).isNotNull)
      case InRange(cl, lo, hi) =>
        Some(c.name -> (col(cl).isNotNull && col(cl) >= lo && col(cl) <= hi))
      case Accepted(cl, vs) => Some(c.name -> col(cl).isin(vs: _*))
      case Predicate(_, e) => Some(c.name -> coalesce(e, lit(false)))
      case _ => None
    }

    // all row-predicate checks: ONE aggregation pass over the table
    val preds = checks.flatMap(rowPredicate)
    val predReport: Option[DataFrame] =
      if (preds.isEmpty) None
      else {
        val aggs = preds.map { case (n, p) =>
          sum(when(p, 0L).otherwise(1L)).as(n)
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the one-row aggregate into (check, violations)
        Some(row.select(explode(array(preds.map { case (n, _) =>
          struct(lit(n).as("check"), coalesce(col(s"`$n`"), lit(0L))
            .as("violations"))
        }: _*)).as("r")).select(col("r.check"), col("r.violations")))
      }

    val others = checks.collect {
      case u @ Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"))
          .select(lit(u.name).as("check"), col("violations"))
      case r @ RefIntegrity(fk, dim, pk) =>
        df.where(col(fk).isNotNull)
          .join(dim.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("check"), col("violations"))
      case m @ MonotonicBy(keys, ord, tie, vc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(ord), col(tie))
        df.select(col(vc).as("__v"),
            lag(col(vc), 1).over(w).as("__pv"))
          .agg(sum(when(col("__pv").isNotNull && col("__v") < col("__pv"),
            1L).otherwise(0L)).as("violations"))
          .select(lit(m.name).as("check"),
            coalesce(col("violations"), lit(0L)).as("violations"))
    }

    val all = (predReport.toSeq ++ others).reduce(_ unionByName _)
    all.select(col("check"), col("violations"),
      (col("violations") === 0L).as("passed"))
  }
}
