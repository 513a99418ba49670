package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join — the relational form of the reference's
  * audio->video temporal alignment (`dpl/processor/nodes/a2en.py:41-42`,
  * SURVEY §2.3: "a range/as-of join of (t, feature) to frame timestamps").
  *
  * Spark has no as-of join operator; rather than a custom SparkPlan, this
  * uses the classic union + running-last-value formulation, which Catalyst
  * executes as ONE shuffle + sort per side (the same cost a dedicated
  * merge-based as-of physical operator would pay):
  *
  *   1. tag right rows 0, left rows 1; union by name;
  *   2. window per key ordered by (ts, tag): `last(value, ignoreNulls)`
  *      over unbounded-preceding..current carries the most recent right
  *      value forward (right sorts before left on ties, so equal
  *      timestamps match — DuckDB ASOF `>=` semantics);
  *   3. keep left rows; inner semantics drop rows with no prior right row.
  *
  * Right must be unique per (key, ts) — as-of is otherwise ambiguous in
  * any engine; pre-aggregate duplicates.
  */
object AsOf {

  /** @param left     any schema containing `key` and `ts`
    * @param right    exactly (key, ts, value columns...); unique (key, ts)
    * @param inner    drop left rows with no match (true) or keep with null
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               inner: Boolean = true): DataFrame = {
    val valueCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(valueCols.nonEmpty, "right side needs at least one value column")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns ${valueCols.mkString(",")} collide with left schema")

    val taggedRight = right.withColumn("_side", lit(0))
      .select((Seq(col(key), col(ts), col("_side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col)): _*)
    val taggedLeft = left.withColumn("_side", lit(1))
      .select((Seq(col(key), col(ts), col("_side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val result = filled.where(col("_side") === 1).drop("_side")
    if (inner) result.where(valueCols.map(c => col(c).isNotNull).reduce(_ && _))
    else result
  }

  /** As-of join through the engine's custom Catalyst operator
    * ([[graft.plans.AsofJoinPlan]] -> [[graft.plans.AsofJoinExec]]): one
    * shuffle + sort per side and a merge scan, instead of the union +
    * running-last-value window above (which sorts both sides together and
    * carries null-padded union rows through the shuffle). Same semantics:
    * latest right row with ts <= left ts per key, ties match.
    *
    * The planner strategy is registered idempotently on the live session;
    * sessions built with `spark.sql.extensions=graft.plans.GraftExtensions`
    * already have it.
    */
  def asofJoinMerge(left: DataFrame, right: DataFrame, key: String, ts: String,
                    inner: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val valueCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(valueCols.nonEmpty, "right side needs at least one value column")
    require(!valueCols.exists(left.columns.contains),
      s"value columns ${valueCols.mkString(",")} collide with left schema")
    val spark = left.sparkSession
    PlanBridge.addStrategy(spark, graft.plans.AsofJoinStrategy)
    val lPlan = PlanBridge.analyzed(left)
    // Re-alias the right side with fresh exprIds: in a self-join both
    // sides share attribute ids, and the analyzer's DeduplicateRelations
    // cannot tell which of the node's stored references belong to which
    // child. The alias layer gives the node's right-side references ids
    // that exist only in the right subtree.
    val rAliased = {
      import org.apache.spark.sql.catalyst.expressions.Alias
      import org.apache.spark.sql.catalyst.plans.logical.Project
      val rPlan = PlanBridge.analyzed(right)
      Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    }
    val rAttrs = rAliased.projectList.map(_.toAttribute)
    def attr(as: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
             n: String) = as.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not found in [${as.map(_.name).mkString(", ")}]"))
    PlanBridge.ofRows(spark, graft.plans.AsofJoinPlan(
      lPlan, rAliased, attr(lPlan.output, key), attr(rAttrs, key),
      attr(lPlan.output, ts), attr(rAttrs, ts), inner))
  }

  /** Forward as-of: the EARLIEST right row at-or-after each left ts —
    * backward as-of on the negated time axis, reusing the same merge exec
    * (min ts_r with ts_r >= ts_e == max -ts_r with -ts_e >= -ts_r).
    * `ts` must be numeric (epoch nanos/micros), not a timestamp type. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      ts: String, inner: Boolean = true): DataFrame = {
    val neg = "__asof_neg_ts"
    val l = left.withColumn(neg, -col(ts))
    // drop the right's original ts so it isn't treated as a value column
    val r = right.withColumn(neg, -col(ts)).drop(ts)
    asofJoinMerge(l, r, key, neg, inner).drop(neg)
  }
}
