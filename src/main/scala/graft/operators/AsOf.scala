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

  /** Resample an irregular observation stream onto a fixed time grid with
    * last-observation-carried-forward semantics — the event-stream →
    * feature-grid operator every training pipeline needs before windowed
    * models can consume sensor/telemetry data (the batch analogue of the
    * reference's audio→frame-grid alignment, `dpl/processor/nodes/
    * a2en.py:41-42`, which snaps a continuous signal onto the video's
    * frame clock).
    *
    * Grid points are the multiples of `stepNs` inside the stream's global
    * [min ts, max ts]; each (key, grid point) carries the latest
    * observation at-or-before it (inner semantics drop points before a
    * key's first observation). `obs` must be unique per (key, ts) —
    * pre-aggregate duplicates, as for any as-of join.
    *
    * Scale shape: the bounds are ONE aggregation collapsing to two plan
    * literals (never data-sized); the grid is built distributively — each
    * key row explodes its own `sequence(first, last, step)`, so grid
    * construction parallelizes over keys with no driver loop; the fill is
    * the merge as-of exec (one shuffle + sort per side). Output is
    * keys × span/step rows — the caller picks `stepNs` to size it.
    */
  def gridResample(obs: DataFrame, key: String, ts: String,
                   stepNs: Long, inner: Boolean = true): DataFrame = {
    require(stepNs > 0, s"stepNs must be positive, got $stepNs")
    val bounds = obs.agg(min(col(ts)).cast("long"), max(col(ts)).cast("long"))
      .head()
    val keys = obs.select(col(key)).distinct()
    val grid =
      if (bounds.isNullAt(0)) // empty stream -> empty grid, same schema
        keys.select(col(key), lit(0L).as(ts)).where(lit(false))
      else {
        val tmin = bounds.getLong(0)
        val tmax = bounds.getLong(1)
        // first grid point at-or-after tmin, last at-or-before tmax
        // (floorDiv: exact for negative epochs too)
        val first = Math.floorDiv(tmin + stepNs - 1, stepNs) * stepNs
        val last = Math.floorDiv(tmax, stepNs) * stepNs
        if (first > last) // span shorter than one step -> no grid points
          keys.select(col(key), lit(0L).as(ts)).where(lit(false))
        else
          keys.select(col(key),
            explode(sequence(lit(first), lit(last), lit(stepNs))).as(ts))
      }
    asofJoinMerge(grid, obs, key, ts, inner)
  }

  /** [[gridResample]] with LINEAR interpolation instead of LOCF — the
    * resampling a continuous signal (sensor series, price curve, audio
    * envelope) wants where a step signal wants carry-forward. Each
    * (key, grid point g) finds its bracketing observations via TWO
    * merge as-of passes (backward for (t0, v0), forward for (t1, v1))
    * and interpolates with EXACT integer arithmetic:
    *
    *   v(g) = floor( (v0·(t1−g) + v1·(g−t0)) / (t1−t0) )
    *
    * — the floor division is spelled `(num − pmod(num, den)) div den`
    * so both engines floor identically for negative numerators (Spark's
    * `div` truncates toward zero, DuckDB's `//` floors; the explicit
    * remainder subtraction makes the quotient exact in both). Grid
    * points at-or-after a key's last observation carry v0 (the LOCF
    * tail — no forward extrapolation invents data); points before the
    * first observation drop (inner semantics, as in [[gridResample]]).
    * An observation exactly on a grid point brackets itself (t0 = t1)
    * and passes through untouched.
    *
    * `valueCol` must be integral, and the v·(t1−t0) int64 envelope is
    * CHECKED per row, not documented: a raise_error branch inside the
    * interpolation projection rejects any bracket whose
    * |v0|·(t1−g) + |v1|·(g−t0) tops 4·10¹⁸ (double-compare — exact to
    * 1 part in 10¹⁶, with a 2× margin under the true 9.2·10¹⁸
    * capacity), so a cents×micros feed fails loudly instead of
    * wrapping (e.g. keep integer cents × micro-second gaps over a
    * bounded horizon, NOT nanos over years). Same scale shape as
    * [[gridResample]]: two-literal bounds, per-key distributed grid
    * build, one shuffle + sort per as-of side. */
  def gridResampleLinear(obs: DataFrame, key: String, ts: String,
                         valueCol: String, stepNs: Long): DataFrame = {
    require(stepNs > 0, s"stepNs must be positive, got $stepNs")
    val o = obs.select(col(key), col(ts).cast("long").as(ts),
      col(valueCol).cast("long").as(valueCol))
    val bounds = o.agg(min(col(ts)).cast("long"), max(col(ts)).cast("long"))
      .head()
    val keys = o.select(col(key)).distinct()
    val grid =
      if (bounds.isNullAt(0))
        keys.select(col(key), lit(0L).as(ts)).where(lit(false))
      else {
        val first = Math.floorDiv(bounds.getLong(0) + stepNs - 1, stepNs) * stepNs
        val last = Math.floorDiv(bounds.getLong(1), stepNs) * stepNs
        if (first > last)
          keys.select(col(key), lit(0L).as(ts)).where(lit(false))
        else
          keys.select(col(key),
            explode(sequence(lit(first), lit(last), lit(stepNs))).as(ts))
      }
    val back = asofJoinMerge(grid,
      o.select(col(key), col(ts), col(valueCol).as("__v0"),
        col(ts).as("__t0")),
      key, ts, inner = false)
    val both = asofJoinForward(back,
      o.select(col(key), col(ts), col(valueCol).as("__v1"),
        col(ts).as("__t1")),
      key, ts, inner = false)
    both
      .where(col("__t0").isNotNull) // no backward extrapolation
      // checked int64 envelope: |v0|·(t1−g) + |v1|·(g−t0) ≤ 4e18 per
      // bracket, verified with a double compare BEFORE the long
      // products form (LOCF tails with __t1 null skip — they never
      // multiply)
      .where(when(col("__t1").isNotNull &&
          abs(col("__v0")).cast("double")
            * (col("__t1") - col(ts)).cast("double")
          + abs(col("__v1")).cast("double")
            * (col(ts) - col("__t0")).cast("double") > 4e18,
        raise_error(lit("gridResampleLinear: v*(t1-t0) exceeds the " +
          "int64 exactness contract (|v0|*(t1-g)+|v1|*(g-t0) <= 4e18)" +
          " — rescale values or coarsen the time axis")).isNotNull)
        .otherwise(lit(true)))
      .withColumn("__num", col("__v0") * (col("__t1") - col(ts))
        + col("__v1") * (col(ts) - col("__t0")))
      .withColumn("__den", col("__t1") - col("__t0"))
      .select(col(key), col(ts),
        when(col("__t1").isNull || col("__den") === 0L, col("__v0"))
          // `div` truncates; subtracting the (nonnegative) pmod first
          // makes the quotient exact, i.e. a true floor
          .otherwise(expr("(__num - pmod(__num, __den)) div __den"))
          .as(valueCol))
  }

  /** As-of join with a STALENESS BOUND (pandas `merge_asof(...,
    * tolerance=...)`): the latest right row at-or-before each left ts,
    * but only if it is at most `tolerance` old — a quote matched to a
    * trade from last week is not a fill, a sensor reading hours stale
    * is not a feature. Rides the same merge exec; the right's timestamp
    * is carried through as `matchTsCol` and the bound applied as ONE
    * post-filter — equivalent to filtering inside the merge, because
    * the as-of match is unique per left row (too-stale match ⇒ no
    * in-tolerance match exists at all). Inner semantics drop unmatched
    * AND too-stale rows; outer keeps them with nulls (staleness
    * violations null out their value columns).
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        ts: String, tolerance: Long,
                        matchTsCol: String = "match_ts",
                        inner: Boolean = true): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val valueCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val r = right.withColumn(matchTsCol, col(ts))
    val joined = asofJoinMerge(left, r, key, ts, inner = false)
    val stale = col(matchTsCol).isNotNull &&
      col(ts) - col(matchTsCol) > tolerance
    if (inner) joined.where(col(matchTsCol).isNotNull && !stale)
    else {
      // outer: null out the value columns of too-stale matches
      val cleared = (valueCols :+ matchTsCol).foldLeft(joined) { (df, c) =>
        df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
      }
      cleared
    }
  }

  /** LAST-TOUCH ATTRIBUTION — the standard marketing/funnels rollup
    * riding the tolerance as-of exec: each conversion is credited to
    * the LATEST touch of the same key at-or-before it and within
    * `tolerance` (ns); conversions with no eligible touch land in the
    * `(unattributed)` bucket, so the output always accounts for every
    * conversion (Σ n_conversions == conversion count — the audit
    * property a filtered inner join silently breaks).
    *
    * Touches collapse to one row per (key, ts) first (max channel —
    * the as-of right side needs a unique time axis or equal-ts picks
    * are tie-ambiguous); the join is the MERGE as-of (co-partitioned
    * by key, sorted within — never a window over the touch history),
    * and the rollup is one map-side-combining aggregation over the
    * channel cardinality. Exact long value sums.
    * Output: (channel, n_conversions, attributed_value). */
  def lastTouchAttribution(conversions: DataFrame, touches: DataFrame,
                           key: String, ts: String, valueCol: String,
                           channelCol: String,
                           tolerance: Long): DataFrame = {
    val tt = touches.groupBy(col(key), col(ts))
      .agg(max(col(channelCol)).as(channelCol))
    asofJoinTolerance(
      conversions.select(col(key), col(ts),
        col(valueCol).cast("long").as(valueCol)),
      tt, key, ts, tolerance, inner = false)
      .groupBy(coalesce(col(channelCol), lit("(unattributed)"))
        .as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol)).as("attributed_value"))
  }
}
