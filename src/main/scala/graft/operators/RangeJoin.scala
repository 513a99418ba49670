package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via time binning — the scale-safe form of
  * `probe.ts BETWEEN w.start AND w.end`. A naive θ-join on the range
  * predicate degenerates to broadcast-nested-loop (quadratic per key);
  * here both sides are hashed into fixed-width bins of the time axis, the
  * window side replicated to every bin it overlaps, and the θ-condition
  * becomes a shuffled **equi-join** on (key, bin) plus a residual filter.
  * With bin width >= the max window length each window lands in at most
  * ceil(len/bin)+1 bins, so replication is bounded and the shuffle
  * partitions by (key, bin) — skew on hot keys is spread across bins and
  * AQE's skew-join splitter handles the rest.
  *
  * Reference analogue: the audio->video temporal alignment is a range
  * lookup of feature timestamps into frame intervals
  * (`dpl/wav2vec/utils.py:5-21`); this operator is its relational form.
  */
object RangeJoin {

  /** Join probe rows (keyed, instant `tsCol`, in the same units as the
    * window bounds) to windows (keyed, [startCol, endCol) half-open) whose
    * interval contains the instant. All columns of both inputs survive. */
  def binnedRangeJoin(probe: DataFrame, probeKey: String, tsCol: String,
                      windows: DataFrame, winKey: String,
                      startCol: String, endCol: String,
                      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    // integer `div`, not floating `/`: nanosecond epochs (~1.7e18) lose
    // precision in double arithmetic
    val wb = windows.withColumn("__bin",
      explode(sequence(expr(s"$startCol div ${binSize}L"),
        expr(s"($endCol - 1) div ${binSize}L"))))
    val pb = probe.withColumn("__bin", expr(s"$tsCol div ${binSize}L"))
    pb.join(wb,
        pb(probeKey) === wb(winKey) && pb("__bin") === wb("__bin") &&
          pb(tsCol) >= wb(startCol) && pb(tsCol) < wb(endCol))
      .drop("__bin")
  }
}
