package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Sketch-backed corpus operators: Bloom semi-join pruning and count-min
  * frequency probes.
  *
  * Scale posture: both sketches collapse an arbitrarily large input to ONE
  * broadcastable row (m/8 bytes for Bloom, depth*width*8 bytes for CMS)
  * via partial aggregation, so the expensive side of the computation —
  * probing — is a map-only pass over the big table with zero shuffle. This
  * is the runtime-filter pattern (prune a 100 TB probe scan with a filter
  * built from the small build side) exposed as first-class operators, and
  * every bit of both sketches is md5-derived and deterministic, so results
  * (including Bloom false positives) are engine- and partitioning-stable.
  */
object Sketches {

  /** Rows of `probe` whose `probeKey` tests positive against a Bloom
    * filter built from `build`'s `buildKey` — no false negatives,
    * deterministic false positives. The filter is one aggregated row,
    * broadcast to the probe side; at scale this drops most of the probe
    * table before any exact (shuffling) join runs. */
  def bloomSemiJoinPrune(
      build: DataFrame,
      buildKey: Column,
      probe: DataFrame,
      probeKey: Column,
      numBits: Int,
      numHashes: Int): DataFrame = {
    val filter = build.agg(bloom_agg(buildKey, numBits, numHashes).as("__bloom"))
    probe.crossJoin(broadcast(filter))
      .where(bloom_contains(col("__bloom"), probeKey, numBits, numHashes))
      .drop("__bloom")
  }

  /** Count-min frequency estimates for `probes` (a one-column DataFrame of
    * string keys) against the value distribution of `values`: one scan of
    * `values` building a single depth x width counter row, broadcast to
    * the probe side. Output: (key, est_cnt). */
  def cmsFrequencies(
      values: DataFrame,
      valueKey: Column,
      probes: DataFrame,
      probeKey: Column,
      depth: Int,
      width: Int): DataFrame = {
    val sketch = values.agg(cms_agg(valueKey, depth, width).as("__cms"))
    probes.crossJoin(broadcast(sketch))
      .withColumn("est_cnt", cms_query(col("__cms"), probeKey, depth, width))
      .drop("__cms")
  }
}
