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

  /** Multi-eval-set decontamination in ONE training scan — the
    * eval-hygiene pass a real pretraining build runs (GPT-3 paper
    * appendix C; Dolma's decontamination stage): every training document
    * is checked for n-gram overlap against EVERY held-out benchmark at
    * once, instead of K separate corpus scans.
    *
    * `heldOut`: (set_name, shingles array<string>) — one row per
    * held-out document; `train`: (doc_id, shingles). One grouped scan of
    * the held-out side builds K Bloom filters; a bounded driver collect
    * (K x numBits/8 bytes) turns them into PLAN-TIME LITERALS — the q75
    * lesson: a crossJoin column would copy every filter's bytes into
    * every probe row, while a literal rides inside the codegen'd
    * predicate. The training side then explodes ONCE into a per-doc
    * aggregate with one conditional-sum column per set, so K
    * memberships cost one pass over the shingle stream; a final
    * post-aggregate explode reshapes wide -> long (aggregate outputs
    * are real attributes — nothing recomputes).
    *
    * Output: (doc_id, eval_set, n_shingles, n_hits, contaminated),
    * |train| x K rows — identical, set for set, to running the
    * single-set decontaminator K times (the oracle proves exactly
    * that). */
  def multiBloomDecontaminate(heldOut: DataFrame, train: DataFrame,
                              numBits: Int, numHashes: Int): DataFrame = {
    // The set roster comes from a DISTINCT over set_name, not from the
    // grouped Bloom build: a held-out set whose documents all have empty
    // (or NULL) shingle arrays vanishes at the explode, and dropping it
    // from the roster would silently break the |train| x K row contract.
    // Such a set gets the all-zero filter (correct: zero shingles = zero
    // possible hits), so it still emits its |train| rows with n_hits = 0.
    val setNames = heldOut.select(col("set_name")).distinct()
      .collect().map(_.getString(0)).sorted
    require(setNames.nonEmpty, "multiBloomDecontaminate needs >= 1 held-out set")
    val built = heldOut
      .select(col("set_name"), explode(col("shingles")).as("sg"))
      .groupBy("set_name")
      .agg(bloom_agg(col("sg"), numBits, numHashes).as("f"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val blooms = setNames.map(n =>
      n -> built.getOrElse(n, new Array[Byte]((numBits + 7) / 8)))
    // Hit columns are aliased by ROSTER INDEX, never by raw set name —
    // an exotic set name (dots, backticks, duplicates after case folding)
    // must not be able to collide with or break column resolution.
    val hitCols = blooms.zipWithIndex.map { case ((_, bytes), i) =>
      sum(when(bloom_contains(lit(bytes), col("sg"), numBits, numHashes), 1L)
        .otherwise(0L)).as(s"__h_$i")
    }
    train.select(col("doc_id"), explode_outer(col("shingles")).as("sg"))
      .groupBy("doc_id")
      .agg(count(col("sg")).as("n_shingles"), hitCols.toSeq: _*)
      .select(col("doc_id"), col("n_shingles"),
        explode(array(blooms.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(name).as("eval_set"), col(s"__h_$i").as("n_hits"))
        }.toSeq: _*)).as("e"))
      .select(col("doc_id"), col("e.eval_set").as("eval_set"),
        col("n_shingles"), col("e.n_hits").as("n_hits"),
        (col("e.n_hits") > 0).as("contaminated"))
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

  /** JOIN-CARDINALITY ESTIMATE from two count-min sketches — the
    * plan-before-you-pay primitive: |A ⋈ B| on a key equals
    * Σ_k cntA(k)·cntB(k), and the CMS row-wise inner product
    *
    *   est = min_j Σ_pos a[j][pos] · b[j][pos]
    *
    * upper-bounds it with over-count-only error (Cormode & Muthu-
    * krishnan's inner-product estimator) — so a pipeline can ask "is
    * this join going to explode?" from two d×w counter rows instead
    * of running the join. Each side is ONE partial-aggregated scan
    * collapsing to a single broadcast-sized sketch row; the estimate
    * is a fixed HOF shape (zip_with product, per-row slice sums,
    * array_min) over exact long counters — deterministic and oracle-
    * replayable cell-for-cell. The nA·nB int64 envelope (the exact
    * inner product is bounded by it) is CHECKED in the same one-row
    * projection, not documented: a raise_error branch rejects
    * nA·nB > 4·10¹⁸ loudly. At 100 TB that means sketching the join
    * KEY DISTRIBUTION of a sampled/filtered slice, not 10⁹×10⁹ raw
    * rows — the planner use, not the executor use.
    * Output: one row (n_a, n_b, est_join_size). */
  def cmsJoinSize(dfA: DataFrame, keyA: Column, dfB: DataFrame,
                  keyB: Column, depth: Int, width: Int,
                  maxExactProduct: Long = 4000000000000000000L): DataFrame = {
    require(maxExactProduct <= 4000000000000000000L,
      s"cmsJoinSize: maxExactProduct $maxExactProduct exceeds the " +
        "inner-product int64 capacity (4e18)")
    val skA = dfA.agg(cms_agg(keyA, depth, width).as("__a"),
      count(keyA).as("n_a"))
    val skB = dfB.agg(cms_agg(keyB, depth, width).as("__b"),
      count(keyB).as("n_b"))
    val zip = zip_with(col("__a"), col("__b"), (x, y) => x * y)
    val rowSums = transform(sequence(lit(0), lit(depth - 1)), j =>
      aggregate(slice(zip, j * lit(width) + lit(1), lit(width)),
        lit(0L), (acc, x) => acc + x))
    skA.crossJoin(skB)
      .where(when(col("n_a").cast("double") * col("n_b").cast("double")
          > maxExactProduct.toDouble,
        raise_error(lit("cmsJoinSize: nA*nB exceeds the inner-product " +
          s"int64 exactness contract (nA*nB <= $maxExactProduct) — " +
          "sketch sampled/filtered slices of the join inputs instead"))
          .isNotNull)
        .otherwise(lit(true)))
      .select(col("n_a"), col("n_b"),
        array_min(rowSums).as("est_join_size"))
  }

  /** Per-group ROBUST outlier flagging — median/MAD instead of
    * mean/stddev, so a heavy-tailed quality or length distribution (the
    * norm in web corpora) doesn't let its own outliers inflate the
    * threshold that should catch them. Both statistics come from the
    * mergeable equi-width histogram sketch: pass 1 sketches each group
    * (nBins Long counters cross the shuffle, never the values) and
    * interpolates the median; pass 2 sketches |x − median| per group
    * the same way for the MAD. Group stats stay group-count-sized and
    * broadcast back; the flag pass is map-only. Deterministic: the
    * sketch is a pure function of the input multiset and the
    * interpolation replays exactly (the q66 discipline), so the
    * boundary comparison |x − med| > k·MAD is engine-stable.
    * Output: every input row + (med, mad, is_outlier). */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     lo: Double, hi: Double, nBins: Int,
                     k: Double): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(hist_agg(col(valueCol), lo, hi, nBins).as("__h"))
      .select(col(groupCol),
        hist_quantile(col("__h"), 0.5, lo, hi, nBins).as("med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__absdev", abs(col(valueCol) - col("med")))
    // the deviation range is [0, hi - lo] by construction
    val mad = dev.groupBy(col(groupCol), col("med"))
      .agg(hist_agg(col("__absdev"), 0.0, hi - lo, nBins).as("__h2"))
      .select(col(groupCol), col("med"),
        hist_quantile(col("__h2"), 0.5, 0.0, hi - lo, nBins).as("mad"))
    df.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }
}
