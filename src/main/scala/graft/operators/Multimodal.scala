package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * relational layer as opaque `binary` columns (SURVEY.md §1.3 — the
  * reference keeps frames as JPEG bytes inside its HDF5 containers,
  * `dpl/processor/nodes/h5.py:63-83`; we never decode in the relational
  * layer).
  *
  * Decode / feature-extraction runs as `mapPartitions` with explicit
  * batching — the Spark-side contract (schema, batch shape, partition
  * parallelism) is real; the codec itself is a deterministic STUB (this
  * container has no image/audio libraries): features are derived from the
  * payload's MD5 and length, so results are reproducible and oracle-
  * checkable while the real decoder can be dropped in per-executor later
  * (mirroring the reference's lazy `BaseResource` model loading,
  * `dpl/processor/nodes/base.py:30-54`).
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("media_hash", LongType, nullable = false),
    StructField("fake_width", LongType, nullable = false),
    StructField("fake_height", LongType, nullable = false)))

  /** First 15 hex chars of MD5 as a long — same value as
    * `graft.functions.md5_long` and the DuckDB oracle's
    * `('0x' || substr(md5(b),1,15))::BIGINT`. */
  def md5Long(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    // 15 hex chars = 60 bits = first 7 bytes + high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Deterministic stand-in for a real decoder (STUB — see object docs). */
  def decodeStub(id: Long, bytes: Array[Byte]): Row = {
    val h = md5Long(bytes)
    Row(id, bytes.length.toLong, h,
        java.lang.Math.floorMod(h, 1920L), java.lang.Math.floorMod(h, 1080L))
  }

  /** Batched per-partition feature extraction over (idCol: long,
    * payloadCol: binary). `batchSize` mirrors the reference's DataLoader
    * batching (`dpl/processor/nodes/emoca.py:106-115`): a real decoder
    * would amortize model/codec setup across each batch.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64): DataFrame = {
    val in = df.selectExpr(s"cast($idCol as long) as id",
                           s"cast($payloadCol as binary) as payload")
    in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would run vectorized decode
        batch.iterator.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    }(RowEncoder.encoderFor(featureSchema))
  }

  /** Time-domain energy-contour matrix for audio fingerprinting: splits
    * a waveform (array of integral samples) into `frames` x `segs`
    * contiguous segments of `segLen` samples each and emits the per-cell
    * energy (sum of squared samples — exact integer arithmetic surfaced
    * as double) as `array<array<double>>`, ready for
    * [[Dedup.dhashPairs]]. That pairing makes it the audio analogue of
    * the image dHash: the fingerprint bits are the SIGNS of
    * adjacent-segment energy differences, so the fingerprint is
    * invariant to uniform gain (all energies scale by c^2; signs
    * survive) and stable under small per-sample noise — the
    * constellation idea behind audio fingerprinters (Wang 2003 / Haitsma
    * & Kalker 2002) reduced to deterministic, SQL-replayable arithmetic.
    * A real mel/FFT filterbank would drop into the same (frames x bands)
    * grid per-executor — the §2.9 stub-weights stance for the DSP step,
    * with the Spark-side shape real.
    *
    * Samples beyond `frames*segs*segLen` are ignored. Clips SHORTER than
    * `frames*segs*segLen` samples degrade to a NULL matrix (and
    * [[functions.dhash_bands]] nulls the fingerprint — short clips drop
    * out of the dedup join rather than failing the job). The guard is an
    * explicit `when(size(samples) >= needed, ...)`: under Spark 4's
    * default ANSI mode an out-of-bounds `element_at` THROWS
    * (INVALID_ARRAY_INDEX_IN_ELEMENT_AT) instead of returning NULL, so
    * relying on past-the-end access would fail the whole job on one
    * short clip. The
    * samples column should be a materialized attribute (post-exchange /
    * checkpoint), not a staged expression: CollapseProject would
    * otherwise re-inline its construction into every one of the
    * `frames*segs*segLen` element accesses. */
  /** Scene-cut boundaries of a per-frame feature series (PySceneDetect's
    * content-detector shape collapsed to one feature channel): frame i
    * (1-based boundary, 0-based frames) is a cut when the absolute
    * frame-to-frame delta exceeds `threshold`. Pure array math per clip
    * — zero shuffle, embarrassingly parallel; the series rides a staged
    * column (the q90 Generate idiom) at call sites so this O(n) scan
    * evaluates once. Also reused for silence-run grouping: positions
    * cast to doubles with threshold 1 mark the starts of non-consecutive
    * runs. Guarded for n < 2 (Spark's sequence(1, 0) DESCENDS — an
    * unguarded short clip would fabricate boundaries). */
  def cutPositions(series: org.apache.spark.sql.Column,
                   threshold: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = size(series)
    when(n >= 2,
      filter(transform(sequence(lit(1), n - 1), i =>
        when(abs(element_at(series, i + 1) - element_at(series, i)) > threshold,
          i.cast("long")).otherwise(lit(-1L))),
        c => c >= 0))
      .otherwise(array().cast("array<long>"))
  }

  /** Expand cut boundaries into shot segments: cuts `c` over `nFrames`
    * frames yield |c|+1 shots [(0, c0), (c0, c1), …, (c_last, n)], each
    * a (shot_idx, start_frame, n_frames, keyframe) struct with the
    * keyframe sampled mid-shot (start + n div 2 — shiftright, not
    * double division). Call sites posexplode to scalar rows (the
    * driver's compare cannot hash list cells). */
  def shotsFromCuts(cuts: org.apache.spark.sql.Column,
                    nFrames: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val starts = concat(array(lit(0L)), cuts)
    val ends = concat(cuts, array(nFrames.cast("long")))
    transform(sequence(lit(0), size(cuts).cast("int")), j => {
      val s = element_at(starts, j + 1)
      val len = element_at(ends, j + 1) - s
      struct(j.cast("long").as("shot_idx"), s.as("start_frame"),
        len.as("n_frames"), (s + shiftright(len, 1)).as("keyframe"))
    })
  }

  /** Silence (VAD-style) run extraction over a per-frame level series:
    * frames with |level| < `threshold` are silent, and maximal runs of
    * at least `minRun` consecutive silent frames are emitted one ROW
    * each — (id, span_idx, start_frame, n_frames), the removal list an
    * audio trimmer consumes; clips with no qualifying run contribute
    * no rows. Built from the scene kernels over position space (run
    * boundary = position gap > 1) with every intermediate staged
    * through a Generate: the silent-position scan, the boundary list,
    * and the segment list each evaluate ONCE per clip. The first,
    * Column-composed version of this operator inlined the O(n) silent
    * scan into every downstream reference (the boundary scan, the
    * per-segment element_at, both guards) and measured 13.7 s on the
    * sf0.1 gate vs well under a second staged — the q90 CollapseProject
    * lesson applied to numeric kernels. One O(n) pass per clip, zero
    * shuffle. */
  def silenceRunRows(df: DataFrame, idCol: String, seriesCol: String,
                     threshold: Double, minRun: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(minRun >= 1, s"silenceRunRows needs minRun >= 1, got $minRun")
    val silExpr = when(size(col(seriesCol)) >= 1,
      filter(transform(sequence(lit(0), size(col(seriesCol)) - 1), i =>
        when(abs(element_at(col(seriesCol), i + 1)) < threshold,
          i.cast("long")).otherwise(lit(-1L))),
        p => p >= 0))
      .otherwise(array().cast("array<long>"))
    val staged = df.select(col(idCol), explode(array(silExpr)).as("sil"))
      .select(col(idCol), col("sil"),
        explode(array(cutPositions(transform(col("sil"), _.cast("double")),
          lit(1.0)))).as("bounds"))
      .select(col(idCol), col("sil"),
        explode(array(shotsFromCuts(col("bounds"), size(col("sil")))))
          .as("segs"))
    // the n_frames guard inside the transform runs BEFORE the length
    // filter: an all-loud clip has sil = [] and one zero-length segment,
    // whose element_at(sil, 1) would THROW under ANSI if evaluated
    staged
      .select(col(idCol), posexplode(filter(transform(col("segs"), seg =>
          struct(when(seg.getField("n_frames") >= 1, element_at(col("sil"),
              (seg.getField("start_frame") + 1).cast("int")))
              .otherwise(lit(0L)).as("start_frame"),
            seg.getField("n_frames").as("n_frames"))),
          r => r.getField("n_frames") >= minRun))
        .as(Seq("span_idx", "run")))
      .select(col(idCol), col("span_idx").cast("long").as("span_idx"),
        col("run.start_frame").as("start_frame"),
        col("run.n_frames").as("n_frames"))
  }

  /** Best-lag integer cross-correlation of two per-frame series — the
    * audio↔video SYNC-DRIFT estimator (find the frame offset aligning
    * an audio energy channel with a visual motion channel): for every
    * lag j in [-maxLag, maxLag], the dot product Σ a(i)·b(i+j) over the
    * valid overlap, then argmax by correlation with the SMALLEST lag on
    * ties (struct max over (corr, -lag)). Series are integer-valued
    * longs (cents), so sums are exact in any engine and any evaluation
    * order. O(n · maxLag) per clip, zero shuffle. A lag with EMPTY
    * overlap scores Long.MinValue and can never win; both input columns
    * must be staged attributes (post-Generate/exchange) — the kernel
    * references each element O(maxLag) times, and CollapseProject would
    * re-inline a staged expression into every access. Returns
    * struct(best_lag, best_corr). */
  def bestLagCorrelation(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column,
                         maxLag: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(maxLag >= 0, s"bestLagCorrelation needs maxLag >= 0, got $maxLag")
    val na = size(a).cast("long")
    val nb = size(b).cast("long")
    val cands = transform(sequence(lit(-maxLag.toLong), lit(maxLag.toLong)), j => {
      val iLo = greatest(lit(1L), lit(1L) - j)
      val iHi = least(na, nb - j)
      struct(
        when(iHi >= iLo,
          aggregate(sequence(iLo, iHi), lit(0L), (acc, i) =>
            acc + element_at(a, i.cast("int")).cast("long") *
              element_at(b, (i + j).cast("int")).cast("long")))
          .otherwise(lit(Long.MinValue)).as("corr"),
        (-j).as("neg_lag"))
    })
    val best = array_max(cands)
    struct((-best.getField("neg_lag")).as("best_lag"),
      best.getField("corr").as("best_corr"))
  }

  def audioEnergyMatrix(samples: org.apache.spark.sql.Column,
                        frames: Int, segs: Int, segLen: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(size(samples) >= lit(frames * segs * segLen),
      transform(sequence(lit(0), lit(frames - 1)), i =>
        transform(sequence(lit(0), lit(segs - 1)), j =>
          aggregate(sequence(lit(0), lit(segLen - 1)), lit(0L), (acc, k) => {
            val v = element_at(samples,
              i * lit(segs * segLen) + j * lit(segLen) + k + lit(1)).cast("long")
            acc + v * v
          }).cast("double"))))
  }
  /** Per-clip loudness statistics from an integer amplitude series:
    * sample count, absolute peak, and RMS — the normalization /
    * clipping-detection pass an audio pipeline runs before gain
    * staging. Peak and the sum of squares accumulate as exact longs
    * (amplitude² × clip length stays far inside int64 for integer-cent
    * channels), so the single `sqrt` is the only floating-point op and
    * the result is engine-exact (sqrt is correctly rounded IEEE,
    * unlike ln). Map-only over the series column; empty clips drop.
    */
  def loudnessStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                    seriesCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // widen BEFORE multiplying/negating: for an array<int> series x*x is
    // 32-bit (silent wrap, or ANSI overflow) and abs(Int.MinValue) wraps —
    // the long accumulator only protects the SUM, not the products
    df.select(col(idCol),
        size(col(seriesCol)).cast("long").as("n"),
        array_max(transform(col(seriesCol),
          v => abs(v.cast("long")))).as("peak"),
        aggregate(col(seriesCol), lit(0L),
          (acc, x) => acc + x.cast("long") * x.cast("long")).as("ss"))
      .where(col("n") > 0)
      .select(col(idCol), col("n"), col("peak"),
        sqrt(col("ss").cast("double") / col("n").cast("double")).as("rms"))
  }

  /** FREEZE / STATIC-SEGMENT detection over a clip's per-frame signal
    * — the complement of [[cutPositions]] (cuts find where the signal
    * JUMPS; this finds where it STOPS MOVING): maximal runs of
    * consecutive frames whose integer signal moves by at most `eps`
    * flag stuck encoders, frozen webcams, slate/test-card padding and
    * duplicated-frame transcodes — the segments a training pipeline
    * trims before a model learns that nothing ever moves.
    *
    * Frame i continues a freeze iff |v(i) − v(i−1)| ≤ eps; a segment
    * of r continuation frames covers r+1 frames starting at the
    * anchor. The gaps-and-islands shape: long form, per-key lag, then
    * island id = frame − row_number over the flagged rows — all exact
    * integer arithmetic (the signal arrives as integer-valued doubles
    * — cents/quantized luma — and is cast, not rounded). Windows
    * partition by clip (bounded by one clip's frames, the sessionize
    * discipline). Output: (key, start_frame, n_frames) for segments
    * covering >= minFrames frames. */
  def freezeSegments(df: DataFrame, keyCol: String, seriesCol: String,
                     eps: Long, minFrames: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(eps >= 0, s"freezeSegments needs eps >= 0, got $eps")
    require(minFrames >= 2, s"freezeSegments needs minFrames >= 2")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__i"))
    val flagged = df
      .select(col(keyCol), posexplode(col(seriesCol)).as(Seq("__i", "__v")))
      .withColumn("__vl", col("__v").cast("long"))
      .withColumn("__pv", lag(col("__vl"), 1).over(w))
      .where(col("__pv").isNotNull &&
        abs(col("__vl") - col("__pv")) <= eps)
    flagged
      .withColumn("__isl", col("__i") - row_number().over(w))
      .groupBy(col(keyCol), col("__isl"))
      .agg(min(col("__i")).as("__first"), count(lit(1)).as("__run"))
      .where(col("__run") + 1L >= minFrames.toLong)
      .select(col(keyCol), (col("__first") - 1L).as("start_frame"),
        (col("__run") + 1L).as("n_frames"))
  }

  /** The SDXL-style aspect-ratio bucket grid (public: the
    * multi-aspect training recipe buckets every image to the nearest
    * of a fixed (w, h) grid so batches share one shape). Order
    * matters: ties resolve to the EARLIER bucket. */
  val AspectBuckets: Seq[(Long, Long)] = Seq(
    (1024L, 1024L), (1152L, 896L), (896L, 1152L), (1216L, 832L),
    (832L, 1216L), (1344L, 768L), (768L, 1344L), (1536L, 640L),
    (640L, 1536L))

  /** ASPECT-RATIO BUCKET ASSIGNMENT for multi-aspect image training
    * (the SDXL recipe): each (width, height) maps to the bucket
    * minimizing the aspect-ratio distance |w/h − bw/bh|, so the
    * dataloader can batch same-shape images without cropping surprises.
    *
    * Exactness: the argmin runs entirely in int64 — |w/h − bw/bh| =
    * |w·bh − h·bw| / (h·bh), and with h common across candidates the
    * ranking needs only |w·bh − h·bw| / bh, compared EXACTLY across
    * buckets by scaling each to the shared denominator L = lcm of all
    * bucket heights: cost_b = |w·bh − h·bw| · (L/bh). No floating
    * point anywhere; ties take the earlier bucket in the grid (the
    * square first). w, h are CHECKED positive and ≤ 10⁶ (keeps
    * cost ≤ ~10¹⁵·L/bh within int64).
    *
    * Scale shape: ONE fold over the 9-bucket literal grid per row —
    * map-only, codegen-friendly, no explode, no join, no shuffle.
    * Output: input columns + (bucket_w, bucket_h, cost_scaled). */
  def aspectBucketAssign(df: DataFrame, wCol: String,
                         hCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Contracts.enforce(df,
      Contracts.Bound(sum(when(col(wCol).isNull || col(hCol).isNull ||
        col(wCol) <= 0L || col(hCol) <= 0L || col(wCol) > 1000000L ||
        col(hCol) > 1000000L, 1L).otherwise(0L)), _ == 0L, b =>
        s"aspectBucketAssign: $b rows carry NULL/non-positive/" +
          "oversized dimensions (0 < w, h <= 1e6 required)"))
    val lcm = AspectBuckets.map(_._2).foldLeft(BigInt(1))((a, b) =>
      a * b / a.gcd(BigInt(b))).toLong
    val grid = array(AspectBuckets.zipWithIndex.map { case ((bw, bh), i) =>
      struct(lit(i.toLong).as("i"), lit(bw).as("bw"), lit(bh).as("bh"),
        lit(lcm / bh).as("m"))
    }: _*)
    val w = col(wCol).cast("long")
    val h = col(hCol).cast("long")
    val best = aggregate(grid,
      struct(lit(Long.MaxValue).as("cost"), lit(0L).as("bw"),
        lit(0L).as("bh")),
      (acc, b) => {
        val cost = abs(w * b.getField("bh") - h * b.getField("bw")) *
          b.getField("m")
        when(cost < acc.getField("cost"),
          struct(cost.as("cost"), b.getField("bw").as("bw"),
            b.getField("bh").as("bh"))).otherwise(acc)
      })
    df.withColumn("__b", best)
      .withColumn("bucket_w", col("__b.bw"))
      .withColumn("bucket_h", col("__b.bh"))
      .withColumn("cost_scaled", col("__b.cost"))
      .drop("__b")
  }
}
