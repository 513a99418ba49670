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
}
