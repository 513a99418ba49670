package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StructType

/** Batched per-partition model inference with lazily-loaded per-executor
  * resources — the Spark translation of the reference's `BaseResource`
  * lazy load/unload protocol (`dpl/processor/nodes/base.py:30-54`) and its
  * DataLoader batching (`audio.py:85-92`, `emoca.py:106-115`).
  *
  * A `ModelResource` describes how to construct the model once per executor
  * JVM; `ModelOp.mapBatches` runs a vectorized function over row batches.
  * The actual runtimes (wav2vec, face detector, EMOCA) are pluggable —
  * this container ships no model runtime, so those ship as deterministic
  * STUBS while [[Flame]] provides a real, exactly-reproducible numeric op.
  */
trait ModelResource[M] extends Serializable {
  /** Unique key for the per-executor cache. */
  def key: String
  /** Construct the model (heavyweight; once per executor). */
  def load(): M
}

object ModelOp {
  // per-executor singleton cache, keyed by resource key
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def resource[M](r: ModelResource[M]): M =
    cache.computeIfAbsent(r.key, _ => r.load().asInstanceOf[AnyRef]).asInstanceOf[M]

  /** Run `fn` over batches of rows with the lazily-loaded model. Batch size
    * mirrors the reference's per-node `batch_size` (BASELINE.md). */
  def mapBatches[M](df: DataFrame, outSchema: StructType, batchSize: Int,
                    res: ModelResource[M])(fn: (M, Seq[Row]) => Iterator[Row]): DataFrame =
    df.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        fn(resource(res), batch)
      }
    }(RowEncoder.encoderFor(outSchema))
}
