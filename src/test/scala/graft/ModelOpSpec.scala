package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.{Ffmpeg, ModelOp, ModelResource}

object CountingResource {
  val loads = new AtomicInteger(0)
}

/** ModelOp lazy-resource + batching behavior; ffmpeg op error channel. */
class ModelOpSpec extends SparkTestBase {
  import spark.implicits._

  test("mapBatches loads the resource once per executor and batches rows") {
    val res = new ModelResource[String] {
      val key = "counting-test"
      def load(): String = { CountingResource.loads.incrementAndGet(); "model" }
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("batch_size", IntegerType)))
    val df = (1L to 10L).toDF("id").repartition(2)
    val out = ModelOp.mapBatches(df, schema, batchSize = 3, res) { (m, batch) =>
      assert(m == "model")
      batch.iterator.map(r => Row(r.getLong(0), batch.size))
    }.collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(1)).forall(_ <= 3))
    // single JVM: computeIfAbsent guarantees exactly one load across threads
    assert(CountingResource.loads.get() == 1)
  }

  test("ffmpeg ops degrade to the error channel when binaries are absent") {
    val df = Seq(("clip_a", Array[Byte](1, 2, 3))).toDF("name", "video")
    val out = Ffmpeg.videoToWav(df, "name", "video").collect()
    assert(out.length == 1)
    if (!Ffmpeg.available) {
      assert(out(0).isNullAt(1))
      assert(out(0).getString(2) != null)
    } else {
      // real ffmpeg: garbage input must yield an error row, not a crash
      assert(out(0).isNullAt(1) && out(0).getString(2) != null)
    }
  }
}
