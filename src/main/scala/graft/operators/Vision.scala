package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Vision inference operators — `FaceDetectionNode` / `FaceAlignmentNode` /
  * `FaceLandmarksNode` (`dpl/processor/nodes/fa.py:49-164`) and
  * `EmocaNode` (`dpl/processor/nodes/emoca.py:34-115`) — on the ModelOp
  * batched/lazy-resource contract, with the reference's exact output
  * schemas (SURVEY.md §1.3):
  *
  *   raw_bboxes : per frame, candidates (N,5) [x1,y1,x2,y2,score]
  *   landmarks  : per frame, (68,2)
  *   EMOCA codes: shape (100), tex (50), exp (50), pose (6), cam (3),
  *                light (9,3)
  *
  * The detectors/encoders themselves are pluggable `ModelResource`s; the
  * defaults here are STUBS (no model runtime in this container) that
  * derive deterministic geometry from each frame's payload hash, so the
  * whole pipeline — schemas, batching, NaN/no-face semantics, downstream
  * bbox/crop/FLAME math — runs end-to-end reproducibly. Swapping in a real
  * ONNX-backed resource changes no operator code.
  */
object Vision {

  type Detector = Array[Byte] => Array[Array[Double]] // frame -> (N,5) candidates
  type LandmarkModel = Array[Byte] => Array[Array[Double]] // frame -> (68,2)
  type EmocaEncoder = Array[Byte] => EmocaCodes

  final case class EmocaCodes(shape: Array[Double], tex: Array[Double],
                              exp: Array[Double], pose: Array[Double],
                              cam: Array[Double], light: Array[Array[Double]])

  /** Deterministic pseudo-detector: 1-2 candidates placed by payload hash;
    * empty (no face) when the hash is divisible by 17 — exercising the
    * NaN/no-face path (`fa.py:13-14,21-24`). */
  val StubDetector: Detector = bytes => {
    val h = Multimodal.md5Long(bytes)
    if (h % 17 == 0) Array.empty
    else {
      val x = (h % 97).toDouble; val y = (h % 89).toDouble
      val base = Array(x, y, x + 40 + (h % 13), y + 40 + (h % 11),
        0.5 + (h % 50) / 100.0)
      if (h % 3 == 0) Array(base, Array(x + 5, y + 5, x + 30, y + 30, 0.4))
      else Array(base)
    }
  }

  val StubLandmarks: LandmarkModel = bytes => {
    val h = Multimodal.md5Long(bytes)
    Array.tabulate(68)(i => Array((h % 97 + i * 0.5), (h % 89 + (i * 7 % 13) * 1.5)))
  }

  val StubEmoca: EmocaEncoder = bytes => {
    val h = Multimodal.md5Long(bytes)
    def series(n: Int, scale: Double) =
      Array.tabulate(n)(i => ((h >> (i % 48)) & 0xff) / 255.0 * scale - scale / 2)
    EmocaCodes(series(100, 2.0), series(50, 1.0), series(50, 2.0),
      series(6, 0.5), series(3, 1.0),
      Array.tabulate(9)(i => series(3, 1.0).map(_ + i * 0.01)))
  }

  private val bboxStruct = ArrayType(ArrayType(DoubleType, false), false)

  val detectSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("raw_bboxes", ArrayType(bboxStruct, false)))) // per frame: (N,5)

  /** `op` must be distinct per operator family — the ModelOp cache is
    * keyed per executor, and two ops sharing a key would get each other's
    * models. */
  private case class Res[T](op: String, id: String, f: T) extends ModelResource[T] {
    def key: String = s"vision-$op-$id"; def load(): T = f
  }

  /** frames: array<binary> per clip -> best-candidate raw bboxes per frame
    * (kept as the full candidate list; best-face selection is
    * `ClipOps.bestFacePerFrame`). Batch default matches the reference
    * (face-align batch 8, BASELINE.md). */
  def detectFaces(df: DataFrame, nameCol: String, framesCol: String,
                  batchSize: Int = 8,
                  detector: Detector = StubDetector,
                  detectorId: String = "stub"): DataFrame =
    ModelOp.mapBatches(
      df.selectExpr(s"$nameCol as name", s"$framesCol as frames"),
      detectSchema, batchSize, Res("detect", detectorId, detector)) { (det, batch) =>
      batch.iterator.map { r =>
        val frames = r.getSeq[Array[Byte]](1)
        Row(r.getString(0), frames.map(f => det(f).toSeq).toSeq)
      }
    }

  val landmarksSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("landmarks", ArrayType(ArrayType(ArrayType(DoubleType, false), false), false))))

  def alignFaces(df: DataFrame, nameCol: String, framesCol: String,
                 batchSize: Int = 8,
                 model: LandmarkModel = StubLandmarks,
                 modelId: String = "stub"): DataFrame =
    ModelOp.mapBatches(
      df.selectExpr(s"$nameCol as name", s"$framesCol as frames"),
      landmarksSchema, batchSize, Res("align", modelId, model)) { (lm, batch) =>
      batch.iterator.map { r =>
        val frames = r.getSeq[Array[Byte]](1)
        Row(r.getString(0), frames.map(f => lm(f).map(_.toSeq).toSeq).toSeq)
      }
    }

  val emocaSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("shape", ArrayType(ArrayType(DoubleType, false), false)),
    StructField("tex", ArrayType(ArrayType(DoubleType, false), false)),
    StructField("exp", ArrayType(ArrayType(DoubleType, false), false)),
    StructField("pose", ArrayType(ArrayType(DoubleType, false), false)),
    StructField("cam", ArrayType(ArrayType(DoubleType, false), false)),
    StructField("light", ArrayType(ArrayType(ArrayType(DoubleType, false), false), false))))

  /** crops: array<binary> per clip -> the six FLAME code series
    * (frame axis = array index; shapes as §1.3). */
  def emocaEncode(df: DataFrame, nameCol: String, cropsCol: String,
                  batchSize: Int = 8,
                  encoder: EmocaEncoder = StubEmoca,
                  encoderId: String = "stub"): DataFrame =
    ModelOp.mapBatches(
      df.selectExpr(s"$nameCol as name", s"$cropsCol as crops"),
      emocaSchema, batchSize, Res("emoca", encoderId, encoder)) { (enc, batch) =>
      batch.iterator.map { r =>
        val codes = r.getSeq[Array[Byte]](1).map(enc)
        Row(r.getString(0),
          codes.map(_.shape.toSeq).toSeq, codes.map(_.tex.toSeq).toSeq,
          codes.map(_.exp.toSeq).toSeq, codes.map(_.pose.toSeq).toSeq,
          codes.map(_.cam.toSeq).toSeq,
          codes.map(_.light.map(_.toSeq).toSeq).toSeq)
      }
    }
}
