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

  private val pointStruct = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType)))

  val landmarksSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("landmarks", ArrayType(ArrayType(pointStruct, false), false))))

  /** Landmarks come out as struct<x,y> points (the clip table's landmark
    * column form, §1.3) so bbox/blink ops consume them directly. */
  def alignFaces(df: DataFrame, nameCol: String, framesCol: String,
                 batchSize: Int = 8,
                 model: LandmarkModel = StubLandmarks,
                 modelId: String = "stub"): DataFrame =
    ModelOp.mapBatches(
      df.selectExpr(s"$nameCol as name", s"$framesCol as frames"),
      landmarksSchema, batchSize, Res("align", modelId, model)) { (lm, batch) =>
      batch.iterator.map { r =>
        val frames = r.getSeq[Array[Byte]](1)
        Row(r.getString(0),
          frames.map(f => lm(f).map(p => Row(p(0), p(1))).toSeq).toSeq)
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

  /** Tiny deterministic FLAME-shaped asset set (3 verts, 2 joints, one
    * face) standing in for the published FLAME pickle (`flame.py:43-312`):
    * any consistent basis exercises the LBS math and the pipeline
    * plumbing; a real asset-backed model plugs in via the same
    * ModelResource without operator changes. Accepts the EMOCA stub's
    * 100-dim shape / 50-dim exp codes. */
  def stubFlameModel(): Flame.FlameModel = Flame.FlameModel(
    template = Array(0, 0, 0, 1, 0, 0, 0, 1, 0),
    shapedirs = Array.tabulate(100)(k => Array.fill(9)(if (k == 0) 0.1 else 0.0)),
    expdirs = Array.tabulate(50)(k => Array.fill(9)(if (k == 0) 0.05 else 0.0)),
    posedirs = Array.empty,
    jRegressor = Array(Array(1.0, 0, 0), Array(0, 1.0, 0)),
    parents = Array(-1, 0),
    lbsWeights = Array(Array(1.0, 0), Array(0, 1.0), Array(0.5, 0.5)),
    lmkFaces = Array(Array(0, 1, 2)),
    lmkBary = Array(Array(1.0 / 3, 1.0 / 3, 1.0 / 3)))

  val flameSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("verts", ArrayType(ArrayType(DoubleType, false), false)),
    StructField("landmarks3d", ArrayType(ArrayType(DoubleType, false), false))))

  /** `FlameNode` (`flame.py:47-108`): per-frame (shape, exp, pose) codes ->
    * flat vertex and 3-D landmark arrays via the pure-Scala LBS forward
    * pass. Batch default 64 = the reference's FLAME batch (BASELINE.md). */
  def flameForward(df: DataFrame, nameCol: String, shapeCol: String,
                   expCol: String, poseCol: String, batchSize: Int = 64,
                   model: Flame.FlameModel = stubFlameModel(),
                   modelId: String = "stub"): DataFrame =
    ModelOp.mapBatches(
      df.selectExpr(s"$nameCol as name", s"$shapeCol as shape",
        s"$expCol as exp", s"$poseCol as pose"),
      flameSchema, batchSize, Res("flame", modelId, model)) { (m, batch) =>
      batch.iterator.map { r =>
        val shapes = r.getSeq[scala.collection.Seq[Double]](1)
        val exps = r.getSeq[scala.collection.Seq[Double]](2)
        val poses = r.getSeq[scala.collection.Seq[Double]](3)
        val out = shapes.indices.map { i =>
          Flame.forward(m, shapes(i).toArray, exps(i).toArray,
            poses(i).toArray.take(6))
        }
        Row(r.getString(0), out.map(_._1.toSeq), out.map(_._2.toSeq))
      }
    }

  val renderSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("render_mask", ArrayType(BinaryType, false)),
    StructField("render_normal", ArrayType(BinaryType, false)),
    StructField("render_uv", ArrayType(BinaryType, false))))

  private case class RenderAssets(faces: Array[Array[Int]], uvs: Array[Double])

  /** `RenderingNode` (`rendering.py:53-143`): per-frame (verts, cam) ->
    * mask / normal / uv rasters via the software rasterizer (orthographic
    * cam = (scale, tx, ty) like `batch_orth_proj`). Mesh topology comes
    * from the model resource; frames stay opaque bytes in the relational
    * layer. */
  def renderFrames(df: DataFrame, nameCol: String, vertsCol: String,
                   camCol: String, size: Int = 64, batchSize: Int = 64,
                   assetsId: String = "stub"): DataFrame = {
    val assets = RenderAssets(Array(Array(0, 1, 2)),
      Array(0.0, 0.0, 1.0, 0.0, 0.0, 1.0))
    ModelOp.mapBatches(
      df.selectExpr(s"$nameCol as name", s"$vertsCol as verts",
        s"$camCol as cam"),
      renderSchema, batchSize, Res("render", assetsId, assets)) { (a, batch) =>
      batch.iterator.map { r =>
        val verts = r.getSeq[scala.collection.Seq[Double]](1)
        val cams = r.getSeq[scala.collection.Seq[Double]](2)
        val rendered = verts.indices.map { i =>
          val c = cams(i)
          // EMOCA cam codes are centred near 0; offset to a usable ortho
          // scale exactly like the vid2vid conditioning path
          Renderer.render(verts(i).toArray, a.faces, a.uvs,
            (1.0 + c(0), c(1), c(2)), size)
        }
        Row(r.getString(0), rendered.map(_.mask), rendered.map(_.normal),
          rendered.map(_.uv))
      }
    }
  }
}
