package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.ClipOps

/** The pipeline driver: a Spark-first re-expression of the reference's
  * `Engine` (`dpl/processor/engine.py`) and node protocol
  * (`dpl/processor/nodes/base.py`).
  *
  * Key translations (SURVEY.md §3-4):
  *  - node list = ordered [[NodeSpec]]s; dataflow edges are implicit BY TYPE
  *    KEY exactly as in the reference (`engine.py:37-53`): a node's input
  *    type resolves to the user-supplied input or the output column of an
  *    upstream node.
  *  - bind-time validation (`base.py:167-188`): unknown op, missing input
  *    type, duplicate output type -> error before any job runs.
  *  - execution: each op is a `DataFrame => DataFrame` column transform;
  *    the whole DAG becomes ONE Catalyst plan — the reference's
  *    chunk-interleaved generators (`engine.py:64-73`) are subsumed by
  *    per-partition pipelining, its joblib pools by partition parallelism.
  *  - memoization (`base.py:135`): a left-anti join against the sink's
  *    already-written `name`s skips completed clips unless `recompute`.
  *  - row-level error capture (`base.py:137-142`): ops surface row failures
  *    as nulls (NaN-guard semantics); failed rows are diverted to an error
  *    side-output and reported, matching `NodeExecReport`.
  *  - `test_run` probe (`base.py:106-112`): limit(1) dry pass.
  */
final case class NodeSpec(op: String, params: Map[String, String] = Map.empty)

final case class PipelineReport(node: String, status: String, count: Long)

/** One operator: consumes `inputTypes` columns, appends `outputTypes`
  * columns. `failed` flags rows the op could not process (error channel). */
trait ClipOp {
  def inputTypes: Seq[String]
  def outputTypes: Seq[String]
  def apply(df: DataFrame, params: Map[String, String]): DataFrame
  /** Predicate marking failed rows AFTER apply; default: any null output. */
  def failed(df: DataFrame): Column =
    outputTypes.map(t => col(t).isNull).reduce(_ || _)
}

/** Registry of built-in operators — the analogue of the reference's
  * metaclass registry (`dpl/processor/nodes/registry.py:4-19`). */
object OpRegistry {
  private def p(params: Map[String, String], key: String, dflt: Double): Double =
    params.get(key).map(_.toDouble).getOrElse(dflt)

  val ops: Map[String, ClipOp] = Map(
    // landmarks: array<array<struct<x,y>>> -> bboxes per frame
    "fixed_bboxes" -> new ClipOp {
      val inputTypes = Seq("landmarks"); val outputTypes = Seq("bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("bboxes",
          ClipOps.fixedBboxes(col("landmarks"), p(params, "scale", 1.25)))
    },
    "emoca_like_bboxes" -> new ClipOp {
      val inputTypes = Seq("landmarks"); val outputTypes = Seq("bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("bboxes", ClipOps.emocaLikeBboxes(col("landmarks"),
          p(params, "scale", 1.25), p(params, "window", 5).toInt))
    },
    "smooth_bboxes" -> new ClipOp {
      val inputTypes = Seq("bboxes"); val outputTypes = Seq("smooth_bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("smooth_bboxes", ClipOps.smoothBboxes(col("bboxes")))
    },
    "blinks" -> new ClipOp {
      val inputTypes = Seq("landmarks"); val outputTypes = Seq("blinks")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("blinks", ClipOps.blinks(col("landmarks")))
    },
    // wav: array<double> @16kHz -> volume: array<double> @50Hz
    "volume" -> new ClipOp {
      val inputTypes = Seq("wav"); val outputTypes = Seq("volume")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("volume", ClipOps.volume(col("wav"),
          p(params, "sample_rate", 16000).toInt, p(params, "fps", 50).toInt))
    },
    // series resample onto the clip's frame count (audio<->video alignment)
    "align_to_frames" -> new ClipOp {
      val inputTypes = Seq("volume", "num_frames"); val outputTypes = Seq("volume_at_fps")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("volume_at_fps", ClipOps.alignToFrames(
          col("volume"), col("num_frames"), p(params, "feature_fps", 50.0)))
    },
    "savgol" -> new ClipOp {
      val inputTypes = Seq("series"); val outputTypes = Seq("smoothed")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("smoothed", savgol_smooth(col("series"),
          p(params, "window", 25).toInt, p(params, "polyorder", 3).toInt))
    },
    "best_face" -> new ClipOp {
      val inputTypes = Seq("raw_bboxes"); val outputTypes = Seq("best_bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("best_bboxes", ClipOps.bestFacePerFrame(col("raw_bboxes")))
    },
    // ---- inference-backed nodes (mapPartitions ops joined back on name;
    //      models are pluggable ModelResources, stubs by default) ----
    "face_detection" -> new ClipOp {
      val inputTypes = Seq("frames"); val outputTypes = Seq("raw_bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val det = graft.operators.Vision
          .detectFaces(df, "name", "frames")
          // (N,5) arrays -> candidate structs for the bbox ops
          .withColumn("raw_bboxes", expr(
            """transform(raw_bboxes, f -> transform(f, c ->
              |  struct(c[0] as x1, c[1] as y1, c[2] as x2, c[3] as y2,
              |         c[4] as score)))""".stripMargin))
        df.join(det, Seq("name"))
      }
    },
    "transform_bboxes" -> new ClipOp {
      val inputTypes = Seq("best_bboxes"); val outputTypes = Seq("bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("bboxes", transform(col("best_bboxes"), b =>
          bbox_transform(bbox(b("x1"), b("y1"), b("x2"), b("y2"), b("score")),
            p(params, "extend_factor", 0.2))))
    },
    "crop" -> new ClipOp {
      val inputTypes = Seq("frames", "bboxes"); val outputTypes = Seq("crops")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val size = p(params, "size", 224).toInt
        // Collect EVERY frame slot (failed frames as null crop inside the
        // struct — collect_list only skips null elements, not structs with
        // null fields) so the crops array stays index-aligned with frames;
        // a clip with any failed frame gets crops=null and flows to the
        // error side-output, matching the reference's fail-the-clip
        // semantics instead of silently shifting the frame axis.
        val cropped = graft.operators.ImageOps
          .cropFrames(df, "name", "frames",
            "bboxes", size)
          .groupBy("name")
          .agg(transform(array_sort(collect_list(
                 struct(col("frame_idx"), col("crop")))), x => x("crop"))
               .as("_crops_all"),
               max(col("error").isNotNull.cast("int")).as("_any_err"))
          .select(col("name"),
            when(col("_any_err") === 0, col("_crops_all")).as("crops"))
        df.join(cropped, Seq("name"), "left")
      }
    },
    "emoca" -> new ClipOp {
      val inputTypes = Seq("crops")
      val outputTypes = Seq("shape", "tex", "exp", "pose", "cam", "light")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Vision.emocaEncode(df, "name", "crops"),
          Seq("name"))
    },
    "wav2vec" -> new ClipOp {
      val inputTypes = Seq("wav"); val outputTypes = Seq("wav2vec", "volume")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Wav2vec.extract(df, "name", "wav",
          p(params, "sample_rate", 16000).toInt), Seq("name"))
    },
    "flame" -> new ClipOp {
      val inputTypes = Seq("shape", "exp", "pose")
      val outputTypes = Seq("verts", "landmarks3d")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Vision.flameForward(df, "name",
          "shape", "exp", "pose",
          batchSize = p(params, "batch_size", 64).toInt), Seq("name"))
    },
    "render" -> new ClipOp {
      val inputTypes = Seq("verts", "cam")
      val outputTypes = Seq("render_mask", "render_normal", "render_uv")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Vision.renderFrames(df, "name",
          "verts", "cam", size = p(params, "size", 64).toInt,
          batchSize = p(params, "batch_size", 64).toInt), Seq("name"))
    },
    "face_alignment" -> new ClipOp {
      val inputTypes = Seq("frames")
      val outputTypes = Seq("landmarks", "raw_bboxes")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val det = graft.operators.Vision.detectFaces(df, "name", "frames")
          .withColumn("raw_bboxes", expr(
            """transform(raw_bboxes, f -> transform(f, c ->
              |  struct(c[0] as x1, c[1] as y1, c[2] as x2, c[3] as y2,
              |         c[4] as score)))""".stripMargin))
        df.join(graft.operators.Vision.alignFaces(df, "name", "frames"), Seq("name"))
          .join(det, Seq("name"))
      }
    },
    "face_landmarks" -> new ClipOp {
      val inputTypes = Seq("frames", "raw_bboxes")
      val outputTypes = Seq("landmarks")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Vision.alignFaces(df, "name", "frames"), Seq("name"))
    },
    // ---- ffmpeg transcodes (shell-outs; rows degrade to the error channel
    //      when the binary is absent) ----
    "video_to_frames" -> new ClipOp {
      val inputTypes = Seq("video"); val outputTypes = Seq("frames")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Ffmpeg.videoToFrames(df, "name", "video")
          .select("name", "frames"), Seq("name"), "left")
    },
    "video_to_wav" -> new ClipOp {
      val inputTypes = Seq("video"); val outputTypes = Seq("wav")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val sr = p(params, "sample_rate", 16000).toInt
        val decode = udf((b: Array[Byte]) =>
          if (b == null) null else graft.sources.Wav.decodeTo(b, sr))
        df.join(graft.operators.Ffmpeg.videoToWav(df, "name", "video")
          .select(col("name"), decode(col("payload")).as("wav")),
          Seq("name"), "left")
      }
    },
    "aac_to_wav" -> new ClipOp {
      val inputTypes = Seq("aac"); val outputTypes = Seq("wav")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val sr = p(params, "sample_rate", 16000).toInt
        val decode = udf((b: Array[Byte]) =>
          if (b == null) null else graft.sources.Wav.decodeTo(b, sr))
        df.join(graft.operators.Ffmpeg.aacToWav(df, "name", "aac")
          .select(col("name"), decode(col("payload")).as("wav")),
          Seq("name"), "left")
      }
    },
    "probe_fps" -> new ClipOp {
      val inputTypes = Seq("video"); val outputTypes = Seq("fps")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.join(graft.operators.Ffmpeg.probeFps(df, "name", "video"),
          Seq("name"), "left")
    },
    // every-nth frame subsampling (temporal downsampling before the
    // expensive per-frame inference ops)
    "frame_sample" -> new ClipOp {
      val inputTypes = Seq("frames"); val outputTypes = Seq("sampled_frames")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val step = p(params, "step", 2).toInt
        df.withColumn("sampled_frames",
          filter(col("frames"), (_, i) => i % step === 0))
      }
    },
    // ---- packed dataset sinks (`a2en.py:13-45`, `h5.py:95-237`) ----
    "a2en" -> new ClipOp {
      val inputTypes = Seq("frames", "wav2vec", "volume", "exp", "pose", "landmarks3d")
      val outputTypes = Seq("a2en")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        // the reference probes the video fps per clip (`a2en.py:38`): use
        // the probe_fps column when the graph produced it, else the param
        val fps =
          if (df.columns.contains("fps")) col("fps")
          else lit(p(params, "fps", 50.0))
        // resample target = the EMOCA code count (`a2en.py:37`:
        // num = len(data["exp"])) — NOT the video frame count; they
        // diverge exactly when upstream EMOCA dropped frames
        df.join(graft.operators.Sinks.a2enPack(
          df.withColumn("num_frames", size(col("exp"))), fps), Seq("name"))
      }
    },
    "vid2vid" -> new ClipOp {
      val inputTypes = Seq("crops", "render_uv", "render_normal")
      val outputTypes = Seq("vid2vid")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("vid2vid",
          struct(col("crops"), col("render_uv"), col("render_normal")))
    },
    "src_seq" -> new ClipOp {
      val inputTypes = graft.operators.Sinks.SrcSeqTypes
      val outputTypes = Seq("src_seq")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("src_seq", struct(
          graft.operators.Sinks.SrcSeqTypes.map(col) :+
            ClipOps.blinks(col("landmarks")).as("blinks"): _*))
    },
    "src_seq_alpha" -> new ClipOp {
      val inputTypes = graft.operators.Sinks.SrcSeqWithAlphaTypes
      val outputTypes = Seq("src_seq")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame =
        df.withColumn("src_seq", struct(
          graft.operators.Sinks.SrcSeqWithAlphaTypes.map(col) :+
            ClipOps.blinks(col("landmarks")).as("blinks"): _*))
    },
    "vid2vid_audio" -> new ClipOp {
      // reference roster (`h5.py:163-171`); num = the crops count
      // (`h5.py:178`), fps + window_size = constructor params
      // (`h5.py:173-183`)
      val inputTypes = Seq("crops", "render_uv", "render_normal",
        "wav2vec", "volume", "landmarks")
      val outputTypes = Seq("vid2vid_audio")
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
        val packed = graft.operators.Sinks.vid2vidAudioFeatures(
          df.withColumn("num_frames", size(col("crops"))),
          p(params, "window_size", 16).toInt,
          lit(p(params, "fps", 50.0)))
        df.join(packed.select(col("name"),
          struct(col("wav2vec"), col("volume"), col("average_blink"),
            col("audio_blink_feature")).as("vid2vid_audio")), Seq("name"))
      }
    })

  /** The reference registers nodes under their Python class names
    * (`registry.py:4-19`; the configs' graph JSON uses them) — accept
    * those as aliases so reference graph JSON runs unchanged. */
  val aliases: Map[String, String] = Map(
    "VideoToImagesNode" -> "video_to_frames",
    "VideoToWavNode" -> "video_to_wav",
    "AacToWavNode" -> "aac_to_wav",
    "Wav2vecNode" -> "wav2vec",
    "FaceDetectionNode" -> "face_detection",
    "FaceAlignmentNode" -> "face_alignment",
    "FaceLandmarksNode" -> "face_landmarks",
    "TransformRawBboxesNode" -> "transform_bboxes",
    "FixedBboxesNode" -> "fixed_bboxes",
    "EmocaLikeBboxesNode" -> "emoca_like_bboxes",
    "CropNode" -> "crop",
    "EmocaNode" -> "emoca",
    "EmocaFromImagesNode" -> "emoca",
    "FlameNode" -> "flame",
    "RenderingNode" -> "render",
    "A2enDatasetNode" -> "a2en",
    "Vid2vidDatasetNode" -> "vid2vid",
    "SourceSequenceNode" -> "src_seq",
    "SourceSequenceWithAlphaNode" -> "src_seq_alpha",
    "Vid2vidAudioNode" -> "vid2vid_audio")

  def resolve(name: String): Option[ClipOp] = ops.get(aliases.getOrElse(name, name))
}

final class PipelineValidationError(msg: String) extends RuntimeException(msg)

final case class Pipeline(nodes: Seq[NodeSpec], outputDir: String) {

  /** Bind-time schema analysis (== `base.py:167-188` + `engine.py:37-53`):
    * returns the full set of type keys available after the last node. */
  def validate(inputTypes: Set[String]): Set[String] = {
    var available = inputTypes
    nodes.foreach { spec =>
      val op = OpRegistry.resolve(spec.op).getOrElse(
        throw new PipelineValidationError(
          s"unknown op '${spec.op}' (known: ${OpRegistry.ops.keys.toSeq.sorted.mkString(", ")})"))
      val missing = op.inputTypes.filterNot(available.contains)
      if (missing.nonEmpty)
        throw new PipelineValidationError(
          s"node '${spec.op}': missing input types ${missing.mkString(", ")}")
      val dup = op.outputTypes.filter(available.contains)
      if (dup.nonEmpty)
        throw new PipelineValidationError(
          s"node '${spec.op}': output types already bound: ${dup.mkString(", ")}")
      available ++= op.outputTypes
    }
    available
  }

  /** Execute over a clip table (must have `name` + input type columns).
    * Returns (outputs, report). With `testRun`, processes limit(1) first
    * (probe) before the full pass — `base.py:106-112`. */
  def execute(spark: SparkSession, clips: DataFrame,
              recompute: Boolean = false,
              testRun: Boolean = false): (DataFrame, Seq[PipelineReport]) = {
    val inputTypes = clips.columns.toSet - "name"
    validate(inputTypes)

    if (testRun) runOnce(clips.limit(1))._1.count()

    // Memoization: skip clips whose outputs already exist in the sink
    // manifest (left-anti join on name), unless recompute.
    val manifestPath = s"$outputDir/_manifest"
    val todo =
      if (recompute) clips
      else scala.util.Try(spark.read.parquet(manifestPath)).toOption match {
        case Some(manifest) =>
          clips.join(manifest.select("name"), Seq("name"), "left_anti")
        case None => clips
      }

    val (out, reports) = runOnce(todo)

    // Split error channel: rows where any node failed.
    val failCols = nodes.flatMap { spec =>
      OpRegistry.resolve(spec.op).get.outputTypes.map(t => col(t).isNull)
    }
    val anyFail = failCols.reduceOption(_ || _).getOrElse(lit(false))
    val good = out.where(!anyFail)
    val bad = out.where(anyFail)

    good.write.mode("append").parquet(s"$outputDir/clips")
    good.select("name").write.mode("append").parquet(manifestPath)

    val processed = good.count()
    val errors = bad.count()
    val skipped = clips.count() - processed - errors
    val report = reports :+
      PipelineReport("_pipeline", "processed", processed) :+
      PipelineReport("_pipeline", "errors", errors) :+
      PipelineReport("_pipeline", "skipped_memoized", skipped)
    (good, report)
  }

  private def runOnce(clips: DataFrame): (DataFrame, Seq[PipelineReport]) = {
    val out = nodes.foldLeft(clips) { (df, spec) =>
      OpRegistry.resolve(spec.op).get.apply(df, spec.params)
    }
    (out, nodes.map(s => PipelineReport(s.op, "bound", 1L)))
  }
}

object Pipeline {
  /** Serialize a run report as JSON (== the execution report sink,
    * `run.py:35-38` / `NodeExecReport.to_dict`, `base.py:12-27`). */
  def writeReport(reports: Seq[PipelineReport], path: String): Unit = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val root = mapper.createArrayNode()
    reports.foreach { r =>
      val n = mapper.createObjectNode()
      n.put("node", r.node); n.put("status", r.status); n.put("count", r.count)
      root.add(n)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** Parse the reference's graph-JSON shape
    * (`[{"name": <op>, "params": {...}}, ...]`, `README.md:79-101`)
    * using Jackson (ships with Spark). */
  def fromJson(json: String, outputDir: String): Pipeline = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    require(root.isArray, "graph JSON must be an array of node specs")
    val nodes = root.elements().asScala.map { n =>
      val op = n.get("name").asText()
      val params = Option(n.get("params")).map { pn =>
        pn.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty[String, String])
      NodeSpec(op, params)
    }.toSeq
    Pipeline(nodes, outputDir)
  }
}
