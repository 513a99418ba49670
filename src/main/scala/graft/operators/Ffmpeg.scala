package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Shell-out transcode operators — the reference's ffmpeg nodes
  * (`dpl/processor/nodes/ffmpeg.py:13-46`: video->frames, video->wav,
  * aac->wav, frames->video) and its OpenCV fps probe
  * (`dpl/common.py:30-32`), as mapPartitions over binary columns.
  *
  * Each partition writes payloads to temp files, shells out with the SAME
  * CLI flags as the reference, and reads results back; joblib process
  * pools (`ffmpeg.py:77-78`) are subsumed by partition parallelism. When
  * the binaries are absent (this container has none), ops return null
  * payloads routed to the error channel — the orchestration is real and
  * tested, the codec is environmental.
  */
object Ffmpeg {

  lazy val available: Boolean = probe("ffmpeg") && probe("ffprobe")

  private def probe(bin: String): Boolean =
    try { new ProcessBuilder(bin, "-version").start().waitFor() == 0 }
    catch { case _: java.io.IOException => false }

  val transcodeSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** video bytes -> mono 16 kHz wav bytes
    * (`ffmpeg -i in -vn -ar 16000 -ac 1 out.wav`, ffmpeg.py template). */
  def videoToWav(df: DataFrame, nameCol: String, videoCol: String): DataFrame =
    shellOp(df, nameCol, videoCol, "mp4", "wav",
      (in, out) => Seq("ffmpeg", "-y", "-i", in.toString, "-vn",
        "-ar", "16000", "-ac", "1", out.toString))

  /** aac bytes -> wav bytes. */
  def aacToWav(df: DataFrame, nameCol: String, audioCol: String): DataFrame =
    shellOp(df, nameCol, audioCol, "aac", "wav",
      (in, out) => Seq("ffmpeg", "-y", "-i", in.toString,
        "-ar", "16000", "-ac", "1", out.toString))

  private def shellOp(df: DataFrame, nameCol: String, payloadCol: String,
                      inExt: String, outExt: String,
                      cmd: (Path, Path) => Seq[String]): DataFrame =
    df.selectExpr(s"$nameCol as name", s"$payloadCol as payload")
      .mapPartitions { iter =>
        iter.map { r =>
          val name = r.getString(0)
          if (!available) Row(name, null, "ffmpeg unavailable in environment")
          else {
            val dir = Files.createTempDirectory("graft-ffmpeg")
            try {
              val in = dir.resolve(s"in.$inExt")
              val out = dir.resolve(s"out.$outExt")
              Files.write(in, r.getAs[Array[Byte]](1))
              val p = new ProcessBuilder(cmd(in, out): _*)
                .redirectErrorStream(true).start()
              val code = p.waitFor()
              if (code == 0 && Files.exists(out)) Row(name, Files.readAllBytes(out), null)
              else Row(name, null, s"ffmpeg exit $code")
            } catch {
              case e: Exception => Row(name, null, e.getMessage)
            } finally {
              dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
            }
          }
        }
      }(RowEncoder.encoderFor(transcodeSchema))

  val framesSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("frames", ArrayType(BinaryType, containsNull = false), nullable = true),
    StructField("error", StringType, nullable = true)))

  /** video bytes -> ordered jpeg frame bytes (`VideoToImagesNode`,
    * `dpl/processor/nodes/ffmpeg.py:114-130`: `-qscale:v 3` + `%06d.jpg`
    * naming; frame order = the zero-padded name order). */
  def videoToFrames(df: DataFrame, nameCol: String, videoCol: String): DataFrame =
    df.selectExpr(s"$nameCol as name", s"$videoCol as payload")
      .mapPartitions { iter =>
        iter.map { r =>
          val name = r.getString(0)
          if (!available) Row(name, null, "ffmpeg unavailable in environment")
          else {
            val dir = Files.createTempDirectory("graft-ffmpeg")
            try {
              val in = dir.resolve("in.mp4")
              Files.write(in, r.getAs[Array[Byte]](1))
              val p = new ProcessBuilder("ffmpeg", "-y", "-i", in.toString,
                  "-qscale:v", "3", dir.resolve("%06d.jpg").toString)
                .redirectErrorStream(true).start()
              p.getInputStream.readAllBytes()
              val code = p.waitFor()
              if (code != 0) Row(name, null, s"ffmpeg exit $code")
              else {
                val frames = dir.toFile.listFiles()
                  .filter(_.getName.endsWith(".jpg")).sortBy(_.getName)
                  .map(f => Files.readAllBytes(f.toPath))
                if (frames.isEmpty) Row(name, null, "no frames decoded")
                else Row(name, frames.toSeq, null)
              }
            } catch {
              case e: Exception => Row(name, null, e.getMessage)
            } finally {
              dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
            }
          }
        }
      }(RowEncoder.encoderFor(framesSchema))

  val fpsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("fps", DoubleType, nullable = true)))

  /** Container fps probe (== `get_fps`, `dpl/common.py:30-32`). */
  def probeFps(df: DataFrame, nameCol: String, videoCol: String): DataFrame =
    df.selectExpr(s"$nameCol as name", s"$videoCol as payload")
      .mapPartitions { iter =>
        iter.map { r =>
          val name = r.getString(0)
          if (!available) Row(name, null)
          else {
            val dir = Files.createTempDirectory("graft-ffprobe")
            try {
              val in = dir.resolve("in.mp4")
              Files.write(in, r.getAs[Array[Byte]](1))
              val p = new ProcessBuilder("ffprobe", "-v", "0",
                "-of", "csv=p=0", "-select_streams", "v:0",
                "-show_entries", "stream=r_frame_rate", in.toString).start()
              val outStr = new String(p.getInputStream.readAllBytes()).trim
              p.waitFor()
              outStr.split("/") match {
                case Array(num, den) if den.toDouble != 0 =>
                  Row(name, num.toDouble / den.toDouble)
                case _ => Row(name, null)
              }
            } catch { case _: Exception => Row(name, null) }
            finally {
              dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
            }
          }
        }
      }(RowEncoder.encoderFor(fpsSchema))
}
