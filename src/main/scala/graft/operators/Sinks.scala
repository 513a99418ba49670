package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Packed training-container sinks — the reference's `.npz`/`.h5` dataset
  * nodes re-expressed as nested-column parquet writes (SURVEY.md §2.1):
  *
  *  - a2en  (`dpl/processor/nodes/a2en.py:13-45`): audio-to-expression
  *    training rows packing wav2vec features, volume, exp/pose codes,
  *    3-D landmarks and blink features, with the audio features resampled
  *    onto the video frame count.
  *  - vid2vid (`h5.py:95-104`): crops + uv/normal renders.
  *  - src_seq (`h5.py:107-141`): the wide 12-type pack + blink features.
  *
  * The HDF5 "JPEG-compressed images inside the container" trick
  * (`h5.py:63-83`, plugin 32019) maps to keeping frames as JPEG bytes in
  * `array<binary>` columns inside zstd parquet — compressed payloads in a
  * columnar container, no plugin needed. One row per clip.
  */
object Sinks {

  /** jaw pose = pose[:, 3] (`a2en.py:30`). */
  private def jaw(pose: Column): Column = transform(pose, p => element_at(p, 4))

  /** Build the a2en pack from a clip table with columns
    * (name, wav2vec, volume, exp, pose, landmarks3d, num_frames).
    * Fails rows with empty audio features (`a2en.py:38-39`) by nulling. */
  def a2enPack(df: DataFrame): DataFrame = {
    val aligned = df
      .withColumn("wav2vec_at_fps",
        when(size(col("wav2vec")) > 0,
          graft.functions.linear_resample_vec(col("wav2vec"), col("num_frames"), lit(50.0))))
      .withColumn("volume_at_fps",
        when(size(col("volume")) > 0,
          graft.functions.linear_resample(col("volume"), col("num_frames"), lit(50.0))))
    aligned.select(col("name"),
      struct(
        col("wav2vec_at_fps").as("audio_features"),
        col("volume_at_fps").as("volume"),
        col("exp").as("exp"),
        jaw(col("pose")).as("jaw_pose"),
        col("landmarks3d").as("landmarks3d")).as("a2en"))
  }

  def writeA2en(df: DataFrame, path: String): Unit =
    a2enPack(df).write.mode("overwrite")
      .option("compression", "zstd").parquet(path)

  /** vid2vid pack: (name, crops, render_uv, render_normal). */
  def writeVid2vid(df: DataFrame, path: String): Unit =
    df.select(col("name"), col("crops"), col("render_uv"), col("render_normal"))
      .write.mode("overwrite").option("compression", "zstd").parquet(path)

  /** Vid2vidAudio feature matrix (`h5.py:163-237`): audio features
    * resampled onto the frame count, then window-averaged with edge
    * replication (window 16, `h5.py:235-237` via `as_windowed`), blink
    * features appended — the concat'd per-frame conditioning matrix. */
  def vid2vidAudioFeatures(df: DataFrame, windowSize: Int = 16): DataFrame =
    df.withColumn("vol_at_fps",
        graft.functions.linear_resample(col("volume"), col("num_frames"), lit(50.0)))
      .withColumn("vol_windowed",
        graft.functions.edge_moving_avg(col("vol_at_fps"), windowSize))
      .withColumn("blinks", ClipOps.blinks(col("landmarks")))
      .withColumn("features",
        zip_with(col("vol_windowed"), col("blinks"),
          (v, b) => array(v, b("left_blink"), b("right_blink"), b("average_blink"))))
      .select(col("name"), col("features"))

  /** src_seq pack: wide select + per-frame blink features from landmarks
    * (`h5.py:132-133`). */
  def srcSeqPack(df: DataFrame, typeCols: Seq[String]): DataFrame =
    df.select((col("name") +: typeCols.map(col) :+
      ClipOps.blinks(col("landmarks")).as("blinks")): _*)

  def writeSrcSeq(df: DataFrame, typeCols: Seq[String], path: String): Unit =
    srcSeqPack(df, typeCols).write.mode("overwrite")
      .option("compression", "zstd").parquet(path)
}
