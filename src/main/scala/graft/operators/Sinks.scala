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
    * Mirrors `a2en.py:24-45`: wav2vec/volume are resampled onto the video
    * frame count with `fpsCol` — the PROBED per-clip video fps the
    * reference hands to `resample` (`a2en.py:38-44`) — jaw = pose[:, 3],
    * and the landmarks3d blink features are packed alongside
    * (`a2en.py:32-34`). Rows with empty audio features null out
    * (`a2en.py:38-39` raises; here the error channel catches). */
  def a2enPack(df: DataFrame, fpsCol: Column): DataFrame = {
    val aligned = df
      .withColumn("wav2vec_at_fps",
        when(size(col("wav2vec")) > 0,
          graft.functions.linear_resample_vec(col("wav2vec"), col("num_frames"),
            fpsCol.cast("double"))))
      .withColumn("volume_at_fps",
        when(size(col("volume")) > 0,
          graft.functions.linear_resample(col("volume"), col("num_frames"),
            fpsCol.cast("double"))))
      .withColumn("blinks3d", ClipOps.blinks3d(col("landmarks3d")))
    aligned.select(col("name"),
      struct(
        col("wav2vec_at_fps").as("audio_features"),
        col("volume_at_fps").as("volume"),
        col("exp").as("exp"),
        jaw(col("pose")).as("jaw_pose"),
        col("landmarks3d").as("landmarks3d"),
        transform(col("blinks3d"), b => b("left_blink")).as("left_blink"),
        transform(col("blinks3d"), b => b("right_blink")).as("right_blink"),
        transform(col("blinks3d"), b => b("average_blink")).as("average_blink"))
        .as("a2en"))
  }

  /** 50 Hz default: the wav2vec feature rate, for clips with no probed
    * fps column. */
  def a2enPack(df: DataFrame): DataFrame = a2enPack(df, lit(50.0))

  def writeA2en(df: DataFrame, path: String): Unit =
    a2enPack(df).write.mode("overwrite")
      .option("compression", "zstd").parquet(path)

  /** vid2vid pack: (name, crops, render_uv, render_normal). */
  def writeVid2vid(df: DataFrame, path: String): Unit =
    df.select(col("name"), col("crops"), col("render_uv"), col("render_normal"))
      .write.mode("overwrite").option("compression", "zstd").parquet(path)

  /** Vid2vidAudio features (`h5.py:163-237`): wav2vec and volume are
    * resampled onto the frame count (source rate = the node's `fps`
    * constructor param, `h5.py:175-183`), window-averaged with edge
    * replication (`average_features`, `h5.py:235-237`), then concatenated
    * with the blink features into the per-frame conditioning matrix
    * `[wav2vec | volume | left_blink | right_blink]` (`h5.py:205-214`).
    * The windowed wav2vec/volume and average_blink stay their own columns
    * exactly as the reference stores separate datasets (`h5.py:216-226`).
    * Needs (name, wav2vec, volume, landmarks, num_frames). */
  def vid2vidAudioFeatures(df: DataFrame, windowSize: Int = 16,
                           fpsCol: Column = lit(50.0)): DataFrame =
    df.withColumn("vol_at_fps",
        graft.functions.linear_resample(col("volume"), col("num_frames"),
          fpsCol.cast("double")))
      .withColumn("vol_windowed",
        graft.functions.edge_moving_avg(col("vol_at_fps"), windowSize))
      .withColumn("w2v_at_fps",
        graft.functions.linear_resample_vec(col("wav2vec"), col("num_frames"),
          fpsCol.cast("double")))
      .withColumn("w2v_windowed",
        graft.functions.edge_moving_avg_vec(col("w2v_at_fps"), windowSize))
      .withColumn("blinks", ClipOps.blinks(col("landmarks")))
      .withColumn("audio_blink_feature",
        zip_with(
          zip_with(col("w2v_windowed"), col("vol_windowed"),
            (w, v) => concat(w, array(v))),
          col("blinks"),
          (wv, b) => concat(wv, array(b("left_blink"), b("right_blink")))))
      .select(col("name"), col("w2v_windowed").as("wav2vec"),
        col("vol_windowed").as("volume"),
        transform(col("blinks"), b => b("average_blink")).as("average_blink"),
        col("audio_blink_feature"))

  /** The reference's src_seq type roster (`h5.py:107-120`,
    * SourceSequenceNode.input_types; IMAGES = the frames column). */
  val SrcSeqTypes: Seq[String] = Seq("frames", "bboxes", "crops", "shape",
    "exp", "pose", "cam", "light", "landmarks", "landmarks3d",
    "render_uv", "render_normal")

  /** ...WithAlpha adds the alpha mattes after the images
    * (`h5.py:144-159`). */
  val SrcSeqWithAlphaTypes: Seq[String] =
    SrcSeqTypes.head +: "alpha" +: SrcSeqTypes.tail

  /** src_seq pack: wide select + per-frame blink features from landmarks
    * (`h5.py:132-139`); `typeCols` defaults to the full reference roster. */
  def srcSeqPack(df: DataFrame, typeCols: Seq[String] = SrcSeqTypes): DataFrame =
    df.select((col("name") +: typeCols.map(col) :+
      ClipOps.blinks(col("landmarks")).as("blinks")): _*)

  def writeSrcSeq(df: DataFrame, path: String,
                  typeCols: Seq[String] = SrcSeqTypes): Unit =
    srcSeqPack(df, typeCols).write.mode("overwrite")
      .option("compression", "zstd").parquet(path)

  /** Z-order-clustered parquet write (the OPTIMIZE ZORDER layout): rows
    * are range-partitioned and sorted by the Morton key of `keys`, so
    * every output file covers a small hyper-rectangle of the key space —
    * per-file min/max statistics then prune scans filtered on ANY of the
    * interleaved columns, not just a lexicographic prefix. `nFiles`
    * bounds file count; the key column itself is not persisted. */
  def writeZOrdered(df: DataFrame, path: String, bitsPer: Int,
                    keys: Seq[Column], nFiles: Int = 16): Unit =
    df.withColumn("__z", graft.functions.zorder_key(bitsPer, keys: _*))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Range-sharded sorted writer: one range shuffle
    * (`repartitionByRange` — a sampled range partitioner, so shards are
    * load-balanced without a global sort) plus a within-shard sort, so
    * the output files hold NON-OVERLAPPING key ranges in key order —
    * parquet footer min/max then prune point/range predicates on the
    * sort key to ONE file (the sorted-run layout a 100 TB corpus wants
    * for id-keyed serving; the z-order writer above is the
    * multi-dimensional sibling). */
  def writeRangeSorted(df: DataFrame, path: String,
                       keys: Seq[Column], nFiles: Int = 16): Unit =
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Persist a table BUCKETED + sorted by a join key (Hive-style layout
    * via `bucketBy`/`sortBy` + `saveAsTable` — bucket metadata only
    * exists through the catalog). Two tables bucketed the same way
    * equi-join WITHOUT ANY EXCHANGE: each task merge-joins bucket i of
    * both sides directly off disk — at 100 TB this converts the
    * fact⋈fact join from the cluster-wide shuffle that dominates the
    * job into pure co-located reads, the single biggest plan lever for
    * repeated joins on a stable key (ScaleSpec proves the exchange-free
    * plan). Spark buckets rows by `hash(key) % nBuckets`, so both
    * sides MUST use the same nBuckets (or a multiple, with
    * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 16): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}

