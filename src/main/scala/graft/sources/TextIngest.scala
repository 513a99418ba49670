package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Compressed-JSONL ingest front door — the first operator a corpus
  * touches: real training data arrives as newline-delimited JSON
  * (jsonl, jsonl.gz — any Hadoop-registered codec decompresses
  * transparently under `spark.read.text`), not parquet, and the engine
  * needs a schema-validated, error-routed path from those lines to the
  * dedup-ready (id, text, meta) projection every downstream family
  * (dedup, quality filters, LM scoring, search) consumes.
  *
  * Design: ONE narrow text scan (`spark.read.text` — splittable for
  * plain files, per-file parallel for .gz, no driver-side listing
  * logic) feeds a single codegen'd [[from_json]] against the CALLER'S
  * explicit schema — never schema inference, which at 100 TB would
  * burn a full pre-pass over the corpus and silently widen types on
  * dirty lines. Malformed lines are NOT dropped and NOT poisoned into
  * null-field rows: PERMISSIVE mode with a corrupt-record column
  * routes them to an explicit per-row `_status` channel (the
  * `Pipeline` row-level error-capture shape, `plans/Pipeline.scala`),
  * so corpus accounting stays exact — valid + error rows == input
  * lines, pinned by ScaleSpec.
  *
  * Row statuses:
  *  - `ok`                — parsed, every `required` field non-null;
  *  - `missing_required`  — valid JSON, but a `required` field is
  *                          absent/null (includes the literal `null`
  *                          line, which parses to an all-null row);
  *  - `corrupt`           — not valid JSON (truncated line, binary
  *                          garbage, empty line).
  * Failed rows carry the raw line in `_raw` (null for ok rows — the
  * wide string never rides along the happy path), so the error
  * side-output can be persisted for replay/triage exactly like the
  * reference's per-node error channel (`dpl/processor/nodes/base.py:
  * 137-142` keeps failed items with their exception).
  *
  * Scale shape: zero shuffles — a line-local parse + projection, so
  * ingest is embarrassingly parallel and the first shuffle of any
  * pipeline stays owned by the consumer (dedup keys, quality
  * aggregations). Column pruning happens at the projection: callers
  * selecting (id, text) after [[valid]] carry no meta fields through
  * downstream exchanges.
  */
object TextIngest {

  /** Parse newline-delimited JSON at `path` against `schema`.
    * Returns one row PER INPUT LINE: the schema's fields (null where
    * unparseable) plus `_status` in {ok, missing_required, corrupt}
    * and `_raw` (the original line, error rows only). `required`
    * names fields that must be non-null for a row to count as ok —
    * typically the id and text columns. `schema` must not itself
    * contain `_corrupt_record`, `_status` or `_raw`. */
  def jsonlWithErrors(spark: SparkSession, path: String, schema: StructType,
                      required: Seq[String]): DataFrame =
    project(spark.read.text(path), schema, required)

  /** [[jsonlWithErrors]] for delimiter-separated lines (CSV/TSV — the
    * other wire format corpora actually arrive in): the same narrow
    * text scan and the same three status channels, parsed by ONE
    * codegen'd [[from_csv]] against the caller's explicit schema.
    * Wrong column counts flag corrupt; an empty field parses as NULL
    * (the CSV convention), so a missing required value routes to
    * `missing_required` exactly like JSON's absent key. Quoting is
    * RFC 4180 (doubled quotes escape — Spark's default backslash
    * escape is overridden, since corpus dumps follow the RFC). */
  def csvWithErrors(spark: SparkSession, path: String, schema: StructType,
                    required: Seq[String],
                    delimiter: String = ","): DataFrame =
    project(spark.read.text(path), schema, required,
      (line, full) => from_csv(line, full,
        Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
          "escape" -> "\"",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))

  /** Register a pure-Java zstd codec for `.zst` text ingest — the
    * format modern corpora actually ship. Hadoop's own ZStandardCodec
    * needs native libhadoop (absent in most Spark containers); the
    * aircompressor codec on Spark's classpath decodes standard zstd
    * frames in plain JVM code, so `.zst` files flow through the SAME
    * extension-dispatched text scan as `.gz` once this is appended to
    * the Hadoop codec list. Idempotent; call once per session before
    * the first `.zst` read. Existing `io.compression.codecs` entries
    * are preserved (an unset list falls back to Hadoop's defaults,
    * re-declared here so appending cannot drop gzip/bzip2). */
  def enableZstd(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val zstd = "io.airlift.compress.zstd.ZstdCodec"
    val cur = Option(conf.get(key))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(
        "org.apache.hadoop.io.compress.DefaultCodec",
        "org.apache.hadoop.io.compress.GzipCodec",
        "org.apache.hadoop.io.compress.BZip2Codec"))
    if (!cur.contains(zstd)) conf.set(key, (cur :+ zstd).mkString(","))
  }

  /** Streaming twin of [[jsonlWithErrors]] — `readStream.text` over a
    * landing directory (exactly-once per file via the query
    * checkpoint, the [[graft.streaming.Streaming.clipFileStream]]
    * memoization shape), the SAME stateless line-local projection:
    * streamed parse == batch parse is STRUCTURAL, there is no state
    * to drift (StreamingSpec pins it file-drop by file-drop). Route
    * [[valid]] rows into the live maintainers and [[errors]] to the
    * side-channel sink. */
  def jsonlStream(spark: SparkSession, path: String, schema: StructType,
                  required: Seq[String],
                  maxFilesPerTrigger: Int = 32): DataFrame =
    project(
      spark.readStream.option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path),
      schema, required)

  private def project(lines: DataFrame, schema: StructType,
                      required: Seq[String],
                      parse: (Column, StructType) => Column =
                        (line, full) => from_json(line, full,
                          Map("mode" -> "PERMISSIVE",
                            "columnNameOfCorruptRecord" ->
                              "_corrupt_record"))): DataFrame = {
    val reserved = Seq("_corrupt_record", "_status", "_raw")
    require(schema.fieldNames.forall(f => !reserved.contains(f)),
      s"TextIngest: schema must not contain ${reserved.mkString("/")}")
    require(required.forall(schema.fieldNames.contains),
      s"TextIngest: required fields ${required.mkString(",")} must " +
        s"all be in the schema (${schema.fieldNames.mkString(",")})")
    val full = schema.add("_corrupt_record", StringType)
    val parsed = lines
      .select(col("value").as("__raw"),
        parse(col("value"), full).as("__rec"))
    val isCorrupt = col("__rec._corrupt_record").isNotNull
    val missing: Column = required
      .map(f => col(s"__rec.$f").isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(isCorrupt, lit("corrupt"))
      .when(missing, lit("missing_required"))
      .otherwise(lit("ok"))
    parsed.select(
      schema.fieldNames.toSeq.map(f => col(s"__rec.$f").as(f)) ++ Seq(
        status.as("_status"),
        when(status =!= "ok", col("__raw"))
          .otherwise(lit(null).cast(StringType)).as("_raw")): _*)
  }

  /** The ok rows of [[jsonlWithErrors]], schema fields only — the
    * dedup-ready projection downstream operators consume. */
  def valid(ingested: DataFrame): DataFrame =
    ingested.where(col("_status") === "ok")
      .drop("_status", "_raw")

  /** The failed rows with their raw lines — persist beside the run
    * report for replay/triage (the error side-output). */
  def errors(ingested: DataFrame): DataFrame =
    ingested.where(col("_status") =!= "ok")
      .select(col("_status"), col("_raw"))
}
