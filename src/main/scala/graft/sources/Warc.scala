package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500 / WARC-1.1) ingest front door — the format every
  * web-scale pretraining corpus actually starts from (Common Crawl
  * ships `.warc.gz` segments), completing the ingest surface next to
  * [[TextIngest.jsonlWithErrors]] / `csvWithErrors` with the SAME
  * three-way status-channel contract: every byte of input is
  * accounted for as `ok`, `missing_required` or `corrupt` — no byte
  * silently dropped, no malformed record poisoning the stream.
  *
  * Format (public spec, ISO 28500): a WARC file is a concatenation of
  * records, each
  *
  *   WARC/1.1<CRLF>
  *   Name: value<CRLF> ...          (named headers)
  *   <CRLF>                         (blank line ends the header block)
  *   <Content-Length octets>        (payload, opaque bytes)
  *   <CRLF><CRLF>                   (record separator)
  *
  * Parse semantics (deterministic, total — every input byte lands in
  * exactly one output row):
  *  - a record starts at a `WARC/` magic on a line boundary whose
  *    version line matches `WARC/<digits>.<digits>`; headers are
  *    `name: value` lines (names case-insensitive, first occurrence
  *    wins, values trimmed) up to the first blank line;
  *  - `Content-Length` (digits, fits int64) FRAMES the payload — if it
  *    is missing, malformed, or runs past EOF the record is `corrupt`.
  *    A declared-length overrun with NO later record magic is a
  *    genuine end-of-file truncation: the fixed `_raw` marker
  *    `TRUNCATED`, scan ends. An overrun FOLLOWED by another
  *    line-boundary `WARC/` magic is a lying length header — the
  *    record becomes one `corrupt` row with the fixed marker
  *    `OVERRUN` and the walk resumes at that magic, so one flipped
  *    length byte cannot eat the rest of a segment;
  *  - a framed record with all of `WARC-Type`, `WARC-Record-ID`,
  *    `WARC-Date` present is `ok`; framed but missing one of those
  *    mandatory names (ISO 28500 §5) is `missing_required` — fields
  *    still populated, payload still captured;
  *  - anything else (garbage between records, a bad version line) is
  *    ONE `corrupt` row spanning to the next line-boundary `WARC/`
  *    magic (or EOF), carrying the span's first 120 bytes in `_raw`
  *    for triage — the resync rule that keeps one flipped record from
  *    eating the rest of a 1 GB segment.
  *
  * Compression: gzip (magic 1f 8b) and zstd (28 b5 2f fd) streams are
  * sniffed and inflated in-expression — gzip via the JDK (which walks
  * the concatenated per-record members Common Crawl writes), zstd via
  * the pure-Java aircompressor decoder already on Spark's classpath
  * (the [[TextIngest.enableZstd]] codec, reused as a stream). A
  * broken compressed stream yields a single `corrupt` row with the
  * `DECOMPRESS:` marker — as does a stream that inflates past the
  * ~2 GiB JVM byte-array ceiling (the hard per-file decompressed
  * bound of any in-memory walker; Common Crawl's ~1 GB `.warc.gz`
  * segments inflate to 4–5 GiB, so RE-SHARD such segments below
  * 2 GiB decompressed before ingest — the bound fails loud, never
  * with an opaque OOM or negative-capacity crash).
  *
  * Scale shape: WARC members are not splittable (gzip members chain
  * per record; offsets only mean anything within a member), so the
  * FILE is the parallelism unit — exactly how Common Crawl shards its
  * crawls into ~1 GB segments by design. One `binaryFile` scan, one
  * single-pass walker per file (a custom expression — the
  * [[graft.functions]] CollapseProject discipline), one explode; zero
  * shuffles, so ingest stays embarrassingly parallel and the first
  * exchange belongs to the consumer (dedup keys, quality aggs).
  * Memory: decompressed-file-sized per task — size
  * `spark.sql.files.maxPartitionBytes` / executor memory for the
  * segment size, the same contract as any unsplittable-codec read. */
object Warc {

  /** Walk one (decompressed-if-needed) WARC byte stream into its
    * records. Input binary; output array of structs — see [[Warc]]
    * for the exact parse semantics. */
  case class WarcRecordsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(Warc.recordType,
      containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "warc_records"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"warc_records needs binary, got $t")
      }
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        Warc.parse(input.asInstanceOf[Array[Byte]]).toArray[Any])
    override protected def withNewChildInternal(
        newChild: Expression): WarcRecordsExpr = copy(child = newChild)
  }

  val recordType: StructType = StructType(Seq(
    StructField("rec_offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("_status", StringType, nullable = false),
    StructField("_raw", StringType, nullable = true)))

  def warc_records(content: Column): Column =
    ExprBridge.column(WarcRecordsExpr(ExprBridge.expression(content)))

  /** The front door: one `binaryFile` scan over `path` (glob ok),
    * one walker per file, records exploded with their source path.
    * Output: (path, rec_offset, warc_type, record_id, target_uri,
    * warc_date, content_type, content_length, payload, _status,
    * _raw). */
  def warcWithErrors(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    records(spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")))

  /** Streaming twin of [[warcWithErrors]] — the binaryFile file
    * source over a landing directory (exactly-once per file via the
    * query checkpoint, the [[TextIngest.jsonlStream]] shape), the
    * SAME stateless per-file walk: streamed parse == batch parse is
    * STRUCTURAL — there is no state to drift (StreamingSpec pins it
    * file-drop by file-drop, damage included). */
  def warcStream(spark: org.apache.spark.sql.SparkSession, path: String,
                 maxFilesPerTrigger: Int = 8): DataFrame =
    records(spark.readStream
      .format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content")))

  /** The walker over an explicit (path, content) frame — the gate /
    * already-scanned entry point. */
  def records(files: DataFrame): DataFrame = files
    .select(col("path"), explode(warc_records(col("content"))).as("__r"))
    .select(col("path") +: recordType.fieldNames.toSeq
      .map(f => col(s"__r.$f").as(f)): _*)

  /** The ok rows, status columns dropped — the downstream-ready
    * projection ([[TextIngest.valid]] contract). */
  def valid(ingested: DataFrame): DataFrame =
    ingested.where(col("_status") === "ok").drop("_status", "_raw")

  /** The failed rows with their triage snippet ([[TextIngest.errors]]
    * contract). */
  def errors(ingested: DataFrame): DataFrame =
    ingested.where(col("_status") =!= "ok")
      .select(col("path"), col("rec_offset"), col("_status"), col("_raw"))

  // ------------------------------------------------------------------
  // kernel
  // ------------------------------------------------------------------

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def isMagicAt(b: Array[Byte], p: Int): Boolean = {
    if (p < 0 || p + Magic.length > b.length) return false
    var i = 0
    while (i < Magic.length) {
      if (b(p + i) != Magic(i)) return false
      i += 1
    }
    p == 0 || b(p - 1) == '\n'
  }

  /** Next line-boundary magic at or after `from`, else length. */
  private def resync(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p < b.length && !isMagicAt(b, p)) p += 1
    p
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 3 < b.length) {
      if (b(p) == '\r' && b(p + 1) == '\n' && b(p + 2) == '\r' &&
        b(p + 3) == '\n') return p
      p += 1
    }
    -1
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def snippet(b: Array[Byte], from: Int, until: Int): UTF8String =
    UTF8String.fromString(new String(b, from,
      math.min(120, until - from), java.nio.charset.StandardCharsets.UTF_8))

  private def corruptRow(offset: Long, raw: UTF8String): InternalRow =
    InternalRow(offset, null, null, null, null, null, null, null,
      utf8("corrupt"), raw)

  /** Hard decompressed-bytes-per-file ceiling: a JVM byte array tops
    * out just under 2^31, so any member inflating past this CANNOT be
    * walked in memory — it must fail as a loud `DECOMPRESS:` corrupt
    * row, never as an OOM that kills the task. */
  private val MaxInflatedBytes: Long = Int.MaxValue.toLong - 16L

  private def inflate(raw: Array[Byte]): scala.Either[String, Array[Byte]] = {
    def drain(in: java.io.InputStream): scala.Either[String, Array[Byte]] = {
      // initial capacity clamped to 64 MiB: `raw.length * 4` in Int
      // overflows negative for >=512 MiB compressed members
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(raw.length.toLong, 65536L), 64L << 20).toInt)
      val buf = new Array[Byte](65536)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > MaxInflatedBytes)
          return scala.Left(
            "DECOMPRESS: stream inflates past the ~2 GiB JVM " +
              "byte-array ceiling — re-shard the segment below 2 GiB " +
              "decompressed")
        out.write(buf, 0, n); n = in.read(buf)
      }
      scala.Right(out.toByteArray)
    }
    try {
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b)
        drain(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw)))
      else if (raw.length >= 4 && (raw(0) & 0xff) == 0x28 &&
        (raw(1) & 0xff) == 0xb5 && (raw(2) & 0xff) == 0x2f &&
        (raw(3) & 0xff) == 0xfd)
        drain(new io.airlift.compress.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(raw)))
      else scala.Right(raw)
    } catch {
      // MalformedInputException (aircompressor's corrupt-zstd signal)
      // is a RuntimeException, not an IOException — both land here
      case e: java.io.IOException =>
        scala.Left(s"DECOMPRESS: ${e.getMessage}")
      case e: io.airlift.compress.MalformedInputException =>
        scala.Left(s"DECOMPRESS: ${e.getMessage}")
    }
  }

  /** The single-pass record walk — see [[Warc]] for the semantics. */
  def parse(rawBytes: Array[Byte]): Seq[InternalRow] = {
    val b = inflate(rawBytes) match {
      case scala.Left(msg) => return Seq(corruptRow(0L, utf8(msg)))
      case scala.Right(x) => x
    }
    val n = b.length
    val out = Seq.newBuilder[InternalRow]
    val versionRe = "WARC/\\d+\\.\\d+".r
    var p = 0
    while (p < n) {
      var advanced = false
      if (isMagicAt(b, p)) {
        val hEnd = indexOfCrlfCrlf(b, p)
        if (hEnd >= 0) {
          val headerText = new String(b, p, hEnd - p,
            java.nio.charset.StandardCharsets.UTF_8)
          val lines = headerText.split("\r\n", -1)
          val versionOk = versionRe.pattern.matcher(lines.head).matches()
          val kvs = lines.tail.flatMap { ln =>
            val i = ln.indexOf(':')
            if (i <= 0) None
            else Some(ln.substring(0, i).toLowerCase(Locale) ->
              ln.substring(i + 1).trim)
          }
          // first occurrence wins (deterministic under repetition)
          val hs = kvs.foldLeft(Map.empty[String, String]) {
            case (m, (k, v)) => if (m.contains(k)) m else m + (k -> v)
          }
          val badHeader = lines.tail.exists(_.indexOf(':') <= 0)
          val lenOpt = hs.get("content-length")
            .filter(s => s.nonEmpty && s.forall(_.isDigit) &&
              s.length <= 18).map(_.toLong)
          if (versionOk && !badHeader && lenOpt.isDefined) {
            val len = lenOpt.get
            val payloadStart = hEnd + 4
            if (payloadStart + len > n) {
              // lying length header vs genuine EOF truncation: if a
              // later line-boundary magic exists the header is the
              // damage — resync there so one flipped length byte
              // cannot eat the rest of the segment
              val q = resync(b, math.min(payloadStart, n))
              if (q < n) {
                out += corruptRow(p.toLong, utf8("OVERRUN"))
                p = q
              } else {
                out += corruptRow(p.toLong, utf8("TRUNCATED"))
                p = n
              }
              advanced = true
            } else {
              val payload = java.util.Arrays.copyOfRange(
                b, payloadStart, payloadStart + len.toInt)
              val mandatory = Seq("warc-type", "warc-record-id",
                "warc-date")
              val status =
                if (mandatory.forall(hs.contains)) "ok"
                else "missing_required"
              def h(k: String): Any =
                hs.get(k).map(utf8).orNull
              out += InternalRow(p.toLong, h("warc-type"),
                h("warc-record-id"), h("warc-target-uri"),
                h("warc-date"), h("content-type"), len, payload,
                utf8(status), null)
              var q = payloadStart + len.toInt
              // consume the record separator if present; junk instead
              // falls to the next iteration's corrupt/resync path
              if (q + 3 < n && b(q) == '\r' && b(q + 1) == '\n' &&
                b(q + 2) == '\r' && b(q + 3) == '\n') q += 4
              else if (q < n && (n - q) <= 4 &&
                (q until n).forall(i => b(i) == '\r' || b(i) == '\n'))
                q = n // trailing (possibly partial) separator at EOF
              p = q
              advanced = true
            }
          }
        }
      }
      if (!advanced) {
        // not a record here: bad magic position, bad version line,
        // malformed headers, or unframeable Content-Length — one
        // corrupt span to the next line-boundary magic
        val q = resync(b, p + 1)
        out += corruptRow(p.toLong, snippet(b, p, q))
        p = q
      }
    }
    out.result()
  }

  private val Locale = java.util.Locale.ROOT
}
