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

/** HTML→text extraction — the step between [[Warc]] ingest and the
  * curation chain. A Common Crawl `response` payload is an HTTP
  * message wrapping HTML; until it is stripped, decoded and
  * de-boilerplated, the WARC door opens onto markup, not text. This
  * is the public CCNet/trafilatura-shaped front door, re-expressed as
  * three deterministic single-pass kernels (the
  * [[graft.functions]] CollapseProject discipline — every kernel
  * evaluates its child exactly once per row, so plan-level inlining
  * cannot multiply work):
  *
  *  1. '''HTTP message parse''' (RFC 9112 shape): status line →
  *     status code; headers (case-insensitive names, first occurrence
  *     wins) → `Content-Type` media type + charset parameter;
  *     `Transfer-Encoding: chunked` bodies are de-chunked (hex size
  *     lines, extensions ignored, trailers dropped). A missing
  *     `HTTP/` status line, missing header terminator, or malformed
  *     chunk framing is `corrupt_http`. The inner `Content-Length`
  *     is IGNORED — the WARC record already framed the payload
  *     exactly (ISO 28500 §5), so trusting a second, possibly lying
  *     length would re-introduce the overrun class [[Warc]] resyncs
  *     away.
  *  2. '''Charset determination''' (the WHATWG-prescan-shaped rule
  *     chain CCNet uses): the `Content-Type` charset parameter if
  *     declared; else a `charset=` sniff over the first 1024 body
  *     bytes (HTML only); a declared-or-sniffed UTF-8 is VALIDATED —
  *     if the bytes do not decode as UTF-8 the page falls back to
  *     windows-1252 with `charset_source = 'fallback'` (a
  *     declared-vs-actual mismatch is data damage, not a crash);
  *     undeclared pages decode UTF-8 when valid (`'utf8'`), else
  *     windows-1252 (`'fallback'`). Decoding is total — every byte
  *     maps, no exceptions.
  *  3. '''Tag strip with block segmentation + boilerplate line
  *     rules''' (jusText-shaped, Pomikálek 2011 / CCNet heuristics,
  *     frozen constants): `script`/`style`/`title`/`noscript`
  *     content is dropped wholesale, comments and doctypes skipped,
  *     the common named + numeric character references decoded,
  *     whitespace collapsed; block-level tags cut the text into
  *     blocks, each carrying its opening tag, nearest semantic
  *     container (`nav`/`header`/`footer`/`aside`), character count
  *     and anchor-text character count. A block is BOILERPLATE iff
  *     it sits inside a semantic container, its link density exceeds
  *     1/3 (`3 * anchor_chars > chars`, exact integer form), or it is
  *     shorter than 25 characters; survivors join with `\n` in
  *     document order.
  *
  * Status contract (the [[Warc]] / TextIngest three-way discipline,
  * widened to the HTTP outcomes): `ok` (HTML extracted, non-empty),
  * `ok_plain` (a `text/plain` body, decoded verbatim), `empty_text`
  * (parsed fine, nothing survived boilerplate), `skip_status`
  * (HTTP status ≠ 200), `not_text` (media type is neither HTML nor
  * plain text), `corrupt_http` (unparseable message). Every payload
  * lands in exactly one.
  *
  * Scale shape: map-only — one expression evaluation per WARC record,
  * zero shuffles; parallelism is inherited from the WARC scan (file =
  * unit). The composed front door is
  * `Warc.records → [[extractFromWarc]] → curation`.
  *
  * Reference: this replaces the manual "download, run trafilatura"
  * stage a reference-pipeline user performs before
  * `dpl/processor/nodes` ever sees data; the reference itself starts
  * from already-extracted clips (`dpl/graph/graph.py`), so this
  * operator is beyond-reference surface. */
object HtmlText {

  /** Frozen boilerplate constants (public heuristics: jusText's
    * link-density ceiling, CCNet's short-line rule). */
  val MaxLinkDensityNum = 1
  val MaxLinkDensityDen = 3
  val MinBlockChars = 25

  // ------------------------------------------------------------------
  // expressions
  // ------------------------------------------------------------------

  val httpType: StructType = StructType(Seq(
    StructField("status_code", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("charset_source", StringType, nullable = true),
    StructField("text_html", StringType, nullable = true),
    StructField("_status", StringType, nullable = false)))

  val extractType: StructType = StructType(Seq(
    StructField("status_code", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("charset_source", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    // absolute http(s) outlinks in document order (HTML rows; empty
    // for text/plain; NULL when no text body was parsed) — the Common
    // Crawl webgraph feedstock
    StructField("links", ArrayType(StringType, containsNull = false),
      nullable = true),
    // raw content of the first <meta name="robots"> tag (HTML rows;
    // NULL when absent or no HTML) — the crawl-compliance signal
    StructField("robots", StringType, nullable = true),
    // first <title> inner text, whitespace-collapsed (HTML rows; NULL
    // when absent/empty or no HTML) — the page-metadata column a
    // curated web corpus ships next to the body text
    StructField("title", StringType, nullable = true),
    StructField("_status", StringType, nullable = false)))

  val blockType: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("container", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_anchor_chars", IntegerType, nullable = false)))

  /** HTTP message → (status_code, content_type, charset,
    * charset_source, text_html, _status) — kernels 1+2, decoded but
    * not yet de-boilerplated (the audit/inspection entry point). */
  case class HttpHtmlExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = httpType
    override def nullable: Boolean = true
    override def prettyName: String = "http_html"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"http_html needs binary, got $t")
      }
    override def nullSafeEval(input: Any): Any =
      HtmlKernels.httpRow(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(
        newChild: Expression): HttpHtmlExpr = copy(child = newChild)
  }

  /** HTML string → block table (kernel 3 before the rules) — the
    * block-level audit view with per-block link densities. */
  case class HtmlBlocksExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(blockType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "html_blocks"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"html_blocks needs string, got $t")
      }
    override def nullSafeEval(input: Any): Any = {
      val blocks = HtmlKernels.parseBlocks(input.toString)
      new GenericArrayData(blocks.zipWithIndex.map { case (b, i) =>
        InternalRow(i, UTF8String.fromString(b.tag),
          UTF8String.fromString(b.container),
          UTF8String.fromString(b.text), b.text.length, b.nAnchor)
      }.toArray[Any])
    }
    override protected def withNewChildInternal(
        newChild: Expression): HtmlBlocksExpr = copy(child = newChild)
  }

  /** HTML string → extracted text (kernel 3 + rules, one pass). NULL
    * when nothing survives — never the empty string, so a caller can
    * branch on nullability without re-evaluating the kernel. */
  case class HtmlTextExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "html_text"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"html_text needs string, got $t")
      }
    override def nullSafeEval(input: Any): Any = {
      val t = HtmlKernels.extractText(input.toString)
      if (t.isEmpty) null else UTF8String.fromString(t)
    }
    override protected def withNewChildInternal(
        newChild: Expression): HtmlTextExpr = copy(child = newChild)
  }

  /** The fused front door: HTTP parse + charset + extraction in ONE
    * expression evaluation per payload (status contract above) — the
    * form [[extractFromWarc]] plans, so the final status can branch on
    * the extraction without a second kernel run (CollapseProject
    * would re-inline a staged `html_text` into every reference). */
  case class HtmlExtractExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = extractType
    override def nullable: Boolean = true
    override def prettyName: String = "html_extract"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"html_extract needs binary, got $t")
      }
    override def nullSafeEval(input: Any): Any =
      HtmlKernels.extractRow(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(
        newChild: Expression): HtmlExtractExpr = copy(child = newChild)
  }

  val robotsType: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("rule", StringType, nullable = false)))

  /** RFC 9309 robots.txt verdict for (robots_txt, path, user_agent):
    * struct(allowed, rule) — `rule` is the winning
    * `allow:<pattern>` / `disallow:<pattern>` or `default`. NULL
    * robots.txt (host never served one) → NULL; callers coalesce to
    * the allow default. One kernel evaluation per row (parse + group
    * select + longest-match); for per-host reuse at corpus scale,
    * join the TINY per-host robots table broadcast and let the
    * expression run per page — the parse is linear in the (small)
    * robots.txt, not the page. */
  case class RobotsAllowedExpr(first: Expression, second: Expression,
                               third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = robotsType
    override def nullable: Boolean = true
    override def prettyName: String = "robots_allowed"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (StringType, StringType, StringType) =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"robots_allowed needs (string, string, string), got $t")
      }
    override def nullSafeEval(txt: Any, path: Any, ua: Any): Any = {
      val (allowed, rule) = HtmlKernels.robotsDecision(
        txt.toString, path.toString, ua.toString)
      InternalRow(allowed, UTF8String.fromString(rule))
    }
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): RobotsAllowedExpr =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  def robots_allowed(robotsTxt: Column, path: Column,
                     ua: Column): Column =
    ExprBridge.column(RobotsAllowedExpr(ExprBridge.expression(robotsTxt),
      ExprBridge.expression(path), ExprBridge.expression(ua)))

  def http_html(payload: Column): Column =
    ExprBridge.column(HttpHtmlExpr(ExprBridge.expression(payload)))
  def html_blocks(html: Column): Column =
    ExprBridge.column(HtmlBlocksExpr(ExprBridge.expression(html)))
  def html_text(html: Column): Column =
    ExprBridge.column(HtmlTextExpr(ExprBridge.expression(html)))
  def html_extract(payload: Column): Column =
    ExprBridge.column(HtmlExtractExpr(ExprBridge.expression(payload)))

  /** The composed front door over a [[Warc.records]] frame: every
    * `ok` `response` record's payload through the fused kernel.
    * Output: (path, rec_offset, record_id, target_uri, status_code,
    * content_type, charset, charset_source, text, _status). Map-only
    * (one Generate, zero exchanges); non-`response` and non-`ok`
    * WARC rows are NOT dropped silently — they stay on the
    * [[Warc.errors]] channel upstream, this operator only consumes
    * the `ok` stream. */
  def extractFromWarc(records: DataFrame): DataFrame =
    records
      .where(col("_status") === "ok" &&
        lower(col("warc_type")) === "response")
      .select(col("path"), col("rec_offset"), col("record_id"),
        col("target_uri"), inline(array(html_extract(col("payload")))))

  /** The curation-ready rows: extraction succeeded, text attached. */
  def valid(extracted: DataFrame): DataFrame = extracted
    .where(col("_status").isin("ok", "ok_plain"))
    .drop("_status")

  /** The FULL text front door in one call: WARC records → HTTP strip →
    * charset decode → boilerplate extraction → quality features (the
    * q342 chain). Every stage is a stateless per-row transform, so the
    * SAME function curates a batch [[Warc.warcWithErrors]] frame or a
    * [[Warc.warcStream]] micro-batch stream — streamed == batch is
    * structural, and StreamingSpec pins it file-drop by file-drop
    * including a checkpoint restart. Keyed by record_id (always
    * present on `ok` records); path/rec_offset/target_uri/charset
    * ride along for provenance. */
  def curateFromWarc(records: DataFrame): DataFrame =
    graft.operators.TextAnalysis.qualityFeatures(
      valid(extractFromWarc(records)), "record_id", "text",
      passthrough = Seq("path", "rec_offset", "target_uri", "charset"))

  /** Per-host curation-mix report over an [[extractFromWarc]] frame:
    * page count, status mix, noindex count, curated survivors
    * (ok/ok_plain AND confidently-UTF-8 AND not noindex) and their
    * integer token budget. ONE partial-aggregated groupBy(host) —
    * and because it is a plain streaming-supported aggregation, the
    * SAME function is the live maintainer: feed it
    * [[Warc.warcStream]] records and run complete-mode with a
    * checkpoint (StreamingSpec pins streamed == batch drop-by-drop
    * including a state-restoring restart). The floor-div mean is
    * derived from the two exact sums, so incremental maintenance can
    * never drift from the batch report. */
  def domainMix(extracted: DataFrame): DataFrame = {
    val host = lower(regexp_extract(col("target_uri"),
      "^https?://([^/]+)", 1))
    val noindex = coalesce(lower(col("robots")).rlike("noindex"),
      lit(false))
    val curated = col("_status").isin("ok", "ok_plain") &&
      col("charset") === "utf-8" && !noindex
    extracted.select(host.as("host"), col("_status").as("__st"),
        noindex.as("__ni"), curated.as("__cu"),
        when(curated,
          graft.operators.TextAnalysis.tokenCount(col("text")))
          .otherwise(lit(0L)).as("__tok"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("__st") === "ok", 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("__st") === "ok_plain", 1L).otherwise(0L))
          .as("n_ok_plain"),
        sum(when(col("__st") === "empty_text", 1L).otherwise(0L))
          .as("n_empty"),
        sum(when(col("__st") === "skip_status", 1L).otherwise(0L))
          .as("n_skip"),
        sum(when(col("__st") === "not_text", 1L).otherwise(0L))
          .as("n_not_text"),
        sum(when(col("__st") === "corrupt_http", 1L).otherwise(0L))
          .as("n_corrupt"),
        sum(when(col("__ni"), 1L).otherwise(0L)).as("n_noindex"),
        sum(when(col("__cu"), 1L).otherwise(0L)).as("n_curated"),
        sum(col("__tok")).as("curated_tokens"))
      .withColumn("mean_tokens_micro",
        when(col("n_curated") > 0L, call_function("div",
          lit(1000000L) * col("curated_tokens"), col("n_curated"))))
  }
}

/** The three kernels — plain JVM functions so the expression layer
  * stays a thin adapter and the unit specs can drive them directly. */
object HtmlKernels {
  import HtmlText.{MaxLinkDensityDen, MaxLinkDensityNum, MinBlockChars}
  // the file-level catalyst.expressions._ wildcard shadows scala's
  // Either constructors with the LEFT()/RIGHT() string expressions —
  // re-import the real ones at nearer scope
  import scala.{Either, Left, Right}

  final case class Block(tag: String, container: String, text: String,
                         nAnchor: Int)

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  // ---------------------------------------------------------------
  // kernel 1: HTTP message parse (+ chunked decode)
  // ---------------------------------------------------------------

  final case class HttpMsg(statusCode: Int,
                           headers: Map[String, String],
                           body: Array[Byte])

  /** Parse an HTTP/1.x response message. Left(reason) on corruption:
    * no status line, no header terminator, malformed chunking. */
  def parseHttp(b: Array[Byte]): Either[String, HttpMsg] = {
    // status line: up to the first LF (tolerating bare LF per RFC
    // 9112 §2.2's "MAY recognize a single LF")
    var eol = 0
    val lineLimit = math.min(b.length, 8192)
    while (eol < lineLimit && b(eol) != '\n') eol += 1
    if (eol >= lineLimit) return Left("no status line")
    val rawLine = new String(b, 0,
      if (eol > 0 && b(eol - 1) == '\r') eol - 1 else eol,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = StatusRe.pattern.matcher(rawLine)
    if (!m.matches()) return Left("bad status line")
    val code = m.group(1).toInt
    // header terminator: first CRLFCRLF or LFLF after the status line
    var term = -1
    var termLen = 0
    var p = eol + 1
    while (term < 0 && p < b.length) {
      if (b(p) == '\n') {
        if (p + 1 < b.length && b(p + 1) == '\n') { term = p + 1; termLen = 1 }
        else if (p + 2 < b.length && b(p + 1) == '\r' &&
          b(p + 2) == '\n') { term = p + 2; termLen = 1 }
      }
      if (term < 0) p += 1
    }
    if (term < 0) {
      // a header block ending exactly at EOF (no body) is legal
      if (b.length - (eol + 1) >= 0 && endsWithNewline(b)) {
        val hdrs = parseHeaders(new String(b, eol + 1, b.length - eol - 1,
          java.nio.charset.StandardCharsets.ISO_8859_1))
        return Right(HttpMsg(code, hdrs, Array.emptyByteArray))
      }
      return Left("no header terminator")
    }
    val hdrs = parseHeaders(new String(b, eol + 1, (term - termLen) - eol,
      java.nio.charset.StandardCharsets.ISO_8859_1))
    val body0 = java.util.Arrays.copyOfRange(b, term + 1, b.length)
    val body =
      if (hdrs.get("transfer-encoding")
          .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked")))
        dechunk(body0) match {
          case Right(x) => x
          case Left(msg) => return Left(msg)
        }
      else body0
    Right(HttpMsg(code, hdrs, body))
  }

  private val StatusRe = "HTTP/\\d+(?:\\.\\d+)? (\\d{3})(?: .*)?".r

  private def endsWithNewline(b: Array[Byte]): Boolean =
    b.nonEmpty && b(b.length - 1) == '\n'

  private def parseHeaders(text: String): Map[String, String] =
    text.split("\r\n|\n", -1).foldLeft(Map.empty[String, String]) {
      (m, ln) =>
        val i = ln.indexOf(':')
        if (i <= 0) m
        else {
          val k = ln.substring(0, i).trim
            .toLowerCase(java.util.Locale.ROOT)
          if (m.contains(k)) m else m + (k -> ln.substring(i + 1).trim)
        }
    }

  /** RFC 9112 §7.1 chunked decoding: hex size line (extensions after
    * `;` ignored), data, CRLF, …, 0-size terminator (trailers
    * dropped). Bare-LF line ends tolerated, same as the headers. */
  def dechunk(b: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 20))
    var p = 0
    while (true) {
      var size = 0L
      var digits = 0
      while (p < b.length && isHex(b(p))) {
        size = size * 16 + hexVal(b(p)); digits += 1; p += 1
        if (size > Int.MaxValue.toLong) return Left("chunk size overflow")
      }
      if (digits == 0) return Left("missing chunk size")
      // skip extensions up to the line end
      while (p < b.length && b(p) != '\n') p += 1
      if (p >= b.length) return Left("unterminated chunk size line")
      p += 1
      if (size == 0L) return Right(out.toByteArray) // trailers dropped
      if (p + size > b.length) return Left("chunk data past EOF")
      out.write(b, p, size.toInt)
      p += size.toInt
      if (p < b.length && b(p) == '\r') p += 1
      if (p >= b.length || b(p) != '\n') return Left("missing chunk CRLF")
      p += 1
    }
    Right(out.toByteArray) // unreachable
  }

  private def isHex(c: Byte): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F')
  private def hexVal(c: Byte): Int =
    if (c <= '9') c - '0'
    else if (c >= 'a') c - 'a' + 10
    else c - 'A' + 10

  // ---------------------------------------------------------------
  // kernel 2: charset determination + total decode
  // ---------------------------------------------------------------

  /** (decoded text, charset label, source label). Total: every byte
    * sequence decodes (UTF-8 is validated; the 8-bit fallbacks map
    * every byte). Sources: `header` (Content-Type parameter), `meta`
    * (prescan sniff), `utf8` (undeclared, validated), `fallback`
    * (declared-or-undeclared bytes that failed UTF-8 validation, or
    * an unrecognized declared name). */
  def decodeCharset(body: Array[Byte], headerCharset: Option[String],
                    sniffMeta: Boolean): (String, String, String) = {
    val declared: Option[(String, String)] =
      headerCharset.map(c => ("header", norm(c)))
        .orElse(if (sniffMeta) metaSniff(body).map(c => ("meta", norm(c)))
        else None)
    declared match {
      case Some((src, cs)) if cs == "utf-8" || cs == "utf8" =>
        if (validUtf8(body)) (decode(body, Utf8), "utf-8", src)
        else (decode(body, W1252), "windows-1252", "fallback")
      case Some((src, cs))
          if cs == "iso-8859-1" || cs == "latin-1" || cs == "latin1" ||
            cs == "iso8859-1" =>
        (decode(body, Latin1), "iso-8859-1", src)
      case Some((src, cs)) if cs == "windows-1252" || cs == "cp1252" =>
        (decode(body, W1252), "windows-1252", src)
      case Some((src, cs)) if cs == "us-ascii" || cs == "ascii" =>
        // superset decode: bytes >127 in a declared-ASCII page are
        // damage; latin-1 maps them deterministically
        (decode(body, Latin1), "us-ascii", src)
      case Some(_) => // unrecognized declared name
        if (validUtf8(body)) (decode(body, Utf8), "utf-8", "fallback")
        else (decode(body, W1252), "windows-1252", "fallback")
      case None =>
        if (validUtf8(body)) (decode(body, Utf8), "utf-8", "utf8")
        else (decode(body, W1252), "windows-1252", "fallback")
    }
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  private val W1252 = java.nio.charset.Charset.forName("windows-1252")

  private def norm(cs: String): String = {
    val t = cs.trim
    val unq =
      if (t.length >= 2 && (t.head == '"' || t.head == '\'') &&
        t.last == t.head) t.substring(1, t.length - 1)
      else t
    unq.trim.toLowerCase(java.util.Locale.ROOT)
  }

  private def decode(b: Array[Byte],
                     cs: java.nio.charset.Charset): String =
    new String(b, cs)

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates,
    * ≤ U+10FFFF). */
  def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c >= 0xc2 && c <= 0xdf) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c >= 0xe0 && c <= 0xef) {
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c >= 0xf0 && c <= 0xf4) {
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
    }
    true
  }

  /** WHATWG-prescan-shaped sniff: the first `charset=` token in the
    * first 1024 body bytes (attribute quoting honored, name chars
    * `[A-Za-z0-9_.:-]`). */
  def metaSniff(body: Array[Byte]): Option[String] = {
    val n = math.min(body.length, 1024)
    val s = new String(body, 0, n, Latin1)
      .toLowerCase(java.util.Locale.ROOT)
    val i = s.indexOf("charset=")
    if (i < 0) return None
    var p = i + "charset=".length
    if (p < s.length && (s(p) == '"' || s(p) == '\'')) {
      val q = s(p)
      p += 1
      val e = s.indexOf(q, p)
      if (e < 0) return None
      Some(s.substring(p, e))
    } else {
      val sb = new StringBuilder
      while (p < s.length && (s(p).isLetterOrDigit || s(p) == '-' ||
        s(p) == '_' || s(p) == '.' || s(p) == ':')) {
        sb += s(p); p += 1
      }
      if (sb.isEmpty) None else Some(sb.toString)
    }
  }

  // ---------------------------------------------------------------
  // kernel 3: tag strip + block segmentation + boilerplate rules
  // ---------------------------------------------------------------

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "thead", "tbody", "blockquote", "pre",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "figure", "figcaption", "dl", "dt", "dd", "hr", "form", "body",
    "html")
  private val Containers: IndexedSeq[String] =
    IndexedSeq("nav", "header", "footer", "aside")
  private val SkipContent: Set[String] =
    Set("script", "style", "title", "noscript", "template")
  private val SpaceTags: Set[String] = Set("td", "th")
  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** One pass, document order. `tag` = the tag that most recently
    * opened a block (`""` before any); `container` = the
    * highest-priority semantic container the block sits inside
    * (`nav` > `header` > `footer` > `aside`), `""` outside all. */
  def parseBlocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val sb = new java.lang.StringBuilder
    var nAnchor = 0
    var pendingSpace = false
    var anchorDepth = 0
    val containerDepth = new Array[Int](Containers.length)
    var blockTag = ""
    val n = html.length

    def containerLabel: String = {
      var i = 0
      while (i < Containers.length) {
        if (containerDepth(i) > 0) return Containers(i)
        i += 1
      }
      ""
    }

    def flush(): Unit = {
      if (sb.length > 0) {
        out += Block(blockTag, containerLabel, sb.toString, nAnchor)
        sb.setLength(0)
      }
      nAnchor = 0
      pendingSpace = false
    }

    def append(c: Char): Unit = {
      if (pendingSpace && sb.length > 0) {
        sb.append(' ')
        if (anchorDepth > 0) nAnchor += 1
      }
      pendingSpace = false
      sb.append(c)
      if (anchorDepth > 0) nAnchor += 1
    }

    var p = 0
    while (p < n) {
      val c = html.charAt(p)
      if (c == '<') {
        if (html.startsWith("<!--", p)) {
          val e = html.indexOf("-->", p + 4)
          p = if (e < 0) n else e + 3
        } else if (p + 1 < n && (html.charAt(p + 1) == '!' ||
          html.charAt(p + 1) == '?')) {
          val e = html.indexOf('>', p + 1)
          p = if (e < 0) n else e + 1
        } else {
          // parse a tag: optional '/', name letters/digits
          var q = p + 1
          val closing = q < n && html.charAt(q) == '/'
          if (closing) q += 1
          val nameStart = q
          while (q < n && (html.charAt(q).isLetter ||
            html.charAt(q).isDigit)) q += 1
          if (q == nameStart) {
            // not a tag — literal '<'
            append('<')
            p += 1
          } else {
            val name = html.substring(nameStart, q)
              .toLowerCase(java.util.Locale.ROOT)
            // scan to '>' honoring quoted attribute values
            var quote: Char = 0
            var selfClosed = false
            while (q < n && (quote != 0 || html.charAt(q) != '>')) {
              val ch = html.charAt(q)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              q += 1
            }
            if (q > p + 1 && q <= n &&
              html.charAt(q - 1) == '/' && quote == 0) selfClosed = true
            p = if (q < n) q + 1 else n
            if (!closing && !selfClosed && SkipContent.contains(name)) {
              // drop content wholesale up to the matching close tag
              val close = "</" + name
              var e = indexOfIgnoreCase(html, close, p)
              if (e < 0) p = n
              else {
                val g = html.indexOf('>', e)
                p = if (g < 0) n else g + 1
              }
            } else {
              if (name == "a") {
                if (closing) { if (anchorDepth > 0) anchorDepth -= 1 }
                else if (!selfClosed) anchorDepth += 1
              }
              val ci = Containers.indexOf(name)
              if (BlockTags.contains(name)) flush()
              if (ci >= 0) {
                if (closing) {
                  if (containerDepth(ci) > 0) containerDepth(ci) -= 1
                } else if (!selfClosed) containerDepth(ci) += 1
              }
              if (BlockTags.contains(name) && !closing) blockTag = name
              else if (BlockTags.contains(name)) blockTag = ""
              if (SpaceTags.contains(name)) pendingSpace = true
            }
          }
        }
      } else if (c == '&') {
        // character reference: up to 12 chars to ';'
        val e = html.indexOf(';', p + 1)
        val ref = if (e > p && e - p <= 12) html.substring(p + 1, e)
          else null
        val decoded: String =
          if (ref == null) null
          else if (NamedEntities.contains(ref)) NamedEntities(ref)
          else if (ref.length >= 2 && ref.charAt(0) == '#') {
            val cp =
              try {
                if (ref.charAt(1) == 'x' || ref.charAt(1) == 'X')
                  Integer.parseInt(ref.substring(2), 16)
                else Integer.parseInt(ref.substring(1))
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0x20 && cp <= 0x10ffff &&
              !(cp >= 0xd800 && cp <= 0xdfff))
              new String(Character.toChars(cp))
            else null
          } else null
        if (decoded != null) {
          decoded.foreach { ch =>
            if (ch == ' ') { if (sb.length > 0) pendingSpace = true }
            else append(ch)
          }
          p = e + 1
        } else {
          append('&')
          p += 1
        }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
        c == '\f') {
        if (sb.length > 0) pendingSpace = true
        p += 1
      } else {
        append(c)
        p += 1
      }
    }
    flush()
    out.result()
  }

  // ---------------------------------------------------------------
  // tag-attribute scanners: outlinks + meta robots (one O(n) pass
  // each, inside the same fused expression evaluation as the text
  // extraction — never staged as separate columns)
  // ---------------------------------------------------------------

  /** Walk every element tag (skipping comments, doctypes and the
    * content of script/style/… exactly like [[parseBlocks]]) and hand
    * (lowercased name, raw attribute region) to `f`. */
  private def forEachTag(html: String)(f: (String, String) => Unit): Unit = {
    val n = html.length
    var p = 0
    while (p < n) {
      val lt = html.indexOf('<', p)
      if (lt < 0) return
      p = lt
      if (html.startsWith("<!--", p)) {
        val e = html.indexOf("-->", p + 4)
        p = if (e < 0) n else e + 3
      } else if (p + 1 < n && (html.charAt(p + 1) == '!' ||
        html.charAt(p + 1) == '?')) {
        val e = html.indexOf('>', p + 1)
        p = if (e < 0) n else e + 1
      } else {
        var q = p + 1
        val closing = q < n && html.charAt(q) == '/'
        if (closing) q += 1
        val nameStart = q
        while (q < n && (html.charAt(q).isLetter ||
          html.charAt(q).isDigit)) q += 1
        if (q == nameStart) p += 1
        else {
          val name = html.substring(nameStart, q)
            .toLowerCase(java.util.Locale.ROOT)
          val attrStart = q
          var quote: Char = 0
          while (q < n && (quote != 0 || html.charAt(q) != '>')) {
            val ch = html.charAt(q)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            q += 1
          }
          val selfClosed = q > attrStart && q <= n &&
            html.charAt(q - 1) == '/' && quote == 0
          if (!closing) f(name, html.substring(attrStart, q))
          p = if (q < n) q + 1 else n
          if (!closing && !selfClosed && SkipContent.contains(name)) {
            val e = indexOfIgnoreCase(html, "</" + name, p)
            if (e < 0) p = n
            else {
              val g = html.indexOf('>', e)
              p = if (g < 0) n else g + 1
            }
          }
        }
      }
    }
  }

  /** First value of `key` in a raw attribute region (case-insensitive
    * names, quoted or bare values). */
  private def attrValue(attrs: String, key: String): Option[String] = {
    val n = attrs.length
    var p = 0
    while (p < n) {
      while (p < n && (attrs.charAt(p).isWhitespace ||
        attrs.charAt(p) == '/')) p += 1
      val ks = p
      while (p < n && !attrs.charAt(p).isWhitespace &&
        attrs.charAt(p) != '=' && attrs.charAt(p) != '/') p += 1
      if (p == ks) return None
      val name = attrs.substring(ks, p).toLowerCase(java.util.Locale.ROOT)
      while (p < n && attrs.charAt(p).isWhitespace) p += 1
      var value: String = null
      if (p < n && attrs.charAt(p) == '=') {
        p += 1
        while (p < n && attrs.charAt(p).isWhitespace) p += 1
        if (p < n && (attrs.charAt(p) == '"' || attrs.charAt(p) == '\'')) {
          val qch = attrs.charAt(p)
          val e = attrs.indexOf(qch, p + 1)
          value = attrs.substring(p + 1, if (e < 0) n else e)
          p = if (e < 0) n else e + 1
        } else {
          val vs = p
          while (p < n && !attrs.charAt(p).isWhitespace) p += 1
          value = attrs.substring(vs, p)
        }
      } else value = ""
      if (name == key) return Some(value)
    }
    None
  }

  /** Absolute http(s) `<a href>` targets in document order (relative
    * links dropped — host resolution needs a base URL the payload does
    * not carry; the WARC `target_uri` supplies the source host). */
  def extractLinks(html: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    forEachTag(html) { (name, attrs) =>
      if (name == "a") attrValue(attrs, "href").foreach { v =>
        val t = v.trim
        val lt = t.toLowerCase(java.util.Locale.ROOT)
        if (lt.startsWith("http://") || lt.startsWith("https://")) out += t
      }
    }
    out.result()
  }

  /** Raw `content` of the first `<meta name="robots">` tag, if any —
    * the crawl-compliance signal (noindex/nofollow) a responsible
    * training-data pipeline audits before keeping a page. */
  def metaRobots(html: String): Option[String] = {
    var res: Option[String] = None
    forEachTag(html) { (name, attrs) =>
      if (res.isEmpty && name == "meta" &&
        attrValue(attrs, "name").exists(
          _.trim.equalsIgnoreCase("robots")))
        res = attrValue(attrs, "content")
    }
    res
  }

  /** First `<title>` inner text, whitespace-collapsed; None when the
    * tag is absent or its content collapses to empty. */
  def extractTitle(html: String): Option[String] = {
    val open = indexOfIgnoreCase(html, "<title", 0)
    if (open < 0) return None
    val gt = html.indexOf('>', open)
    if (gt < 0) return None
    val close = indexOfIgnoreCase(html, "</title", gt + 1)
    val raw = html.substring(gt + 1, if (close < 0) html.length else close)
    val collapsed = raw.split("[ \t\n\r\f]+").filter(_.nonEmpty)
      .mkString(" ")
    if (collapsed.isEmpty) None else Some(collapsed)
  }

  private def indexOfIgnoreCase(s: String, needle: String,
                                from: Int): Int = {
    val nl = needle.length
    var i = math.max(from, 0)
    val limit = s.length - nl
    while (i <= limit) {
      var j = 0
      while (j < nl && Character.toLowerCase(s.charAt(i + j)) ==
        Character.toLowerCase(needle.charAt(j))) j += 1
      if (j == nl) return i
      i += 1
    }
    -1
  }

  /** Blocks → rules → `\n`-joined survivors (possibly empty). */
  def extractText(html: String): String = {
    val keep = parseBlocks(html).filter { b =>
      b.container.isEmpty &&
        b.nAnchor.toLong * MaxLinkDensityDen <=
          b.text.length.toLong * MaxLinkDensityNum &&
        b.text.length >= MinBlockChars
    }
    keep.map(_.text).mkString("\n")
  }

  // ---------------------------------------------------------------
  // robots.txt (RFC 9309): group selection, glob rules, longest-match
  // ---------------------------------------------------------------

  final case class RobotsRule(allow: Boolean, pattern: String)

  /** Parse a robots.txt into (user-agent tokens, rules) groups: lines
    * are `field: value` with `#` comments; consecutive `User-agent`
    * lines open a group; `Allow`/`Disallow` lines attach to the open
    * group; empty-valued rules are ignored (RFC 9309 §2.2.2); unknown
    * fields skip. */
  def robotsGroups(txt: String):
      Vector[(Vector[String], Vector[RobotsRule])] = {
    val out = Vector.newBuilder[(Vector[String], Vector[RobotsRule])]
    var uas = Vector.empty[String]
    var rules = Vector.empty[RobotsRule]
    var open = false     // inside a user-agent run (no rule seen yet)
    var any = false
    def flush(): Unit = {
      if (any) out += ((uas, rules))
      uas = Vector.empty; rules = Vector.empty; any = false
    }
    txt.split("\r\n|\n", -1).foreach { raw =>
      val line = { val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim }
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (!open) flush()
            uas :+= value.toLowerCase(java.util.Locale.ROOT)
            open = true; any = true
          case "allow" | "disallow" =>
            open = false
            if (value.nonEmpty) rules :+= RobotsRule(field == "allow", value)
          case _ => open = false
        }
      }
    }
    flush()
    out.result()
  }

  /** RFC 9309 path-pattern match: the pattern must match a PREFIX of
    * the path, `*` spans any octets, a trailing `$` anchors the end.
    * Leftmost placement of the inner literals is complete for glob
    * prefix matching; the `$` case checks the tail separately. */
  def robotsGlobMatch(pat: String, path: String): Boolean = {
    val endAnchor = pat.endsWith("$")
    val core = if (endAnchor) pat.substring(0, pat.length - 1) else pat
    val parts = core.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length - 1) {
      val at = path.indexOf(parts(i), pos)
      if (at < 0) return false
      pos = at + parts(i).length
      i += 1
    }
    if (parts.length == 1)
      !endAnchor || path.length == pos
    else {
      val last = parts(parts.length - 1)
      if (endAnchor) path.endsWith(last) && path.length - last.length >= pos
      else last.isEmpty || path.indexOf(last, pos) >= 0
    }
  }

  /** Allow/deny verdict for (`path`, `ua`): rules come from every
    * group naming `ua` (case-insensitive product token), else every
    * `*` group; the matching rule with the most pattern octets wins,
    * allow beating disallow on a tie (RFC 9309 §2.2.2); no matching
    * rule (or no groups, or no robots.txt) allows. Returns
    * (allowed, "allow:<pat>" | "disallow:<pat>" | "default"). */
  def robotsDecision(txt: String, path: String,
                     ua: String): (Boolean, String) = {
    val groups = robotsGroups(txt)
    val uaL = ua.toLowerCase(java.util.Locale.ROOT)
    val named = groups.filter(_._1.contains(uaL))
    val sel = if (named.nonEmpty) named else groups.filter(_._1.contains("*"))
    val rules = sel.flatMap(_._2)
    val hits = rules.filter(r => robotsGlobMatch(r.pattern, path))
    if (hits.isEmpty) (true, "default")
    else {
      val best = hits.maxBy(r => (r.pattern.length,
        if (r.allow) 1 else 0))
      (best.allow,
        (if (best.allow) "allow:" else "disallow:") + best.pattern)
    }
  }

  // ---------------------------------------------------------------
  // row assembly for the expressions
  // ---------------------------------------------------------------

  private def mediaType(ct: Option[String]): Option[String] =
    ct.map { v =>
      val semi = v.indexOf(';')
      (if (semi >= 0) v.substring(0, semi) else v)
        .trim.toLowerCase(java.util.Locale.ROOT)
    }

  private def headerCharset(ct: Option[String]): Option[String] =
    ct.flatMap { v =>
      val m = CharsetParamRe.pattern.matcher(v)
      if (m.find()) Some(m.group(1)) else None
    }

  private val CharsetParamRe =
    "(?i)charset\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^;\\s]+)".r

  private val HtmlTypes = Set("text/html", "application/xhtml+xml")

  /** Shared classification for [[HtmlText.HttpHtmlExpr]] /
    * [[HtmlText.HtmlExtractExpr]]: Left(status) for the terminal
    * non-text outcomes, Right((code, mediaType, text, charset,
    * source, isHtml)) when a decoded text body exists. */
  private def classify(payload: Array[Byte]):
      Either[(Option[Int], Option[String], String),
             (Int, String, String, String, String, Boolean)] =
    parseHttp(payload) match {
      case Left(_) => Left((None, None, "corrupt_http"))
      case Right(msg) =>
        val ct = msg.headers.get("content-type")
        val mt = mediaType(ct)
        if (msg.statusCode != 200)
          Left((Some(msg.statusCode), mt, "skip_status"))
        else mt match {
          case Some(t) if HtmlTypes.contains(t) =>
            val (text, cs, src) =
              decodeCharset(msg.body, headerCharset(ct), sniffMeta = true)
            Right((msg.statusCode, t, text, cs, src, true))
          case Some("text/plain") =>
            val (text, cs, src) =
              decodeCharset(msg.body, headerCharset(ct), sniffMeta = false)
            Right((msg.statusCode, "text/plain", text, cs, src, false))
          case _ => Left((Some(msg.statusCode), mt, "not_text"))
        }
    }

  def httpRow(payload: Array[Byte]): InternalRow = classify(payload) match {
    case Left((code, mt, status)) =>
      InternalRow(code.map(Int.box).orNull, mt.map(utf8).orNull, null,
        null, null, utf8(status))
    case Right((code, mt, text, cs, src, isHtml)) =>
      InternalRow(code, utf8(mt), utf8(cs), utf8(src), utf8(text),
        utf8(if (isHtml) "ok" else "ok_plain"))
  }

  def extractRow(payload: Array[Byte]): InternalRow =
    classify(payload) match {
      case Left((code, mt, status)) =>
        InternalRow(code.map(Int.box).orNull, mt.map(utf8).orNull, null,
          null, null, null, null, null, utf8(status))
      case Right((code, mt, text, cs, src, isHtml)) =>
        val extracted = if (isHtml) extractText(text) else text
        val status =
          if (extracted.isEmpty) "empty_text"
          else if (isHtml) "ok"
          else "ok_plain"
        val links =
          if (isHtml) extractLinks(text) else Vector.empty[String]
        val robots = if (isHtml) metaRobots(text) else None
        val title = if (isHtml) extractTitle(text) else None
        InternalRow(code, utf8(mt), utf8(cs), utf8(src),
          if (extracted.isEmpty) null else utf8(extracted),
          new GenericArrayData(links.map(utf8).toArray[Any]),
          robots.map(utf8).orNull, title.map(utf8).orNull, utf8(status))
    }
}
