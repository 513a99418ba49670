package graft

import org.apache.spark.sql.functions._
import graft.sources.{HtmlKernels, HtmlText}

/** The HTML→text front door: HTTP parse (incl. chunked), charset
  * determination with UTF-8 validation fallback, tag strip + block
  * segmentation + boilerplate rules, and the fused expression's
  * status contract over a DataFrame. */
class HtmlTextSpec extends SparkTestBase {
  private val crlf = "\r\n"

  private def msg(status: String, headers: Seq[String],
                  body: Array[Byte]): Array[Byte] =
    (status + crlf + headers.mkString(crlf) +
      (if (headers.nonEmpty) crlf else "") + crlf)
      .getBytes("ISO-8859-1") ++ body

  test("parseHttp: status line, case-insensitive first-wins headers, " +
    "exact body; corrupt forms are Left") {
    val b = msg("HTTP/1.1 200 OK",
      Seq("Content-Type: text/html; charset=utf-8",
        "X-Dup: first", "x-dup: second"),
      "hello".getBytes("UTF-8"))
    val Right(m) = HtmlKernels.parseHttp(b)
    assert(m.statusCode == 200)
    assert(m.headers("content-type") == "text/html; charset=utf-8")
    assert(m.headers("x-dup") == "first", "first occurrence wins")
    assert(new String(m.body, "UTF-8") == "hello")
    // bare-LF line endings tolerated
    val lf = "HTTP/1.0 404 Not Found\nServer: x\n\nbody"
      .getBytes("ISO-8859-1")
    val Right(m2) = HtmlKernels.parseHttp(lf)
    assert(m2.statusCode == 404 &&
      new String(m2.body, "UTF-8") == "body")
    // headers ending exactly at EOF (no body) are legal
    val noBody = ("HTTP/1.1 204 No Content" + crlf + "Server: x" + crlf)
      .getBytes("ISO-8859-1")
    val Right(m3) = HtmlKernels.parseHttp(noBody)
    assert(m3.statusCode == 204 && m3.body.isEmpty)
    // corrupt: no status line / no terminator
    assert(HtmlKernels.parseHttp("not http at all\n".getBytes).isLeft)
    assert(HtmlKernels.parseHttp(
      ("HTTP/1.1 200 OK" + crlf + "A: b").getBytes).isLeft)
    assert(HtmlKernels.parseHttp(Array.fill[Byte](9000)('x')).isLeft,
      "a statusless 9000-byte blob must not scan forever")
  }

  test("dechunk: sizes in hex, extensions ignored, trailers dropped, " +
    "malformed framing is Left") {
    def run(s: String) = HtmlKernels.dechunk(s.getBytes("ISO-8859-1"))
    assert(run("5\r\nhello\r\n6;ext=1\r\n world\r\n0\r\n\r\n")
      .map(new String(_, "UTF-8")) == Right("hello world"))
    // trailers after the 0-chunk are dropped
    assert(run("1\r\nx\r\n0\r\nTrailer: v\r\n\r\n")
      .map(new String(_, "UTF-8")) == Right("x"))
    assert(run("zz\r\nhello\r\n").isLeft, "non-hex size")
    assert(run("A\r\nshort\r\n").isLeft, "chunk data past EOF")
    assert(run("5\r\nhelloX\r\n0\r\n\r\n").isLeft, "missing chunk CRLF")
    // the whole-message path de-chunks when Transfer-Encoding says so
    val b = msg("HTTP/1.1 200 OK",
      Seq("Transfer-Encoding: chunked", "Content-Type: text/plain"),
      "3\r\nabc\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
    val Right(m) = HtmlKernels.parseHttp(b)
    assert(new String(m.body, "UTF-8") == "abc")
  }

  test("validUtf8 rejects overlongs, surrogates, out-of-range and " +
    "truncated sequences; accepts real multi-byte text") {
    import HtmlKernels.validUtf8
    assert(validUtf8("plain ascii".getBytes("UTF-8")))
    assert(validUtf8("café — ☃ 𝄞".getBytes("UTF-8")))
    assert(!validUtf8(Array(0xc0.toByte, 0xaf.toByte)), "overlong /")
    assert(!validUtf8(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte)),
      "surrogate half")
    assert(!validUtf8(Array(0xf5.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte)), "past U+10FFFF")
    assert(!validUtf8(Array(0xc3.toByte)), "truncated tail")
    assert(!validUtf8(Array(0x97.toByte)), "bare windows-1252 byte")
  }

  test("decodeCharset: header beats meta, meta beats sniffless, " +
    "declared utf-8 is validated with windows-1252 fallback") {
    import HtmlKernels.decodeCharset
    val utf8Bytes = "café".getBytes("UTF-8")
    // declared latin-1 decodes UTF-8 bytes as mojibake — deliberately
    assert(decodeCharset(utf8Bytes, Some("ISO-8859-1"), sniffMeta = true)
      == (("cafÃ©", "iso-8859-1", "header")))
    // declared utf-8, valid bytes
    assert(decodeCharset(utf8Bytes, Some("utf-8"), sniffMeta = false)
      == (("café", "utf-8", "header")))
    // declared utf-8 but INVALID bytes → windows-1252 fallback
    val w = "dash  end".getBytes("ISO-8859-1") // 0x97 raw byte
    assert(decodeCharset(w, Some("utf-8"), sniffMeta = false)
      == (("dash — end", "windows-1252", "fallback")))
    // meta sniff inside the first 1024 bytes
    val metaDoc = ("<html><head><meta charset=\"windows-1252\"></head>"
      + "<body>x</body></html>").getBytes("UTF-8")
    assert(decodeCharset(metaDoc, None, sniffMeta = true)._3 == "meta")
    // undeclared: valid utf-8 wins, else fallback
    assert(decodeCharset(utf8Bytes, None, sniffMeta = false)
      == (("café", "utf-8", "utf8")))
    assert(decodeCharset(Array(0x97.toByte), None, sniffMeta = false)
      == (("—", "windows-1252", "fallback")))
    // unrecognized declared name → validated fallback chain
    assert(decodeCharset(utf8Bytes, Some("x-klingon"), sniffMeta = false)
      == (("café", "utf-8", "fallback")))
  }

  test("parseBlocks/extractText: containers, link density, short " +
    "blocks, skip-content tags, entities, comments") {
    val html =
      """<html><head><title>Drop Me</title>
        |<script>var x = "<p>not text</p>";</script>
        |<style>p { color: red }</style></head>
        |<body>
        |<nav><a href="/">Home</a> <a href="/a">About</a> site links</nav>
        |<p>This paragraph easily clears the length bar &amp; stays.</p>
        |<p>short one</p>
        |<div>A linky block where <a href="x">most of the characters sit
        |inside anchors so it is boilerplate</a> yes</div>
        |<p>Entit&#x79; decoding&#33; &lt;tag&gt; &amp; &nbsp;done here ok.</p>
        |<!-- a comment <p>ignored</p> -->
        |<footer>Copyright 2024 Example Site All Rights Reserved</footer>
        |</body></html>""".stripMargin
    val blocks = HtmlKernels.parseBlocks(html)
    val navB = blocks.find(_.container == "nav")
    assert(navB.isDefined && navB.get.text == "Home About site links")
    assert(navB.get.nAnchor == "Home About".length,
      "anchor chars count the inter-anchor space inside <a> runs only")
    val footB = blocks.find(_.container == "footer")
    assert(footB.isDefined)
    val keptText = HtmlKernels.extractText(html)
    val lines = keptText.split("\n").toSeq
    assert(lines == Seq(
      "This paragraph easily clears the length bar & stays.",
      "Entity decoding! <tag> & done here ok."),
      s"got: $lines")
    // link-density: the div is dropped even though it is long
    val div = blocks.find(_.tag == "div").get
    assert(div.nAnchor.toLong * 3 > div.text.length.toLong,
      "fixture div must exceed the 1/3 link-density ceiling")
    // an all-boilerplate page extracts to the empty string
    assert(HtmlKernels.extractText(
      "<nav>only links here</nav><p>tiny</p>") == "")
    // literal '<' that is not a tag survives
    assert(HtmlKernels.extractText(
      "<p>compare: a < b holds for small a, certainly.</p>")
      .contains("a < b"))
  }

  test("the fused html_extract expression lands every payload in " +
    "exactly one status; extractFromWarc is map-only") {
    val okHtml = msg("HTTP/1.1 200 OK",
      Seq("Content-Type: text/html; charset=utf-8"),
      ("<html><body><nav>menu menu menu</nav>" +
        "<p>The surviving paragraph of this little page, long enough." +
        "</p></body></html>").getBytes("UTF-8"))
    val okPlain = msg("HTTP/1.1 200 OK",
      Seq("Content-Type: text/plain"),
      "plain text body survives verbatim\nsecond line".getBytes("UTF-8"))
    val redirect = msg("HTTP/1.1 301 Moved",
      Seq("Content-Type: text/html", "Location: /x"),
      "<p>moved moved moved moved moved</p>".getBytes("UTF-8"))
    val img = msg("HTTP/1.1 200 OK",
      Seq("Content-Type: image/png"), Array[Byte](1, 2, 3))
    val empty = msg("HTTP/1.1 200 OK",
      Seq("Content-Type: text/html"),
      "<nav>boilerplate only</nav>".getBytes("UTF-8"))
    val corrupt = "ZZZ no status line here\n".getBytes("UTF-8")

    val rows = Seq(("ok_html", okHtml), ("ok_plain", okPlain),
      ("redirect", redirect), ("img", img), ("empty", empty),
      ("corrupt", corrupt))
    val df = spark.createDataFrame(rows).toDF("k", "payload")
      .select(col("k"), HtmlText.html_extract(col("payload")).as("e"))
      .select(col("k"), col("e.status_code"), col("e.content_type"),
        col("e.charset"), col("e.charset_source"), col("e.text"),
        col("e._status"))
    val got = df.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), Option(r.get(2)).map(_.toString),
        Option(r.get(5)).map(_.toString), r.getString(6))).toMap
    assert(got("ok_html")._4 == "ok" &&
      got("ok_html")._3.get.startsWith("The surviving paragraph"))
    assert(got("ok_plain") == ((Some(200), Some("text/plain"),
      Some("plain text body survives verbatim\nsecond line"), "ok_plain")))
    assert(got("redirect") == ((Some(301), Some("text/html"), None,
      "skip_status")))
    assert(got("img") == ((Some(200), Some("image/png"), None,
      "not_text")))
    assert(got("empty")._4 == "empty_text" && got("empty")._3.isEmpty)
    assert(got("corrupt") == ((None, None, None, "corrupt_http")))

    // the composed front door over a WARC frame stays exchange-free
    val rec = ("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
      "WARC-Record-ID: <urn:uuid:1>" + crlf +
      "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
      s"Content-Length: ${okHtml.length}" + crlf + crlf)
      .getBytes("ISO-8859-1") ++ okHtml ++ (crlf + crlf).getBytes
    val dir = java.nio.file.Files.createTempDirectory("graft-html-warc")
    java.nio.file.Files.write(dir.resolve("a.warc"), rec)
    val ext = HtmlText.extractFromWarc(
      graft.sources.Warc.warcWithErrors(spark, dir.toString))
    val plan = ext.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"WARC→HTML extraction must stay map-only:\n$plan")
    val out = ext.collect()
    assert(out.length == 1 &&
      out.head.getAs[String]("_status") == "ok" &&
      out.head.getAs[String]("text")
        .startsWith("The surviving paragraph"))
    // valid() keeps exactly the ok/ok_plain rows and drops _status
    assert(HtmlText.valid(ext).columns.toSeq ==
      Seq("path", "rec_offset", "record_id", "target_uri",
        "status_code", "content_type", "charset", "charset_source",
        "text", "links", "robots", "title"))
  }

  test("robots.txt: RFC 9309 groups, glob matching, longest-match " +
    "with allow winning ties, named agent shadowing *") {
    import HtmlKernels.{robotsDecision, robotsGlobMatch}
    // glob semantics: prefix match, * spans octets, $ anchors end
    assert(robotsGlobMatch("/doc/", "/doc/12"))
    assert(!robotsGlobMatch("/doc/", "/d"))
    assert(robotsGlobMatch("/doc/*1", "/doc/41"))
    assert(robotsGlobMatch("/doc/*1", "/doc/217")) // prefix: ...21 then 7
    assert(!robotsGlobMatch("/doc/*1", "/doc/40"))
    assert(robotsGlobMatch("/doc/3$", "/doc/3"))
    assert(!robotsGlobMatch("/doc/3$", "/doc/31"))
    assert(robotsGlobMatch("/a*b*c$", "/axxbyyc"))
    assert(!robotsGlobMatch("/a*b*c$", "/axxbyycz"))
    // groups: crlf lines, comments, case-insensitive fields; a rule
    // line closes the user-agent run so the NEXT UA opens a new group
    val txt = "# policy\r\nUser-Agent: GraftBot\r\nDisallow: /\r\n\r\n" +
      "User-agent: *\r\nDisallow:\r\nAllow: /open\r\nDisallow: /open\r\n"
    assert(robotsDecision(txt, "/anything", "graftbot")
      == ((false, "disallow:/")), "named group shadows *")
    assert(robotsDecision(txt, "/open/x", "otherbot")
      == ((true, "allow:/open")), "equal-length tie: allow wins")
    assert(robotsDecision(txt, "/elsewhere", "otherbot")
      == ((true, "default")), "empty Disallow is ignored")
    // longest match beats shorter regardless of order
    val t2 = "User-agent: *\nAllow: /doc/22\nDisallow: /doc/\n"
    assert(robotsDecision(t2, "/doc/221", "any") == ((true, "allow:/doc/22")))
    assert(robotsDecision(t2, "/doc/9", "any") == ((false, "disallow:/doc/")))
    // multiple UA lines share one group
    val t3 = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(robotsDecision(t3, "/x/1", "b") == ((false, "disallow:/x")))
    assert(robotsDecision(t3, "/x/1", "c") == ((true, "default")),
      "no * group and no name match: default allow")
  }

  test("outlink + meta-robots scanners: absolute hrefs in order, " +
    "quotes and bare values, script bodies skipped, first robots wins") {
    val html =
      """<html><head>
        |<meta charset="utf-8"><META NAME='Robots' content="noindex, follow">
        |<meta name="robots" content="second ignored">
        |<script>var a = '<a href="http://evil.example/x">';</script>
        |</head><body>
        |<a href="http://one.example.com/a">1</a>
        |<a class="x" href = 'https://TWO.example.com/b?q=1'>2</a>
        |<a href=/relative/path>rel</a>
        |<a href=http://bare.example.com/c>bare</a>
        |<a name="anchor-no-href">none</a>
        |</body></html>""".stripMargin
    assert(HtmlKernels.extractLinks(html) == Vector(
      "http://one.example.com/a", "https://TWO.example.com/b?q=1",
      "http://bare.example.com/c"))
    assert(HtmlKernels.metaRobots(html).contains("noindex, follow"))
    assert(HtmlKernels.metaRobots("<p>no meta here at all</p>").isEmpty)
    assert(HtmlKernels.extractTitle(
      "<html><head><TITLE>\n  A   Spaced\tTitle </TITLE></head></html>")
      .contains("A Spaced Title"))
    assert(HtmlKernels.extractTitle("<p>untitled</p>").isEmpty)
    assert(HtmlKernels.extractTitle("<title>  </title>").isEmpty)
    // the fused expression carries both through the struct
    val payload = msg("HTTP/1.1 200 OK",
      Seq("Content-Type: text/html"), html.getBytes("UTF-8"))
    val r = spark.createDataFrame(Seq(("k", payload))).toDF("k", "payload")
      .select(HtmlText.html_extract(col("payload")).as("e"))
      .select(col("e.links"), col("e.robots"), col("e._status"))
      .head()
    assert(r.getSeq[String](0) == Seq("http://one.example.com/a",
      "https://TWO.example.com/b?q=1", "http://bare.example.com/c"))
    assert(r.getString(1) == "noindex, follow")
    // plain text: empty links, NULL robots; corrupt: NULL links
    val plain = msg("HTTP/1.1 200 OK", Seq("Content-Type: text/plain"),
      "no markup".getBytes("UTF-8"))
    val rows = spark.createDataFrame(Seq(("p", plain),
        ("c", "garbage\n".getBytes("UTF-8")))).toDF("k", "payload")
      .select(col("k"), HtmlText.html_extract(col("payload")).as("e"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    assert(rows("p").getSeq[String](5) == Seq() &&
      rows("p").isNullAt(6))
    assert(rows("c").isNullAt(5) && rows("c").isNullAt(6))
  }
}
