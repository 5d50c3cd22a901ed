package graft.data

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.TextExtract

/** One Common-Crawl-style web page row (BASELINE.json input_hint schema). */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                text: String, lang: String)

/** Deterministic, seed-parameterized synthetic `pages` corpus
  * (FIXTURES.md §1). Fully distributed: every row is a pure function of
  * (seed, rowId), generated via `spark.range(n).mapPartitions` — no driver
  * loop, no wall clock, no external data; the same (seed, n) always yields
  * byte-identical rows on any partitioning, so the generator itself scales
  * to arbitrary n.
  *
  * Per-row invariant (the north rule's extraction contract):
  * `text == TextExtract.stripHtml(new String(html, UTF_8))` by construction.
  *
  * Term distribution: Zipf-ish (pmf ∝ 1/rank) over a 20k-word vocabulary,
  * doc lengths log-spaced 8..~400 tokens, one designated hot term
  * (`"the0"`) in ~30% of docs at position 0 (drives the skew/salting test).
  * The first rows embed the reference query titles (FIXTURES.md §4) so the
  * rank-identity fixtures have known in-corpus targets.
  */
object Synth {

  final val VocabSize = 20000
  final val Epoch = 1704067200000L // 2024-01-01T00:00:00Z

  /** Reference query set titles planted at doc seq 0..9
    * (reference: tests/test_index_query.py:31-33, tests/test_search.py:29-37,
    * main.py:184-194). */
  val refTitles: Array[String] = Array(
    "Determine a user's timezone",
    "Converting ARBG to RGB alpha blending",
    "Regex: To pull out a sub-string between two tags in a string",
    "ASP.Net Custom Client-Side Validation",
    "What are the preferred versions of Vim and Emacs on Mac OS X",
    "Normalizing a Table with Low Integrity",
    "What is the best way to store connection string in .NET DLLs?",
    "i have a pen i have an apple",
    "numpy python matrix",
    "maple story good game"
  )

  private val langs = Array("en", "en", "en", "en", "en", "en", "es", "de", "fr", "zh")

  // --- splitmix64: the standard public-domain 64-bit mixer -------------
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def u01(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  /** Zipf-ish rank draw: P(rank ≤ r) ≈ ln(r)/ln(V)  ⇒ pmf ∝ 1/rank. */
  private def zipfRank(u: Double): Int = {
    val r = math.pow(VocabSize.toDouble, u).toInt
    math.min(math.max(r, 1), VocabSize)
  }

  def word(rank: Int): String = "w" + rank

  /** Pure row generator — the whole corpus is this function mapped over
    * 0..n-1. */
  def genRow(seed: Long, i: Long): Page = {
    val h0 = mix64(seed ^ mix64(i))
    val urlHost = (mix64(h0 ^ 0x55AA) & 0x7fffffffffffffffL) % 1000
    val url = s"https://site$urlHost.example/p/$i"
    val ts = new Timestamp(Epoch + i * 137000L)
    val lang = langs(((mix64(h0 ^ 0xC0FFEE) & 0x7fffffffffffffffL) % langs.length).toInt)

    val isRef = i < refTitles.length
    val title =
      if (isRef) refTitles(i.toInt)
      else {
        val nt = 3 + ((mix64(h0 ^ 1) & 0x7L)).toInt // 3..10 title words
        (0 until nt).map(j => word(zipfRank(u01(mix64(h0 ^ (100L + j)))))).mkString(" ")
      }

    // body: log-spaced length 8..~400 tokens
    val lenU = u01(mix64(h0 ^ 2))
    val bodyLen = (8 * math.exp(lenU * math.log(50.0))).toInt
    val hot = (mix64(h0 ^ 3) & 0x7fffffffffffffffL) % 10 < 3
    val sb = new StringBuilder
    if (hot) sb.append("the0 ")
    var j = 0
    while (j < bodyLen) {
      sb.append(word(zipfRank(u01(mix64(h0 ^ (1000L + j)))))).append(' ')
      j += 1
    }
    val body = sb.toString.trim

    // html with entities + nested tags on a seeded schedule so the
    // extractor is genuinely exercised (FIXTURES.md §1)
    val deco = (mix64(h0 ^ 4) & 0x7fffffffffffffffL) % 7
    val bodyHtml = deco match {
      case 0 => s"<p>$body &amp; more</p>"
      case 1 => s"<p>${body.take(20)}<b>${body.drop(20)}</b></p><!-- c -->"
      case 2 => s"<div class=\"x\"><p>$body</p><span>&lt;tag&gt;</span></div>"
      case 3 => s"<p>$body &#65;&#x42;</p>"
      case 4 => s"<p>$body</p><script>var x=1;</script>"
      case _ => s"<p>$body</p>"
    }
    // newlines between structural tags: adjacent text nodes must not fuse
    // ("matrix" + "the0" → "matrixthe0") — whitespace text nodes survive
    // extraction and the tokenizer splits on them
    val html = s"<html><head><title>$title</title>\n</head><body>\n$bodyHtml\n</body></html>"
    val text = TextExtract.stripHtml(html)
    Page(url, ts, html.getBytes(StandardCharsets.UTF_8), text, lang)
  }

  /** Distributed corpus of n pages. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.mapPartitions(_.map(i => genRow(seed, i)))
  }
}
