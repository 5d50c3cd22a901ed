package graft

import graft.data.PostsXml

/** Posts.xml source: attribute scanner, entity codec, distributed read,
  * and the question↔answer attach (reference: dataprocess/parser.py:71-89).
  */
class PostsXmlSpec extends SparkSpec {
  import spark.implicits._

  test("parseRowAttrs: golden lines — entities, quote styles, skip rules") {
    // plain row, double quotes
    assert(PostsXml.parseRowAttrs("""<row Id="1" PostTypeId="1" />""")
      .contains(Map("Id" -> "1", "PostTypeId" -> "1")))
    // leading whitespace + single-quoted values + no self-close slash
    assert(PostsXml.parseRowAttrs("""   <row Id='7' Title='hi there'>""")
      .contains(Map("Id" -> "7", "Title" -> "hi there")))
    // the five predefined entities + decimal + hex refs
    val e = PostsXml.parseRowAttrs(
      """<row Id="2" Body="a &lt;b&gt; c &amp; d &quot;q&quot; &apos;s&apos; &#65;&#x41; &#xA;end" />""")
    assert(e.get("Body") == "a <b> c & d \"q\" 's' AA \nend")
    // unknown and unterminated references pass through literally
    val lenient = PostsXml.parseRowAttrs("""<row Id="3" Body="&foo; &amp x" />""")
    assert(lenient.get("Body") == "&foo; &amp x")
    // supplementary-plane refs decode to the full code point (surrogate
    // pair), not a truncated 16-bit char; out-of-range refs pass through
    val supp = PostsXml.parseRowAttrs(
      """<row Id="4" Body="&#128169; &#x1F4A9; &#1114112; &#x110000;" />""")
    assert(supp.get("Body") ==
      "💩 💩 &#1114112; &#x110000;")
    // non-row lines are skipped, not errors
    assert(PostsXml.parseRowAttrs("""<?xml version="1.0" encoding="utf-8"?>""").isEmpty)
    assert(PostsXml.parseRowAttrs("<posts>").isEmpty)
    assert(PostsXml.parseRowAttrs("</posts>").isEmpty)
    assert(PostsXml.parseRowAttrs("").isEmpty)
    assert(PostsXml.parseRowAttrs("""<rows Id="9" />""").isEmpty)
    // malformed: unterminated quote / missing '='
    assert(PostsXml.parseRowAttrs("""<row Id="1" Title="oops />""").isEmpty)
    assert(PostsXml.parseRowAttrs("""<row Id />""").isEmpty)
  }

  test("escapeXml ∘ decodeXml = identity on seeded adversarial strings") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "ab<>&\"'\n\r\t é日;#x0 ".toCharArray
    for (_ <- 0 until 500) {
      val s = String.valueOf(Array.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))))
      val rt = PostsXml.decodeXml(PostsXml.escapeXml(s))
      assert(rt == s, s"round-trip broke on ${s.getBytes("UTF-8").toSeq}")
    }
    // and parsing a rendered attribute carrying those strings survives
    val nasty = "a<b&c \"quoted\" 'single'\nline2\t&#end"
    val line = s"""<row Id="5" Body="${PostsXml.escapeXml(nasty)}" />"""
    assert(PostsXml.parseRowAttrs(line).get("Body") == nasty)
  }

  test("read + questions: ParentId attach, ordered answers, cleanString, " +
    "and answerless questions over a written dump") {
    val xml = Seq(
      """<?xml version="1.0" encoding="utf-8"?>""",
      "<posts>",
      // question 10 with two answers (21 before 12 in file order — output
      // must re-order by id), title carries HTML + punctuation to clean
      """  <row Id="10" PostTypeId="1" Title="Hello &lt;b&gt;World&lt;/b&gt;!" Body="How do I sort a List?" />""",
      """  <row Id="21" PostTypeId="2" ParentId="10" Body="Use sorted()." />""",
      """  <row Id="12" PostTypeId="2" ParentId="10" Body="Try Collections.sort" />""",
      // answerless question, no Title attribute
      """  <row Id="30" PostTypeId="1" Body="Unanswered question" />""",
      // orphan answer (parent not a question in this dump) must not crash
      """  <row Id="40" PostTypeId="2" ParentId="999" Body="orphan" />""",
      "</posts>").mkString("\n")
    val dir = tmpDir("postsxml")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "Posts.xml"),
      xml.getBytes("UTF-8"))

    val posts = PostsXml.read(spark, dir)
    assert(posts.count() == 5)
    val p10 = posts.filter(_.id == 10L).head()
    assert(p10.title == "Hello <b>World</b>!" && p10.parent_id.isEmpty)
    val p12 = posts.filter(_.id == 12L).head()
    assert(p12.parent_id.contains(10L) && p12.post_type_id == 2L)

    val qs = PostsXml.questions(posts)
      .select($"id", $"title", $"body", $"n_answers", $"answers")
      .as[(Long, String, String, Long, Seq[String])].collect()
      .sortBy(_._1)
    assert(qs.map(_._1).toSeq == Seq(10L, 30L))
    val q10 = qs(0)
    assert(q10._2 == "hello world", s"title not cleaned: '${q10._2}'")
    assert(q10._3 == "how do i sort a list")
    assert(q10._4 == 2L)
    // answers in id order (12 then 21), each cleaned
    assert(q10._5 == Seq("try collectionssort", "use sorted"))
    val q30 = qs(1)
    assert(q30._2 == null && q30._4 == 0L && q30._5 == null)
  }

  test("render ∘ read = identity on a generated mixed dump (distributed)") {
    val rnd = new scala.util.Random(42L)
    val vocab = Array("alpha", "beta", "x<y", "a&b", "\"quoted\"", "line\nbreak",
      "tab\there", "naïve", "日本", "plain")
    val rows = (0 until 300).map { i =>
      val isQ = i % 3 == 0
      (i.toLong, if (isQ) 1L else 2L,
        if (isQ) None else Some((i / 3 * 3).toLong),
        Some(rnd.nextInt(100).toLong),
        if (isQ) Array.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.length))).mkString(" ") else null,
        Array.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = rows.toDF("id", "post_type_id", "parent_id", "score", "title", "body")
    val dir = tmpDir("postsxml_rt")
    PostsXml.render(df).write.mode("overwrite").text(dir)
    val back = PostsXml.read(spark, dir).collect()
      .map(p => (p.id, p.post_type_id, p.parent_id, p.score, p.title, p.body))
      .sortBy(_._1)
    assert(back.length == rows.length)
    assert(back.toSeq == rows.sortBy(_._1),
      "render ∘ read failed to reproduce the posts")
  }
}
