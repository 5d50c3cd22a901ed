package graft

/** The driver's smoke contract: SparkEntry.entry returns rows (> 0) — an
  * end-to-end build + WAND query over the synthetic pages corpus, resumable
  * across invocations (second call hits the committed index). */
class EntrySpec extends SparkSpec {

  test("entry builds, queries, and returns rows; re-entry reuses the index") {
    val first = SparkEntry.entry(spark)
    assert(first.count() > 0)
    // second invocation must be a no-op build (resume) with identical rows
    val again = SparkEntry.entry(spark)
    assert(first.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }
}
