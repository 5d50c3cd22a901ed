package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own search modality, re-expressed relationally
  * (reference: index/index_new.py:65-72): query → MinHash signature → LSH
  * band probe → candidate union → EXACT token-Jaccard re-rank → top-k.
  *
  * Signatures/bands reuse the Dedup primitives (same md5-hex minima), so
  * query bands are directly joinable against document bands, and the whole
  * path has an exact DuckDB oracle twin (SparkEntry.q_minhash_search).
  *
  * Scale shape: the probe is an equi-join on (band, band_hash) — the LSH
  * bucket lookup — followed by a candidate-only Jaccard join; the corpus is
  * never scanned per query.
  */
object MinHashSearch {

  /** Simple query tokenizer for the documents table's pre-clean text:
    * lowercase + whitespace split + distinct (set semantics, like the
    * reference's MinHash update). */
  def queryTokens(q: String): Seq[String] =
    q.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq

  /** (query_id, term) relation for a fixed query set. */
  def queryTermsDF(spark: SparkSession, queries: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    queries.flatMap { case (id, q) =>
      queryTokens(q).map(t => (id.toLong, t))
    }.toDF("query_id", "term")
  }

  private val md5s = (c: org.apache.spark.sql.Column) => md5(c.cast("binary"))

  /** Query MinHash signatures (query_id, seed, minhash) — same construction
    * as Dedup.minhash, so they join directly against document signatures. */
  private def querySignatures(qt: DataFrame, nSeeds: Int): DataFrame =
    qt.crossJoin(broadcast(qt.sparkSession.range(nSeeds).toDF("seed")))
      .groupBy(col("query_id"), col("seed"))
      .agg(min(substring(md5s(
        concat(col("seed").cast("string"), lit(":"), col("term"))), 1, 16))
        .as("minhash"))

  /** Exact token-Jaccard of each (query_id, doc_id) candidate pair, with
    * candidates' extra columns carried through. The corpus side is joined
    * only on candidate doc ids — never scanned per query. */
  private def withJaccard(docs: DataFrame, qt: DataFrame,
                          cand: DataFrame): DataFrame = {
    val dtok = TextOps.tokens(docs).select(col("doc_id"), col("term")).distinct()
    val dsize = dtok.groupBy(col("doc_id")).agg(count(lit(1)).as("dn"))
    val qsize = qt.groupBy(col("query_id")).agg(count(lit(1)).as("qn"))
    val inter = cand.select(col("query_id"), col("doc_id"))
      .join(dtok, "doc_id")
      .join(broadcast(qt), Seq("query_id", "term"))
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("i"))
    cand
      .join(inter, Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("i"))
      .join(dsize, "doc_id").join(broadcast(qsize), "query_id")
      .withColumn("jaccard",
        round(col("i") * lit(1.0) / (col("qn") + col("dn") - col("i")), 6))
  }

  /** Top-k per query: LSH-band candidates re-ranked by exact Jaccard
    * (reference: index/index_new.py:65-72, fixed-band LSH).
    * Output: (query_id, rank, doc_id, jaccard). */
  def search(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
             nSeeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    val qt = queryTermsDF(spark, queries)
    val qbands = querySignatures(qt, nSeeds)
      .withColumn("band", (col("seed") / rowsPerBand).cast("long"))
      .groupBy(col("query_id"), col("band"))
      .agg(md5s(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          x => x.getField("minhash")), ",")).as("band_hash"))

    val cand = Dedup.lshBands(docs, nSeeds, rowsPerBand)
      .join(broadcast(qbands), Seq("band", "band_hash"))
      .select(col("query_id"), col("doc_id")).distinct()

    withJaccard(docs, qt, cand)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("jaccard").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("jaccard"))
  }

  /** Signature PREFIX hashes for every depth r = 1..nSeeds: ph(r) =
    * md5(minhash_0, …, minhash_{r−1}) — the relational form of a prefix
    * tree: matching at depth r implies matching at every depth < r. */
  private def prefixes(sig: DataFrame, idCol: String, nSeeds: Int): DataFrame =
    sig.crossJoin(broadcast(sig.sparkSession.range(1, nSeeds + 1).toDF("r")))
      .filter(col("seed") < col("r"))
      .groupBy(col(idCol), col("r"))
      .agg(md5s(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          x => x.getField("minhash")), ",")).as("ph"))

  /** LSH FOREST top-k (reference: index/index.py:55-62 —
    * MinHashLSHForest.query): candidates are matched by their LONGEST shared
    * signature prefix with the query (prefix trees in the reference;
    * here one prefix-hash relation per depth, equi-joined, max depth per
    * pair), then ranked by (depth desc, exact Jaccard desc, doc_id asc).
    * Unlike fixed bands, shorter prefixes keep recall when no deep prefix
    * matches — the forest's different recall profile.
    * Output: (query_id, rank, doc_id, depth, jaccard). */
  def forestTopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
                 nSeeds: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val qt = queryTermsDF(spark, queries)
    val qpre = prefixes(querySignatures(qt, nSeeds), "query_id", nSeeds)
    val dpre = prefixes(Dedup.minhash(docs, nSeeds), "doc_id", nSeeds)
    val cand = dpre.join(broadcast(qpre), Seq("r", "ph"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("r")).as("depth"))
    withJaccard(docs, qt, cand)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("depth").desc, col("jaccard").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("depth"),
        col("jaccard"))
  }
}
