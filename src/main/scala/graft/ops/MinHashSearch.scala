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

  /** Top-k per query: LSH-band candidates re-ranked by exact Jaccard.
    * Output: (query_id, rank, doc_id, jaccard). */
  def search(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
             nSeeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    val md5s = (c: org.apache.spark.sql.Column) => md5(c.cast("binary"))

    val qt = queryTermsDF(spark, queries)
    // query signatures + bands (same construction as Dedup.minhash/lshBands)
    val qsig = qt.crossJoin(broadcast(spark.range(nSeeds).toDF("seed")))
      .groupBy(col("query_id"), col("seed"))
      .agg(min(substring(md5s(
        concat(col("seed").cast("string"), lit(":"), col("term"))), 1, 16))
        .as("minhash"))
    val qbands = qsig
      .withColumn("band", (col("seed") / rowsPerBand).cast("long"))
      .groupBy(col("query_id"), col("band"))
      .agg(md5s(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          x => x.getField("minhash")), ",")).as("band_hash"))

    val dbands = Dedup.lshBands(docs, nSeeds, rowsPerBand)
    val cand = dbands
      .join(broadcast(qbands), Seq("band", "band_hash"))
      .select(col("query_id"), col("doc_id")).distinct()

    // exact Jaccard re-rank over distinct token sets
    val dtok = TextOps.tokens(docs).select(col("doc_id"), col("term")).distinct()
    val dsize = dtok.groupBy(col("doc_id")).agg(count(lit(1)).as("dn"))
    val qsize = qt.groupBy(col("query_id")).agg(count(lit(1)).as("qn"))
    val inter = cand
      .join(dtok, "doc_id")
      .join(broadcast(qt), Seq("query_id", "term"))
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("i"))
    val jac = cand
      .join(inter, Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("i"))
      .join(dsize, "doc_id").join(broadcast(qsize), "query_id")
      .withColumn("jaccard",
        round(col("i") * lit(1.0) / (col("qn") + col("dn") - col("i")), 6))
    jac
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("jaccard").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("jaccard"))
  }
}
