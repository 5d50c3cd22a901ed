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
  * never scanned per query. The QUERY side (a handful of rows) is computed
  * DRIVER-SIDE with the same md5 arithmetic — zero Spark jobs — and enters
  * the plan as broadcast local relations; the document side runs the typed
  * zero-shuffle signature passes (Dedup.lshBandsFast /
  * minhashPrefixesFastMd5). Both sides are parity-covered: the driver-side
  * signature math is asserted equal to the relational form in
  * SearchOpsSpec, and the typed doc passes have their own Column-form
  * parity tests.
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

  // ---- driver-side query signature math (md5 mode, the oracle shape) ----

  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF8)).map(b => f"$b%02x").mkString

  /** Per-query minhash hex minima in seed order — the driver-side twin of
    * `querySignatures` (min over tokens of substr(md5("$sd:$term"), 1, 16));
    * a pure function of the query set, so it costs zero Spark jobs.
    * Queries with no tokens have no signature (matching the relational
    * form, whose groupBy has no rows for them). */
  private[graft] def querySigLocal(queries: Seq[(Int, String)],
                                   nSeeds: Int): Seq[(Long, Array[String])] =
    queries.flatMap { case (id, q) =>
      val toks = queryTokens(q)
      if (toks.isEmpty) None
      else Some(id.toLong -> Array.tabulate(nSeeds) { sd =>
        toks.map(t => md5Hex(s"$sd:$t").substring(0, 16)).min
      })
    }

  /** Driver-side band rows (query_id, band, band_hash) — the twin of
    * banding [[querySigLocal]] signatures exactly like Dedup.lshBands. */
  private[graft] def queryBandsLocal(queries: Seq[(Int, String)], nSeeds: Int,
                                     rowsPerBand: Int): Seq[(Long, Long, String)] =
    querySigLocal(queries, nSeeds).flatMap { case (id, hexes) =>
      hexes.indices.groupBy(_ / rowsPerBand).toSeq.map { case (b, sds) =>
        (id, b.toLong, md5Hex(sds.map(hexes).mkString(",")))
      }
    }

  /** Driver-side prefix rows (query_id, r, ph), r = 1..nSeeds — the twin of
    * [[prefixes]] over the query signatures. */
  private[graft] def queryPrefixesLocal(queries: Seq[(Int, String)],
                                        nSeeds: Int): Seq[(Long, Long, String)] =
    querySigLocal(queries, nSeeds).flatMap { case (id, hexes) =>
      (1 to nSeeds).map(r => (id, r.toLong, md5Hex(hexes.take(r).mkString(","))))
    }

  private val md5s = (c: org.apache.spark.sql.Column) => md5(c.cast("binary"))

  /** Query MinHash signatures (query_id, seed, minhash) — the RELATIONAL
    * form (same construction as Dedup.minhashColumnar); survives as the
    * parity reference for [[querySigLocal]]. */
  private[graft] def querySignatures(qt: DataFrame, nSeeds: Int): DataFrame =
    qt.crossJoin(broadcast(qt.sparkSession.range(nSeeds).toDF("seed")))
      .groupBy(col("query_id"), col("seed"))
      .agg(min(substring(md5s(
        concat(col("seed").cast("string"), lit(":"), col("term"))), 1, 16))
        .as("minhash"))

  /** Exact token-Jaccard of each (query_id, doc_id) candidate pair, with
    * candidates' extra columns carried through. The corpus side is joined
    * only on candidate doc ids — never scanned per query; the per-doc
    * distinct-token relation and set sizes come from the typed zero-shuffle
    * passes (set semantics are per-doc — no corpus-wide distinct()
    * exchange). */
  private def withJaccard(docs: DataFrame, qt: DataFrame, qsizes: Seq[(Long, Long)],
                          cand: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val dtok = TextOps.distinctTokensFast(docs)
    val dsize = TextOps.tokenSetSizesFast(docs)
      .select(col("doc_id"), col("n").as("dn"))
    val qsize = broadcast(qsizes.toDF("query_id", "qn"))
    val inter = cand.select(col("query_id"), col("doc_id"))
      .join(dtok, "doc_id")
      .join(broadcast(qt), Seq("query_id", "term"))
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("i"))
    cand
      .join(inter, Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("i"))
      .join(dsize, "doc_id").join(qsize, "query_id")
      .withColumn("jaccard",
        round(col("i") * lit(1.0) / (col("qn") + col("dn") - col("i")), 6))
  }

  /** Distinct-token count per query — the driver-side `qsize` input of
    * [[withJaccard]] (count over [[queryTokens]], which already dedups). */
  private def querySizesLocal(queries: Seq[(Int, String)]): Seq[(Long, Long)] =
    queries.map { case (id, q) => (id.toLong, queryTokens(q).length.toLong) }

  /** Top-k per query: LSH-band candidates re-ranked by exact Jaccard
    * (reference: index/index_new.py:65-72, fixed-band LSH).
    * Output: (query_id, rank, doc_id, jaccard). */
  def search(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
             nSeeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queryTermsDF(spark, queries)
    val qbands = queryBandsLocal(queries, nSeeds, rowsPerBand)
      .toDF("query_id", "band", "band_hash")

    val cand = Dedup.lshBands(docs, nSeeds, rowsPerBand)
      .join(broadcast(qbands), Seq("band", "band_hash"))
      .select(col("query_id"), col("doc_id")).distinct()

    withJaccard(docs, qt, querySizesLocal(queries), cand)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("jaccard").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("jaccard"))
  }

  /** Signature PREFIX hashes for every depth r = 1..nSeeds: ph(r) =
    * md5(minhash_0, …, minhash_{r−1}) — the relational form of a prefix
    * tree; survives as the parity reference for the typed doc pass
    * (Dedup.minhashPrefixesFastMd5) and the driver-side query twin. */
  private[graft] def prefixes(sig: DataFrame, idCol: String, nSeeds: Int): DataFrame =
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
    import spark.implicits._
    val qt = queryTermsDF(spark, queries)
    val qpre = queryPrefixesLocal(queries, nSeeds).toDF("query_id", "r", "ph")
    val dpre = Dedup.minhashPrefixesFastMd5(docs, nSeeds)
    val cand = dpre.join(broadcast(qpre), Seq("r", "ph"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("r")).as("depth"))
    withJaccard(docs, qt, querySizesLocal(queries), cand)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("depth").desc, col("jaccard").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("depth"),
        col("jaccard"))
  }
}
