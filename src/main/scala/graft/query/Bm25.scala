package graft.query

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TextExtract
import graft.index.{IndexBuild, InvertedIndex, Posting, PostingBlock}

/** BM25 top-k over the inverted index (k1=1.2, b=0.75 per BASELINE.json).
  *
  * score(d, q) = Σ_{t ∈ distinct(q)} qtf(t) · idf(t) · tfsat(t, d)
  *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))          (Lucene form)
  *   tfsat(t, d) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Deterministic tiebreak everywhere: (score desc, doc_id asc).
  *
  * The probe is the Spark-native form of the reference's bucket probe +
  * re-rank (reference: index/index_new.py:65-72): query terms → pruned
  * posting-block scan (bucket directory pruning + Parquet min-max on term)
  * → decode → codegen'd score arithmetic → groupBy(doc_id) sum →
  * TakeOrderedAndProject (partial per-partition top-k, merged on driver).
  *
  * [[IndexHandle.topkWand]] adds block-max pruning (Ding & Suel, SIGIR 2011
  * "Faster top-k document retrieval using block-max indexes"): a block of
  * term t is skipped when
  *   qtf_t·idf_t·max_tfsat(block) + Σ_{t'≠t} qtf·idf·max_tfsat_global(t') < θ
  * with θ a lower bound on the k-th best total score, taken from the single
  * most-impactful term's partial scores. Result identity with the exhaustive
  * path: a doc with true score ≥ θ has every one of its blocks bounded below
  * by its true score, so none is pruned and its final score is exact; a doc
  * that loses contributions to pruning had total upper bound < θ ≤ k-th
  * best, so it cannot displace a top-k member. Property-tested in
  * Bm25Spec.
  */
object Bm25 {

  case class QueryTerm(term: String, qtf: Int)
  case class TermInfo(term: String, qtf: Int, df: Long, idf: Double, gmax: Double)

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  def tfSat(tf: Double, dl: Double, avgdl: Double): Double =
    tf * (IndexBuild.BM25_K1 + 1.0) /
      (tf + IndexBuild.BM25_K1 * (1.0 - IndexBuild.BM25_B +
        IndexBuild.BM25_B * dl / avgdl))

  /** Column form of tfsat — keeps per-posting scoring in codegen. */
  def tfSatCol(tf: Column, dl: Column, avgdl: Double): Column =
    tf * lit(IndexBuild.BM25_K1 + 1.0) /
      (tf + lit(IndexBuild.BM25_K1) * (lit(1.0 - IndexBuild.BM25_B) +
        lit(IndexBuild.BM25_B / avgdl) * dl))

  /** Parse + weight the query with the reference query tokenizer (uncapped,
    * stopword-filtered; reference: cleaners.py:38-41). Duplicate terms
    * become qtf multiplicity. */
  def queryTerms(q: String): Seq[QueryTerm] =
    TextExtract.tokenizeQuery(q).groupBy(identity).toSeq
      .map { case (t, xs) => QueryTerm(t, xs.length) }
      .sortBy(_.term)

  /** Open an index directory: loads the two corpus scalars once. */
  def open(spark: SparkSession, dir: String, nTermBuckets: Int = 16): IndexHandle = {
    val (n, avgdl) = InvertedIndex.corpusStats(spark, dir)
    IndexHandle(spark, dir, n, avgdl, nTermBuckets)
  }

  case class IndexHandle(spark: SparkSession, dir: String, nDocs: Long,
                         avgdl: Double, nTermBuckets: Int) {
    import spark.implicits._

    /** k-row pruned scan of termstats for the query's terms. */
    def termInfos(q: String): Seq[TermInfo] = {
      val qts = queryTerms(q)
      if (qts.isEmpty) return Nil
      val stats = InvertedIndex.termStats(spark, dir, avgdl)
        .filter($"term".isin(qts.map(_.term): _*))
        .collect().map(ts => ts.term -> ts).toMap
      qts.flatMap { qt =>
        stats.get(qt.term).map(ts =>
          TermInfo(qt.term, qt.qtf, ts.df, idf(nDocs, ts.df), ts.max_tfsat))
      }
    }

    /** Pruned posting-block scan: bucket dirs + term min-max row groups.
      * Each block's max_tfsat is inflated by its shard's avgdl-drift factor
      * so WAND pruning stays safe on indexes appended under an older avgdl
      * (resume waves, streaming segments). */
    private def loadBlocks(terms: Seq[String]): Dataset[PostingBlock] = {
      val buckets = terms.toDF("t")
        .select(pmod(xxhash64($"t"), lit(nTermBuckets)).cast("int").as("b"))
        .distinct().as[Int].collect().toSeq
      val factors = InvertedIndex.avgdlBuild(spark, dir)
      val fMap = map(factors.toSeq.flatMap { case (sh, av) =>
        Seq(lit(sh), lit(math.max(1.0, avgdl / av)))
      }: _*)
      spark.read.parquet(s"$dir/postings")
        .filter($"bucket".isin(buckets: _*) && $"term".isin(terms: _*))
        .withColumn("max_tfsat",
          $"max_tfsat" * coalesce(element_at(fMap, $"shard".cast("int")), lit(1.0)))
        .select($"shard".cast("int").as("shard"), $"term", $"salt", $"block_id",
          $"first_doc", $"last_doc", $"n_docs", $"max_tf", $"max_tfsat",
          $"doc_gaps_vb", $"tfs_vb", $"dls_vb")
        .as[PostingBlock]
    }

    /** Decode + score + aggregate + top-k. Scoring weights enter as a
      * literal map so the whole per-posting path after decode is codegen. */
    private def scoreBlocks(blocks: Dataset[PostingBlock],
                            infos: Seq[TermInfo], k: Int): DataFrame = {
      val wPairs = infos.flatMap(ti =>
        Seq(lit(ti.term), lit(ti.qtf * ti.idf)))
      val wMap = map(wPairs: _*)
      blocks
        .flatMap(IndexBuild.decodeBlock _)
        .toDF()
        .withColumn("score",
          element_at(wMap, $"term") * tfSatCol($"tf", $"dl", avgdl))
        .groupBy($"doc_id")
        .agg(sum($"score").as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(k)
    }

    /** Exhaustive scoring: always correct; WAND must equal it. */
    def topk(q: String, k: Int): DataFrame = {
      val infos = termInfos(q)
      if (infos.isEmpty) emptyResult(spark)
      else scoreBlocks(loadBlocks(infos.map(_.term)), infos, k)
    }

    /** Block-max pruned top-k — result-identical to [[topk]]. */
    def topkWand(q: String, k: Int): DataFrame = {
      val infos = termInfos(q)
      if (infos.isEmpty) return emptyResult(spark)
      val blocks = loadBlocks(infos.map(_.term))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val best = infos.maxBy(ti => ti.qtf * ti.idf * ti.gmax)
        val bw = best.qtf * best.idf
        val theta: Double = {
          val partials = blocks.filter($"term" === best.term)
            .flatMap(IndexBuild.decodeBlock _)
            .select((lit(bw) * tfSatCol($"tf", $"dl", avgdl)).as("s"))
            .orderBy(desc("s")).limit(k).as[Double].collect()
          if (partials.length < k) Double.NegativeInfinity else partials.last
        }
        val selfW = infos.map(ti => ti.term -> ti.qtf * ti.idf).toMap
        val othersBound = infos.map { ti =>
          ti.term -> infos.filter(_.term != ti.term)
            .map(o => o.qtf * o.idf * o.gmax).sum
        }.toMap
        val bcSelf = spark.sparkContext.broadcast(selfW)
        val bcOthers = spark.sparkContext.broadcast(othersBound)
        val survivors = blocks.filter { b =>
          bcSelf.value(b.term) * b.max_tfsat + bcOthers.value(b.term) >= theta
        }
        scoreBlocks(survivors, infos, k)
      } finally blocks.unpersist()
    }

    /** Candidate doc metadata lookup (the reference's title-cache probe,
      * index_new.py:69). The top-k result set is the tiny side — broadcast
      * IT, never the doc table (docstats is corpus-sized: 10^12 rows at the
      * design point). */
    def withUrls(results: DataFrame): DataFrame =
      InvertedIndex.docStats(spark, dir)
        .select($"doc_id", $"url", $"doclen")
        .join(broadcast(results), Seq("doc_id"), "right")
        .select(results.columns.map(col) :+ $"url" :+ $"doclen": _*)
  }

  private def emptyResult(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Double)].toDF("doc_id", "score")
  }
}
