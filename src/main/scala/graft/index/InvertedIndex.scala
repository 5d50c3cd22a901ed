package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.Page

/** On-disk index layout (Iceberg-shaped: partitioned Parquet behind a
  * `TableIO`-style seam — in production these directories are Iceberg
  * tables and every write below becomes `writeTo(...).createOrReplace()`/
  * `append()`; no other code changes):
  *
  *   <dir>/postings/shard=<s>/bucket=<b>/   (Parquet PostingBlock rows,
  *        sorted by term within files → Parquet min-max prunes term lookups;
  *        bucket = pmod(xxhash64(term), nTermBuckets) → directory pruning)
  *   <dir>/docstats/shard=<s>/                        (doc_id, url, doclen)
  *   <dir>/termstats/shard=<s>/                       (term, df, max_tfsat) per shard
  *   <dir>/corpus/shard=<s>/                          (n_docs, sum_dl) per shard
  *   <dir>/manifest/                                  (append-only commit log)
  *
  * Resumability (north rule): the shard is the unit of work; a shard is
  * done iff the manifest holds a committed row for it. `build` skips
  * committed shards, so a killed build resumes exactly where it stopped —
  * the analog of the reference's checkpoint manager (models/api.py:60-78)
  * realized as data-level commit markers.
  */
object InvertedIndex {

  case class CorpusShard(shard: Int, n_docs: Long, sum_dl: Long)

  def manifestPath(dir: String) = s"$dir/manifest"

  /** Shards already committed according to the manifest. */
  def committedShards(spark: SparkSession, dir: String): Set[Int] = {
    import spark.implicits._
    val p = new java.io.File(s"${stripScheme(dir)}/manifest")
    if (!p.exists()) Set.empty
    else spark.read.parquet(manifestPath(dir))
      .filter($"committed").select($"partition_id").as[Int].collect().toSet
  }

  private def stripScheme(s: String) = s.stripPrefix("file:")

  /** Build (or resume) the index over `pages` into `dir`. Returns the number
    * of shards built in this invocation. */
  def build(spark: SparkSession, pages: Dataset[Page], dir: String,
            p: BuildParams = BuildParams()): Int = {
    import spark.implicits._

    val done = committedShards(spark, dir)
    val todo = (0 until p.numShards).filterNot(done)
    if (todo.isEmpty) return 0

    val tokenized = IndexBuild.tokenize(pages, p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Global-ish stats come from per-shard rows aggregated at read time, but
    // tf saturation needs avgdl at build: compute it once over the corpus.
    val corpusByShard = tokenized.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
      .as[CorpusShard].collect()
    val nDocs = corpusByShard.map(_.n_docs).sum
    val avgdl = corpusByShard.map(_.sum_dl).sum.toDouble / math.max(nDocs, 1L)

    var built = 0
    for (shard <- todo) {
      val t0 = System.nanoTime()
      val shardTok = tokenized.filter($"shard" === shard)
      val tf = IndexBuild.termFreqs(shardTok)

      // within-shard df of hot terms only (tiny driver-side map)
      val hotDf: Map[String, Long] = tf.groupBy($"term")
        .agg(count(lit(1)).as("df"))
        .filter($"df" > p.saltThreshold)
        .as[(String, Long)].collect().toMap

      val postings = IndexBuild.buildShardPostings(tf, hotDf, p, avgdl)
        .withColumn("bucket",
          pmod(xxhash64($"term"), lit(p.nTermBuckets)).cast("int"))

      postings
        .repartition(col("bucket"))
        .sortWithinPartitions($"term", $"block_id")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$dir/postings/shard=$shard")

      // per-shard term stats (df + global max_tfsat for WAND bounds)
      val written = spark.read.parquet(s"$dir/postings/shard=$shard")
      written
        .groupBy($"term")
        .agg(sum($"n_docs").as("df"), max($"max_tfsat").as("max_tfsat"))
        .withColumn("bucket", pmod(xxhash64($"term"), lit(p.nTermBuckets)).cast("int"))
        .repartition(col("bucket"))
        .sortWithinPartitions($"term")
        .write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(s"$dir/termstats/shard=$shard")

      IndexBuild.docStats(shardTok).drop("shard")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/docstats/shard=$shard")

      Seq(CorpusShard(shard,
          corpusByShard.find(_.shard == shard).map(_.n_docs).getOrElse(0L),
          corpusByShard.find(_.shard == shard).map(_.sum_dl).getOrElse(0L)))
        .toDS().drop("shard")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/corpus/shard=$shard")

      // commit marker — written LAST, atomically via parquet append
      val stats = written.agg(
        sum($"n_docs").as("rows"), count(lit(1)).as("blocks"),
        sum(length($"doc_gaps_vb") + length($"tfs_vb") + length($"dls_vb")).as("bytes"))
        .collect()(0)
      val lineage = s"shard=$shard params=$p avgdl=$avgdl " +
        s"hotTerms=${hotDf.size} build_sec=${(System.nanoTime() - t0) / 1e9}"
      Seq(ManifestRow(shard, stats.getLong(0), stats.getLong(1), stats.getLong(2),
          committed = true, lineage))
        .toDS().write.mode(SaveMode.Append).parquet(manifestPath(dir))
      built += 1
    }
    tokenized.unpersist()
    built
  }

  // ------------------------------ read side ------------------------------

  def postings(spark: SparkSession, dir: String): Dataset[PostingBlock] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/postings")
      .select($"term", $"salt", $"block_id", $"first_doc", $"last_doc",
        $"n_docs", $"max_tf", $"max_tfsat", $"doc_gaps_vb", $"tfs_vb", $"dls_vb")
      .as[PostingBlock]
  }

  /** Global term stats: per-shard rows summed/maxed. */
  def termStats(spark: SparkSession, dir: String): Dataset[TermStat] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/termstats")
      .groupBy($"term")
      .agg(sum($"df").as("df"), max($"max_tfsat").as("max_tfsat"))
      .as[TermStat]
  }

  def docStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/docstats")

  /** (n_docs, avgdl) over all committed shards. */
  def corpusStats(spark: SparkSession, dir: String): (Long, Double) = {
    val row = spark.read.parquet(s"$dir/corpus")
      .agg(sum("n_docs"), sum("sum_dl")).collect()(0)
    val n = row.getLong(0)
    (n, row.getLong(1).toDouble / math.max(n, 1L))
  }
}
