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

  /** Per-shard corpus stats. `avgdl_build` is the corpus avgdl that this
    * shard's blocks were encoded with (their max_tfsat bounds assume it);
    * query-time WAND inflates stale bounds by max(1, avgdl_now/avgdl_build)
    * — tfsat is monotone in avgdl with exactly that Lipschitz factor — so
    * bounds stay safe when later appends (resume waves, streaming segments)
    * shift the global avgdl. */
  case class CorpusShard(shard: Int, n_docs: Long, sum_dl: Long,
                         avgdl_build: Double)

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
    * of shards built in this invocation.
    *
    * Pass structure (minimizing full-corpus scans — the dominant cost at
    * 100 TB):
    *   1. tokenize (narrow) → docstats for all todo shards in ONE dynamic-
    *      partition-overwrite write; corpus stats re-derived from docstats.
    *   2. tf hash-agg (ONE shuffle over all todo shards), persisted; global
    *      hot-term df sketch collected once (within-shard df ≈ df/numShards
    *      since shard = doc_id mod numShards is hash-uniform).
    *   3. per-shard (the resume unit): narrow filter of the cached tf →
    *      salted encode + segment merge (two skew-bounded shuffles over
    *      compressed data) → postings + termstats writes → commit marker.
    */
  def build(spark: SparkSession, pages: Dataset[Page], dir: String,
            p: BuildParams = BuildParams()): Int = {
    import spark.implicits._

    val done = committedShards(spark, dir)
    val todo = (0 until p.numShards).filterNot(done)
    if (todo.isEmpty) return 0

    // Never .persist() here: Spark's columnar cache serializer
    // (dictionary/RLE stats per value) costs ~85µs/row on string-heavy data
    // — measured 6× the cost of re-running the typed tokenizer. Reused
    // intermediates are materialized to scratch Parquet instead (also the
    // only pattern that works at 100 TB).
    val scratch = s"$dir/_scratch_tok"
    IndexBuild.tokenize(pages, p)
      .filter($"shard".isin(todo: _*))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(scratch)
    val tokenized = spark.read.parquet(scratch)

    // Pass 1: docstats for every todo shard, one (column-pruned) job.
    // Dynamic overwrite touches only the shards being (re)built — committed
    // shards' files stay put (Iceberg analog: REPLACE PARTITIONS).
    tokenized.select($"doc_id", $"url", $"dl".as("doclen"), $"shard")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(s"$dir/docstats")

    // Corpus stats over ALL shards (done + todo) from the docstats table —
    // avgdl must be corpus-global and identical on resume.
    val allDoc = spark.read.parquet(s"$dir/docstats")
    val byShard = allDoc.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"doclen").as("sum_dl"))
      .as[(Int, Long, Long)].collect()
    val nDocs = byShard.map(_._2).sum
    val avgdl = byShard.map(_._3).sum.toDouble / math.max(nDocs, 1L)
    // Only TODO shards get corpus rows here: committed shards keep the
    // avgdl_build their blocks were actually encoded with.
    byShard.toSeq.filter(s => todo.contains(s._1))
      .map { case (sh, n, sd) => CorpusShard(sh, n, sd, avgdl) }.toDS()
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(s"$dir/corpus")

    // Token instances (tf=1 each). There is deliberately NO corpus-wide
    // (term, doc_id) aggregation: its group count ≈ corpus size degenerates
    // hash agg into an external sort; instead tf falls out of run-length
    // counting inside the salted sort (IndexBuild.mergeConsecutive).
    def tokenInstances(shards: Seq[Int]) = tokenized
      .filter($"shard".isin(shards: _*))
      .select($"shard".cast("int").as("shard"),
        explode($"tokens").as("term"), $"doc_id", lit(1).as("tf"), $"dl")
      .as[ShardPosting]

    // Hot-term sketch: per-term token counts (Σtf ≥ df upper-bounds the
    // posting count, which is what salting must bound); ~|vocab| groups →
    // cheap map-side partial agg, unlike a (term, doc) agg.
    val hotDf: Map[String, Long] = tokenized
      .select(explode($"tokens").as("term"))
      .groupBy($"term")
      .agg((count(lit(1)) / todo.size).cast("long").as("n_per_shard"))
      .filter($"n_per_shard" > p.saltThreshold)
      .as[(String, Long)].collect().toMap

    // Pass 3: waves. A wave of shards is ONE pair of shuffles + ONE set of
    // writes; its shards commit together (all-or-nothing), so waveShards
    // trades resume granularity against per-job overhead. Default: all todo
    // shards in one wave.
    val waveSize = if (p.waveShards > 0) p.waveShards else todo.size
    var built = 0
    for (wave <- todo.grouped(waveSize)) {
      val t0 = System.nanoTime()
      IndexBuild.buildShardPostings(tokenInstances(wave), hotDf, p, avgdl)
        .withColumn("bucket",
          pmod(xxhash64($"term"), lit(p.nTermBuckets)).cast("int"))
        .repartition(col("shard"), col("bucket"))
        .sortWithinPartitions($"term", $"block_id")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard", "bucket")
        .parquet(s"$dir/postings")

      // stats read the files just written (vectorized scan beats re-running
      // the build pipeline or caching it)
      val postings = spark.read.parquet(s"$dir/postings")
        .filter($"shard".isin(wave: _*))

      // per-shard term stats (df + global max_tfsat for WAND bounds)
      postings
        .groupBy($"shard", $"term")
        .agg(sum($"n_docs").as("df"), max($"max_tfsat").as("max_tfsat"))
        .withColumn("bucket", pmod(xxhash64($"term"), lit(p.nTermBuckets)).cast("int"))
        .repartition(col("shard"), col("bucket"))
        .sortWithinPartitions($"term")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard", "bucket")
        .parquet(s"$dir/termstats")

      // commit markers — written LAST, after every write of the wave landed
      val waveSec = (System.nanoTime() - t0) / 1e9
      val stats = postings.groupBy($"shard").agg(
        sum($"n_docs").as("rows"), count(lit(1)).as("blocks"),
        sum(length($"doc_gaps_vb") + length($"tfs_vb") + length($"dls_vb")).as("bytes"))
        .collect()
      stats.toSeq.map { r =>
        ManifestRow(r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          committed = true,
          s"shard=${r.getInt(0)} wave=${wave.mkString(",")} params=$p " +
            s"avgdl=$avgdl hotTerms=${hotDf.size} wave_sec=$waveSec")
      }.toDS().write.mode(SaveMode.Append).parquet(manifestPath(dir))
      built += wave.size
    }
    deleteRecursively(new java.io.File(stripScheme(scratch)))
    built
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  /** Delete an index directory (local paths only; test/bench helper). */
  def deleteDir(dir: String): Unit =
    deleteRecursively(new java.io.File(stripScheme(dir)))

  // ------------------------------ read side ------------------------------

  def postings(spark: SparkSession, dir: String): Dataset[PostingBlock] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/postings")
      .select($"shard".cast("int").as("shard"), $"term", $"salt", $"block_id",
        $"first_doc", $"last_doc", $"n_docs", $"max_tf", $"max_tfsat",
        $"doc_gaps_vb", $"tfs_vb", $"dls_vb")
      .as[PostingBlock]
  }

  /** Per-shard avgdl_build factors (see [[CorpusShard]]). */
  def avgdlBuild(spark: SparkSession, dir: String): Map[Int, Double] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/corpus")
      .select($"shard", $"avgdl_build").as[(Int, Double)].collect().toMap
  }

  /** Global term stats: per-shard rows summed/maxed, with each shard's
    * max_tfsat bound inflated to stay safe under the current avgdl. */
  def termStats(spark: SparkSession, dir: String,
                avgdlNow: Double): Dataset[TermStat] = {
    import spark.implicits._
    val av = spark.read.parquet(s"$dir/corpus").select($"shard", $"avgdl_build")
    spark.read.parquet(s"$dir/termstats")
      .join(broadcast(av), "shard")
      .withColumn("adj", $"max_tfsat" *
        greatest(lit(1.0), lit(avgdlNow) / $"avgdl_build"))
      .groupBy($"term")
      .agg(sum($"df").as("df"), max($"adj").as("max_tfsat"))
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
