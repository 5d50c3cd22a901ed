package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.data.Page
import graft.index.{BuildParams, IndexBuild, InvertedIndex, ManifestRow}

/** Incremental (streaming) index maintenance — the Structured-Streaming
  * analog of the reference's one-document-at-a-time `index.insert`
  * (reference: index/index.py:55-57, index_new.py:58-63): micro-batches of
  * pages are appended as independent, immutable posting SEGMENTS that reuse
  * the batch index's on-disk layout (a segment is just a shard with id
  * ≥ 1000), so the whole read/query path — Bm25.open, topk, topkWand,
  * corpus/term stats — works on a streamed index unchanged.
  *
  * Consistency under growth: each segment's blocks embed the avgdl at its
  * append time (corpus row `avgdl_build`); queries inflate stale max_tfsat
  * bounds by max(1, avgdl_now/avgdl_build), keeping WAND result-identical
  * while the corpus drifts.
  *
  * Exactly-once: foreachBatch + a manifest commit row per (segment) batch;
  * a replayed batch id that is already committed is skipped, so restart
  * after failure never double-indexes a segment.
  */
object StreamingIndex {

  final val SegmentBase = 1000

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  /** Append one micro-batch of pages as segment (SegmentBase + batchId).
    * Public so batch jobs can append segments too (idempotent by id). */
  def appendSegment(spark: SparkSession, batch: Dataset[Page], dir: String,
                    batchId: Long, params: BuildParams): Unit = {
    import spark.implicits._
    val seg = SegmentBase + batchId.toInt
    val committed = InvertedIndex.committedShards(spark, dir)
    if (committed.contains(seg)) return
    // appends must keep the CREATING build's bucket layout (readers trust
    // <dir>/params) — a restarted stream configured differently would
    // otherwise write terms into buckets no query ever probes
    val p = InvertedIndex.adoptLayout(spark, dir, params)
    InvertedIndex.writeParamsIfAbsent(spark, dir, p)

    // every doc in this segment lands in this segment's shard id
    val tokenized = IndexBuild.tokenize(batch, p.copy(numShards = 1))
      .withColumn("shard", lit(seg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    tokenized.select($"doc_id", $"url", $"dl".as("doclen"), $"shard")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$dir/docstats")

    // avgdl over everything indexed so far INCLUDING this segment — but
    // never counting leftovers of a crashed, uncommitted segment. Totals
    // come from the committed CORPUS rows (each shard's n_docs/sum_dl are
    // exact at commit) plus this segment's own aggregate: O(shards) + O(this
    // batch) — NEVER a scan of all docstats, which is O(total docs indexed)
    // metadata per micro-batch (a per-batch corpus-sized read at the
    // 10^12-doc design point).
    val segRow = tokenized.agg(count(lit(1)), coalesce(sum($"dl"), lit(0L))).head()
    val (segN, segDl) = (segRow.getLong(0), segRow.getLong(1))
    val (prevN, prevDl) =
      if (committed.isEmpty) (0L, 0L)
      else {
        val r = spark.read.parquet(s"$dir/corpus")
          .filter($"shard".isin(committed.toSeq: _*))
          .agg(coalesce(sum($"n_docs"), lit(0L)),
            coalesce(sum($"sum_dl"), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
    val avgdl = (prevDl + segDl).toDouble / math.max(prevN + segN, 1L)
    Seq(InvertedIndex.CorpusShard(seg, segN, segDl, avgdl))
      .toDS().write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$dir/corpus")

    // per-doc map-side pre-merge (same feed as the batch build): one row
    // per distinct term per doc, NO (term, doc) aggregation exchange — the
    // streaming append previously paid a full groupBy shuffle per
    // micro-batch for tf that run-length/pre-merge semantics give for free
    val tf = IndexBuild.docTermFreqs(tokenized)
    val postings = IndexBuild.buildShardPostings(tf, Map.empty, p, avgdl)
      .withColumn("bucket", pmod(xxhash64($"term"), lit(p.nTermBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    postings.repartition(col("bucket")).sortWithinPartitions($"term", $"salt", $"block_id")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard", "bucket")
      .parquet(s"$dir/postings")

    // coalesce: an empty segment (all docs in the batch tokenize to
    // nothing) must commit a zero-row manifest marker, not NPE on the
    // NULL sums of an empty aggregation
    val stats = postings.agg(coalesce(sum($"n_docs"), lit(0L)), count(lit(1)),
      coalesce(sum(length($"doc_gaps_vb") + length($"tfs_vb") + length($"dls_vb")),
        lit(0L))).head()
    postings.unpersist(); tokenized.unpersist()
    Seq(ManifestRow(seg, stats.getLong(0), stats.getLong(1), stats.getLong(2),
        committed = true,
        s"segment=$seg batchId=$batchId avgdl=$avgdl params=$p"))
      .toDS().write.mode(SaveMode.Append)
      .parquet(InvertedIndex.manifestPath(dir))
  }

  /** Start a streaming index build over a directory of page parquet files.
    * New files become new segments; query with Bm25.open(indexDir) at any
    * time. */
  def start(spark: SparkSession, sourceDir: String, indexDir: String,
            p: BuildParams = BuildParams()): StreamingQuery = {
    import spark.implicits._
    spark.readStream.schema(pageSchema).parquet(sourceDir).as[Page]
      .writeStream
      .option("checkpointLocation", s"$indexDir/_checkpoint")
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        appendSegment(batch.sparkSession, batch, indexDir, batchId, p)
      }
      .start()
  }
}
