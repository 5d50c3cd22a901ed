package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TextExtract
import graft.data.Page

/** One (term, doc) pair with the doc's length riding along (so scoring never
  * needs a doc-side join). */
case class Posting(term: String, doc_id: Long, tf: Int, dl: Int)

/** A posting tagged with its doc shard — the build keys every stage by
  * (shard, term[, salt]) so one job processes a whole wave of shards. */
case class ShardPosting(shard: Int, term: String, doc_id: Long, tf: Int, dl: Int)

/** One compressed posting block: ≤ blockSize docs, sorted by doc_id, with
  * per-block max-score metadata for block-max WAND.
  * Structural ancestor: the reference's sorted pickled blocks + sparse
  * (offset, first-key) directory (reference: index/hash_index.py:113-124,183)
  * — here the "directory" is ordinary columns (first_doc/last_doc/max_tfsat)
  * prunable by Parquet min-max stats and plain filters.
  */
case class PostingBlock(
    shard: Int, term: String, salt: Int, block_id: Int,
    first_doc: Long, last_doc: Long, n_docs: Int,
    max_tf: Int, max_tfsat: Double,
    doc_gaps_vb: Array[Byte], tfs_vb: Array[Byte], dls_vb: Array[Byte])

case class DocStat(doc_id: Long, url: String, doclen: Int, shard: Int)

case class TermStat(term: String, df: Long, max_tfsat: Double)

case class ManifestRow(
    partition_id: Int, rows: Long, blocks: Long, bytes: Long,
    committed: Boolean, lineage: String)

/** Build parameters. `numShards` is the coarse doc-partitioning of the whole
  * index (the unit of resumability and of bounded per-term merge state: at
  * 10^12 docs a 30%-df hot term has ~3·10^11 postings — no single task may
  * ever see all of them, so the index is doc-sharded first, and within a
  * shard hot terms are salted and re-merged).
  */
case class BuildParams(
    numShards: Int = 4,
    blockSize: Int = 128,
    saltThreshold: Long = 100000L, // df within shard above which a term is salted
    targetPerSalt: Long = 50000L,  // postings per salt bucket for hot terms
    nTermBuckets: Int = 16,        // directory partitions of postings by term hash
    k1: Double = 1.2,
    b: Double = 0.75,
    fullText: Boolean = true,      // uncapped tokens (web index) vs 16-token cap
    waveShards: Int = 0)           // shards committed per wave job; 0 = all todo

/** Inverted-index construction: the Spark-native rebuild of the reference's
  * blocked external sort-merge index (reference: index/hash_index.py:24-201)
  * as a declarative pipeline:
  *
  *   pages → extract+tokenize (narrow) → per-doc (term, tf) pre-merge
  *   (docTermFreqs) → range-salted repartition+sort (ONE skew-bounded
  *   shuffle) → varbyte block encode → partitioned Parquet postings +
  *   doc/term/corpus stats + manifest.
  *
  * Everything is Dataset/Catalyst — the only imperative code runs inside
  * `flatMapSortedGroups` (block encode), the typed-Dataset analog of the
  * reference's `_dump_block` (hash_index.py:113-124) with Spark's spilling
  * shuffle underneath. The reference's k-way `heapq.merge`
  * (hash_index.py:166-195) has no runtime counterpart at all: range salting
  * makes the per-salt runs disjoint-and-ordered, so "merge" is a free
  * layout property (see [[rangeSalt]]).
  */
object IndexBuild {

  val BM25_K1 = 1.2
  val BM25_B = 0.75

  /** Stable doc id: hash of url, masked non-negative (63 bits — at 10^12
    * docs the expected collision count is ~5·10^4, i.e. a 5e-8 rate;
    * acceptable for search, and stable across resumes with no global
    * counter). */
  def docIdCol(url: Column): Column =
    xxhash64(url).bitwiseAND(lit(Long.MaxValue))

  /** Scala twin of [[docIdCol]] (same XXH64, seed 42, same mask) — lets the
    * tokenizer run as one typed pass; parity is property-tested. */
  def docId(url: String): Long = {
    val b = url.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L) & Long.MaxValue
  }

  /** One tokenized page. */
  case class TokDoc(doc_id: Long, url: String, shard: Int, dl: Int,
                    tokens: Array[String])

  /** pages → (doc_id, url, shard, dl, tokens). One typed pass: the regex
    * clean + split + stopword HashSet filter run once per row in plain JVM
    * code (the Column-HOF form re-evaluates the token expression for every
    * derived column and pays a 179-way array_contains per token — measured
    * ~8× slower at 20k docs). */
  def tokenize(pages: Dataset[Page], p: BuildParams): DataFrame = {
    import pages.sparkSession.implicits._
    val numShards = p.numShards
    val fullText = p.fullText
    pages.mapPartitions { it =>
      it.flatMap { pg =>
        val cleaned = TextExtract.cleanText(pg.text)
        val toks =
          if (fullText) TextExtract.tokenizeFull(cleaned)
          else TextExtract.tokenizeDoc(cleaned)
        if (toks.isEmpty) None // empty-doc filter (reference: main.py:31-33)
        else {
          val id = docId(pg.url)
          Some(TokDoc(id, pg.url, (id % numShards).toInt, toks.length, toks))
        }
      }
    }.toDF()
  }

  /** Stats pass: per-doc lengths + corpus aggregates for one shard. */
  def docStats(tokenized: DataFrame): Dataset[DocStat] = {
    import tokenized.sparkSession.implicits._
    tokenized.select($"doc_id", $"url", $"dl".as("doclen"), $"shard").as[DocStat]
  }

  /** (term, doc_id, tf, dl) via explode + partial+final hash aggregation. */
  def termFreqs(tokenized: DataFrame): Dataset[Posting] = {
    import tokenized.sparkSession.implicits._
    tokenized
      .select($"doc_id", $"dl", explode($"tokens").as("term"))
      .groupBy($"term", $"doc_id", $"dl")
      .agg(count(lit(1)).cast("int").as("tf"))
      .select($"term", $"doc_id", $"tf", $"dl".as("dl"))
      .as[Posting]
  }

  /** Tiny mutable counter cell — one allocation per DISTINCT term per doc
    * (which is exactly one emitted row), never one per increment. */
  private final class Cnt { var v: Int = 0 }

  /** Map-side per-doc pre-merge: one ShardPosting per DISTINCT (term, doc)
    * with its tf, instead of one row per TOKEN INSTANCE (tf=1). A doc's
    * tokens are adjacent by construction (they are one array in the scratch
    * row), so the merge state is a per-doc HashMap — O(doc), reset per row —
    * never the corpus-wide (term, doc_id) hash agg this build deliberately
    * avoids (group count ≈ corpus size degenerates into an external sort).
    *
    * This cuts the build's ONE shuffle by the within-doc term-duplication
    * factor in both rows and bytes (the term string no longer travels once
    * per occurrence) — the dominant cost of a 100 TB build and the lever on
    * a bandwidth-capped box. Downstream [[saltedRuns]] is unchanged:
    * `mergeConsecutive` accepts pre-aggregated input as a no-op, and the
    * per-(term,salt) doc_id-sorted posting stream — hence every encoded
    * block — is byte-identical to the raw-instance feed. */
  def docTermFreqs(tokenized: DataFrame): Dataset[ShardPosting] = {
    import tokenized.sparkSession.implicits._
    tokenized
      .select($"shard".cast("int").as("shard"), $"doc_id", $"dl", $"tokens")
      .as[(Int, Long, Int, Array[String])]
      .mapPartitions { it =>
        it.flatMap { case (shard, docId, dl, tokens) =>
          val counts = new java.util.HashMap[String, Cnt](
            math.max(8, tokens.length * 2))
          var i = 0
          while (i < tokens.length) {
            val t = tokens(i)
            var c = counts.get(t)
            if (c == null) { c = new Cnt; counts.put(t, c) }
            c.v += 1
            i += 1
          }
          val out = new Array[ShardPosting](counts.size)
          val eit = counts.entrySet().iterator()
          var j = 0
          while (eit.hasNext) {
            val e = eit.next()
            out(j) = ShardPosting(shard, e.getKey, docId, e.getValue.v, dl)
            j += 1
          }
          out
        }
      }
  }

  private def tfSat(tf: Int, dl: Int, avgdl: Double, k1: Double, b: Double): Double =
    tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  /** Encode one doc_id-sorted run of [[RunValue]]s into blocks of ≤
    * blockSize MERGED postings. Consecutive rows with equal doc_id are
    * merged by summing tf BEFORE a posting is appended (a doc's merged
    * posting therefore never splits across blocks) — this keeps the
    * raw-token-instance feed (tf=1 per occurrence) working with no
    * separate corpus-wide (term, doc_id) aggregation shuffle, and is a
    * no-op on pre-aggregated input. Blocks are byte-identical to the old
    * Posting-object pipeline; the rewrite removes one Posting allocation
    * per shuffled row and the boxed ArrayBuffer[Long] appends (three boxed
    * longs per posting) from the hottest loop of the build's one big
    * shuffle. */
  private def encodeRunValues(shard: Int, term: String, salt: Int,
                              rvs: Iterator[RunValue], blockSize: Int,
                              avgdl: Double, k1: Double, b: Double
                             ): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private val buf = rvs.buffered
      private val docs = new Array[Long](blockSize)
      private val tfs = new Array[Long](blockSize)
      private val dls = new Array[Long](blockSize)
      private var blockId = 0
      def hasNext: Boolean = buf.hasNext
      def next(): PostingBlock = {
        var n = 0
        var maxTf = 0
        var maxSat = 0.0
        while (buf.hasNext && n < blockSize) {
          val v = buf.next()
          val docId = v.doc_id
          var tf = (v.tfdl >>> 32).toInt
          val dl = v.tfdl.toInt
          while (buf.hasNext && buf.head.doc_id == docId)
            tf += (buf.next().tfdl >>> 32).toInt
          docs(n) = docId; tfs(n) = tf.toLong; dls(n) = dl.toLong
          if (tf > maxTf) maxTf = tf
          val s = tfSat(tf, dl, avgdl, k1, b)
          if (s > maxSat) maxSat = s
          n += 1
        }
        val blk = PostingBlock(
          shard, term, salt, blockId, docs(0), docs(n - 1), n,
          maxTf, maxSat,
          VarByte.encodeDeltas(java.util.Arrays.copyOf(docs, n)),
          VarByte.encode(java.util.Arrays.copyOf(tfs, n)),
          VarByte.encode(java.util.Arrays.copyOf(dls, n)))
        blockId += 1
        blk
      }
    }

  /** Decode a block back to postings (sorted by doc_id). */
  def decodeBlock(blk: PostingBlock): Iterator[Posting] = {
    val docs = VarByte.decodeDeltas(blk.doc_gaps_vb, blk.n_docs)
    val tfs = VarByte.decode(blk.tfs_vb, blk.n_docs)
    val dls = VarByte.decode(blk.dls_vb, blk.n_docs)
    (0 until blk.n_docs).iterator.map(i =>
      Posting(blk.term, docs(i), tfs(i).toInt, dls(i).toInt))
  }

  /** Number of range-salt buckets for a term with ~df postings per shard. */
  private def saltCount(df: Long, targetPerSalt: Long): Int =
    math.max(2, math.ceil(df.toDouble / targetPerSalt).toInt)

  /** Range salt of a doc_id among n buckets: doc ids are xxhash64-uniform
    * over [0, 2^63), so fixed-width ranges are as balanced as hash salting —
    * AND they make the salted runs of one term DISJOINT and ordered (all
    * doc ids in salt k precede all in salt k+1). That property eliminates
    * the whole k-way merge stage: the concatenation of the per-salt sorted
    * runs in salt order IS the globally doc_id-ordered posting list, so no
    * task ever needs to hold more than one encode buffer — per-term merge
    * state is O(blockSize) no matter how hot the term (the reference's
    * heapq.merge, hash_index.py:166-195, becomes a zero-cost layout
    * property instead of a compute stage). */
  def rangeSalt(docId: Long, n: Int): Int =
    if (n <= 1) 0 else (docId / (Long.MaxValue / n + 1)).toInt

  /** The shuffled value of the salted sort: doc_id plus (tf, dl) packed
    * into one long. Byte discipline for the build's ONE big exchange —
    * every UnsafeRow field costs a full 8-byte slot regardless of declared
    * width, so two ints packed into one long halve their wire cost. */
  private[index] case class RunValue(doc_id: Long, tfdl: Long)

  /** One map-side posting run: a doc_id-sorted, within-run-merged slice of
    * one (shard|salt, term) posting list, pre-compressed with the SAME
    * delta+varbyte codec the final blocks use. This is what the build's one
    * shuffle now ships: one row per (term, salt) per MAP PARTITION instead
    * of one row per posting (SPIMI-style run generation, IIR §4.3), so the
    * shuffle's row count drops by the postings-per-run factor (~40× at
    * 300k docs) and its bytes by ~3× (varbyte vs 8-byte slots). */
  private[index] case class PostingRun(
      gk: Long, term: String, n: Int,
      docs_vb: Array[Byte], tfs_vb: Array[Byte], dls_vb: Array[Byte])

  /** Growable (doc_id, tfdl) pair buffer for one (term, salt) run. */
  private final class RunBuf(initCap: Int) {
    var docs = new Array[Long](initCap)
    var tfdls = new Array[Long](initCap)
    var n = 0
    def add(d: Long, t: Long): Unit = {
      if (n == docs.length) {
        docs = java.util.Arrays.copyOf(docs, n * 2)
        tfdls = java.util.Arrays.copyOf(tfdls, n * 2)
      }
      docs(n) = d; tfdls(n) = t; n += 1
    }
  }

  /** Quicksort the pair arrays (d, t) on d over [lo, hi] — keeps the two
    * parallel primitive arrays aligned without boxing a tuple per posting.
    * Equal keys may land in any order (they are merged immediately after,
    * summing tf — order-insensitive). */
  private def sortPairs(d: Array[Long], t: Array[Long], lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (hi - lo > 12) {
      // median-of-three pivot
      val mid = lo + (hi - lo) / 2
      val pivot = {
        val a = d(lo); val b = d(mid); val c = d(hi)
        if (a < b) { if (b < c) b else if (a < c) c else a }
        else { if (a < c) a else if (b < c) c else b }
      }
      var i = lo; var j = hi
      while (i <= j) {
        while (d(i) < pivot) i += 1
        while (d(j) > pivot) j -= 1
        if (i <= j) {
          val td = d(i); d(i) = d(j); d(j) = td
          val tt = t(i); t(i) = t(j); t(j) = tt
          i += 1; j -= 1
        }
      }
      // recurse on the smaller half, loop on the larger (O(log n) stack)
      if (j - lo < hi - i) { sortPairs(d, t, lo, j); lo = i }
      else { sortPairs(d, t, i, hi); hi = j }
    }
    // insertion sort for the small tail
    var i = lo + 1
    while (i <= hi) {
      val kd = d(i); val kt = t(i)
      var j = i - 1
      while (j >= lo && d(j) > kd) { d(j + 1) = d(j); t(j + 1) = t(j); j -= 1 }
      d(j + 1) = kd; t(j + 1) = kt
      i += 1
    }
  }

  /** Sort a run buffer by doc_id, merge equal doc_ids (sum tf, keep the
    * first dl — doc_ids repeat only on instance-level feeds, where dl is
    * constant per doc), and varbyte-encode it into one [[PostingRun]]. */
  private def encodeRun(gk: Long, term: String, b: RunBuf): PostingRun = {
    sortPairs(b.docs, b.tfdls, 0, b.n - 1)
    val docs = new Array[Long](b.n)
    val tfs = new Array[Long](b.n)
    val dls = new Array[Long](b.n)
    var m = 0
    var i = 0
    while (i < b.n) {
      val docId = b.docs(i)
      var tf = (b.tfdls(i) >>> 32).toInt
      val dl = b.tfdls(i).toInt
      i += 1
      while (i < b.n && b.docs(i) == docId) {
        tf += (b.tfdls(i) >>> 32).toInt; i += 1
      }
      docs(m) = docId; tfs(m) = tf.toLong; dls(m) = dl.toLong
      m += 1
    }
    PostingRun(gk, term, m,
      VarByte.encodeDeltas(java.util.Arrays.copyOf(docs, m)),
      VarByte.encode(java.util.Arrays.copyOf(tfs, m)),
      VarByte.encode(java.util.Arrays.copyOf(dls, m)))
  }

  /** Map-side state cap: when a task has buffered this many postings it
    * flushes its runs early (several runs per (term, salt) per partition
    * are fine — the reduce-side k-way merge accepts any number). Bounds
    * per-task memory at ~2×64 MB of primitive arrays regardless of
    * partition size. */
  private val RunFlushPostings = 4L * 1000 * 1000

  /** SPIMI run generation: one pass over a partition's postings, buffering
    * (doc_id, tf|dl) per (shard|salt, term), emitting sorted varbyte runs.
    */
  private def partitionRuns(it: Iterator[ShardPosting],
                            hotSalts: Map[String, Int]): Iterator[PostingRun] =
    new Iterator[PostingRun] {
      // term → (packed shard|salt → buffer); the inner map has 1 entry for
      // cold terms and nSalts(term) (× shards seen) for hot ones
      private val byTerm =
        new java.util.HashMap[String, java.util.HashMap[java.lang.Long, RunBuf]]()
      private var pending: Iterator[PostingRun] = Iterator.empty
      private def flush(): Iterator[PostingRun] = {
        val out = new ArrayBuffer[PostingRun](byTerm.size)
        val eit = byTerm.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val git = e.getValue.entrySet().iterator()
          while (git.hasNext) {
            val g = git.next()
            out += encodeRun(g.getKey, e.getKey, g.getValue)
          }
        }
        byTerm.clear()
        out.iterator
      }
      // consume input until the flush threshold (bounding task state) or
      // end-of-partition, then stream that flush's runs out
      private def fill(): Unit = {
        var buffered = 0L
        while (it.hasNext && buffered < RunFlushPostings) {
          val pp = it.next()
          val nSalt = hotSalts.getOrElse(pp.term, 1)
          // mask the salt: rangeSalt of a NEGATIVE doc_id is negative, and
          // sign extension would overwrite the shard field (silently
          // merging hot-term postings across shards). All in-repo
          // producers mask doc_id non-negative, but saltedRuns is a
          // public API.
          val gk = (pp.shard.toLong << 32) |
            (rangeSalt(pp.doc_id, nSalt) & 0xFFFFFFFFL)
          var inner = byTerm.get(pp.term)
          if (inner == null) {
            inner = new java.util.HashMap[java.lang.Long, RunBuf](2)
            byTerm.put(pp.term, inner)
          }
          var buf = inner.get(gk)
          if (buf == null) { buf = new RunBuf(8); inner.put(gk, buf) }
          buf.add(pp.doc_id, (pp.tf.toLong << 32) | (pp.dl & 0xFFFFFFFFL))
          buffered += 1
        }
        pending = flush()
      }
      def hasNext: Boolean = {
        while (!pending.hasNext && it.hasNext) fill()
        pending.hasNext
      }
      def next(): PostingRun = {
        if (!hasNext) throw new NoSuchElementException
        pending.next()
      }
    }

  /** Reduce side: k-way-merge the doc_id-sorted runs of one (shard|salt,
    * term) group and chunk the merged stream into encoded blocks — the
    * byte-identical successor of [[encodeRunValues]] (same merge-equal-
    * doc_ids-then-chunk semantics over the same globally sorted stream;
    * runs never interleave equal doc_ids unless the caller fed duplicate
    * (term, doc) rows across partitions, which the merge handles exactly
    * like the old sorted shuffle did). */
  private def mergeRunsEncode(shard: Int, term: String, salt: Int,
                              runs: Array[PostingRun], blockSize: Int,
                              avgdl: Double, k1: Double, b: Double
                             ): Iterator[PostingBlock] = {
    val k = runs.length
    val rd = new Array[Array[Long]](k)
    val rt = new Array[Array[Long]](k)
    val rl = new Array[Array[Long]](k)
    var i = 0
    while (i < k) {
      val r = runs(i)
      rd(i) = VarByte.decodeDeltas(r.docs_vb, r.n)
      rt(i) = VarByte.decode(r.tfs_vb, r.n)
      rl(i) = VarByte.decode(r.dls_vb, r.n)
      i += 1
    }
    if (k == 1)
      // single run (already merged and sorted at map side): chunk directly,
      // no heap — the common case for rare terms and single-partition waves
      return singleRunBlocks(shard, term, salt, rd(0), rt(0), rl(0),
        blockSize, avgdl, k1, b)

    val pos = new Array[Int](k)
    // min-heap of run indices keyed by current doc_id; indices are boxed
    // ONCE here (Integer.valueOf only caches ≤127, and a hot term's group
    // can hold one run per map partition — re-boxing on every re-add would
    // allocate per posting)
    val boxed = Array.tabulate[Integer](k)(Integer.valueOf)
    val heap = new java.util.PriorityQueue[Integer](math.max(1, k),
      (a: Integer, b2: Integer) => java.lang.Long.compare(
        rd(a.intValue())(pos(a.intValue())), rd(b2.intValue())(pos(b2.intValue()))))
    i = 0
    while (i < k) { if (rd(i).nonEmpty) heap.add(boxed(i)); i += 1 }

    new Iterator[PostingBlock] {
      private val docs = new Array[Long](blockSize)
      private val tfs = new Array[Long](blockSize)
      private val dls = new Array[Long](blockSize)
      private var blockId = 0
      def hasNext: Boolean = !heap.isEmpty
      def next(): PostingBlock = {
        var n = 0
        var maxTf = 0
        var maxSat = 0.0
        while (!heap.isEmpty && n < blockSize) {
          var r = heap.poll().intValue()
          val docId = rd(r)(pos(r))
          var tf = rt(r)(pos(r)).toInt
          val dl = rl(r)(pos(r)).toInt
          pos(r) += 1
          if (pos(r) < rd(r).length) heap.add(boxed(r))
          // merge the same doc_id surfacing from any run
          var top = heap.peek()
          while (top != null && rd(top.intValue())(pos(top.intValue())) == docId) {
            r = heap.poll().intValue()
            tf += rt(r)(pos(r)).toInt
            pos(r) += 1
            if (pos(r) < rd(r).length) heap.add(boxed(r))
            top = heap.peek()
          }
          docs(n) = docId; tfs(n) = tf.toLong; dls(n) = dl.toLong
          if (tf > maxTf) maxTf = tf
          val s = tfSat(tf, dl, avgdl, k1, b)
          if (s > maxSat) maxSat = s
          n += 1
        }
        val blk = PostingBlock(
          shard, term, salt, blockId, docs(0), docs(n - 1), n,
          maxTf, maxSat,
          VarByte.encodeDeltas(java.util.Arrays.copyOf(docs, n)),
          VarByte.encode(java.util.Arrays.copyOf(tfs, n)),
          VarByte.encode(java.util.Arrays.copyOf(dls, n)))
        blockId += 1
        blk
      }
    }
  }

  /** Chunk one already-merged, doc_id-sorted run straight into blocks. */
  private def singleRunBlocks(shard: Int, term: String, salt: Int,
                              docsIn: Array[Long], tfsIn: Array[Long],
                              dlsIn: Array[Long], blockSize: Int,
                              avgdl: Double, k1: Double, b: Double
                             ): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private var off = 0
      private var blockId = 0
      def hasNext: Boolean = off < docsIn.length
      def next(): PostingBlock = {
        val n = math.min(blockSize, docsIn.length - off)
        var maxTf = 0
        var maxSat = 0.0
        var i = 0
        while (i < n) {
          val tf = tfsIn(off + i).toInt
          if (tf > maxTf) maxTf = tf
          val s = tfSat(tf, dlsIn(off + i).toInt, avgdl, k1, b)
          if (s > maxSat) maxSat = s
          i += 1
        }
        val blk = PostingBlock(
          shard, term, salt, blockId,
          docsIn(off), docsIn(off + n - 1), n, maxTf, maxSat,
          VarByte.encodeDeltas(java.util.Arrays.copyOfRange(docsIn, off, off + n)),
          VarByte.encode(java.util.Arrays.copyOfRange(tfsIn, off, off + n)),
          VarByte.encode(java.util.Arrays.copyOfRange(dlsIn, off, off + n)))
        off += n
        blockId += 1
        blk
      }
    }

  /** Salt hot terms, generate map-side sorted varbyte runs per (shard|salt,
    * term) (SPIMI, IIR §4.3), shuffle the RUNS, k-way-merge and chunk into
    * blocks at the reduce side. The salt bounds any single group's postings
    * to ~targetPerSalt regardless of term skew; keying by shard lets ONE
    * job process a whole wave of shards. Because the salt is a doc_id RANGE
    * (see [[rangeSalt]]), the emitted blocks of a term are globally
    * non-overlapping and need no downstream merge across salts: this one
    * shuffle is the entire postings build.
    *
    * Shuffle discipline (this exchange IS the build's wire cost at 100 TB):
    * the wire unit is one run per (term, salt) per map partition — the term
    * string travels once per RUN (not once per posting), doc_ids travel as
    * delta+varbyte gaps and tf/dl as varbyte ints (the same codec the final
    * blocks use). Measured at 300k docs / local[8]: 24.2M rows / 303 MiB
    * (row-per-posting sorted shuffle) → ~0.27M rows / ~59 MiB, and the
    * shuffle's sort machinery now orders run rows, not postings — the
    * per-posting sort runs as primitive-array quicksorts inside map tasks.
    * Block output is byte-identical (same per-(term,salt) doc_id-sorted
    * merged stream — asserted by IndexSpec against the old sorted-shuffle
    * path, which survives as [[saltedRunsSortShuffle]]). */
  def saltedRuns(tf: Dataset[ShardPosting], hotDf: Map[String, Long],
                 p: BuildParams, avgdl: Double): Dataset[PostingBlock] = {
    val spark = tf.sparkSession
    import spark.implicits._
    val hotSalts: Map[String, Int] = hotDf.map { case (t, df) =>
      t -> saltCount(df, p.targetPerSalt)
    }
    val bcHot = spark.sparkContext.broadcast(hotSalts)
    val (k1, b, blockSize) = (p.k1, p.b, p.blockSize)
    tf
      .mapPartitions(it => partitionRuns(it, bcHot.value))
      .groupByKey(r => (r.gk, r.term))
      .flatMapGroups { (key: (Long, String), it: Iterator[PostingRun]) =>
        mergeRunsEncode((key._1 >>> 32).toInt, key._2, key._1.toInt,
          it.toArray, blockSize, avgdl, k1, b)
      }
  }

  /** The previous row-per-posting salted sort — kept as the parity
    * reference for [[saltedRuns]] (IndexSpec asserts byte-identical blocks)
    * and as the head-to-head baseline in `Main profile`. */
  private[graft] def saltedRunsSortShuffle(
      tf: Dataset[ShardPosting], hotDf: Map[String, Long],
      p: BuildParams, avgdl: Double): Dataset[PostingBlock] = {
    val spark = tf.sparkSession
    import spark.implicits._
    val hotSalts: Map[String, Int] = hotDf.map { case (t, df) =>
      t -> saltCount(df, p.targetPerSalt)
    }
    val bcHot = spark.sparkContext.broadcast(hotSalts)
    val (k1, b, blockSize) = (p.k1, p.b, p.blockSize)
    tf
      .groupByKey { pp =>
        val n = bcHot.value.getOrElse(pp.term, 1)
        ((pp.shard.toLong << 32) | (rangeSalt(pp.doc_id, n) & 0xFFFFFFFFL), pp.term)
      }
      .mapValues(pp => RunValue(pp.doc_id, (pp.tf.toLong << 32) | pp.dl))
      .flatMapSortedGroups($"doc_id") { case ((gk, term), it) =>
        encodeRunValues((gk >>> 32).toInt, term, gk.toInt, it,
          blockSize, avgdl, k1, b)
      }
  }

  /** The postings build over a wave of shards — ONE shuffle. hotDf =
    * per-shard posting count (approx) of terms above the salt threshold.
    * (Range salting makes a separate merge stage unnecessary; see
    * [[rangeSalt]].) */
  def buildShardPostings(tf: Dataset[ShardPosting], hotDf: Map[String, Long],
                         p: BuildParams, avgdl: Double): Dataset[PostingBlock] =
    saltedRuns(tf, hotDf, p, avgdl)
}
