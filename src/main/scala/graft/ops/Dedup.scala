package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash groupBy), MinHash + LSH banding (shingle → minhash → band →
  * bucket join), SimHash, and token-shingle Jaccard — each with an exact
  * DuckDB oracle twin.
  *
  * Hashing is pluggable ([[HashMode]]): the default [[Md5Portable]] renders
  * every hash as hex MD5 (identical bytes → identical hex in any engine);
  * minima are taken lexicographically on the hex string, and numeric digests
  * are derived from hex digits via base-16 conversion, so no engine-specific
  * hash function leaks into results — which is what gives every operator an
  * exact DuckDB oracle. [[Xx64]] is the production Spark-only path: codegen'd
  * xxhash64 (no MessageDigest allocation, an order of magnitude cheaper per
  * token at 100 TB), rendered as zero-padded two's-complement hex so the
  * column schema and the min/band mechanics are identical — lexicographic
  * order on the padded hex IS unsigned-64 numeric order. The two modes give
  * different (both valid) signatures; oracle queries stay pinned to md5.
  *
  * Scale notes: everything is groupBy/join on (doc_id | term | shingle |
  * band_hash) keys — shuffle-partitioned by key, no driver materialization;
  * LSH banding is exactly the "bucket join beats all-pairs" trick that makes
  * near-dup detection feasible at 10^12 docs (the all-pairs q_jaccard path
  * is restricted to pairs already sharing a shingle, i.e. an equi-join, not
  * a cross join).
  */
object Dedup {

  /** Hash implementation selector — see the object doc. */
  sealed trait HashMode
  /** Hex MD5 (DuckDB-oracle-portable; the default). */
  case object Md5Portable extends HashMode
  /** Codegen'd xxhash64 as zero-padded hex (production; no SQL twin). */
  case object Xx64 extends HashMode

  /** 16-hex-char digest of `c` under `mode`, lexicographically orderable in
    * both modes (md5 prefix / unsigned-64 padded hex). Xx64 renders via
    * lpad(hex(..)) — pure codegen'd string ops; format_string("%016x")
    * spins up a java.util.Formatter per row and measured SLOWER than md5,
    * defeating the point of the production path. */
  private def hashHex(c: Column, mode: HashMode): Column = mode match {
    case Md5Portable => substring(md5(c.cast("binary")), 1, 16)
    case Xx64 => lower(lpad(hex(xxhash64(c)), 16, "0"))
  }

  private def md5s(c: Column): Column = md5(c.cast("binary"))

  // ---- typed signature kernel (shared by the fast paths of BOTH modes) ---

  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8

  /** First 8 digest bytes as a big-endian long — unsigned order on this
    * long IS lexicographic order on the digest's lowercase 16-hex-char
    * prefix, so minima can stay raw longs until the winner is rendered. */
  private def prefix64(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)

  /** Zero-padded lowercase 16-hex render — the exact bytes the Column forms
    * emit (md5-hex prefix / lpad(hex(xxhash64))). */
  private def hex16(h: Long): String = {
    val hx = java.lang.Long.toHexString(h)
    "0" * (16 - hx.length) + hx
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Full lowercase 32-hex render of a 16-byte digest (the band/prefix
    * hashes are FULL md5 hex in Md5Portable mode). */
  private def hex32(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Per-doc md5 seed minima over tokens of `text` (hash input
    * "$sd:$token"), kept as unsigned 64-bit digest prefixes. Returns null
    * for docs with no tokens — identical empty-doc semantics to the Column
    * forms. `md`/`dig` are per-partition scratch (MessageDigest.digest into
    * a reused 16-byte buffer — no allocation per hash). */
  private def md5Minima(text: String, prefixes: Array[Array[Byte]],
                        md: java.security.MessageDigest,
                        dig: Array[Byte]): Array[Long] = {
    val nSeeds = prefixes.length
    val toks = if (text == null) Array.empty[String] else text.split(' ')
    val mins = Array.fill(nSeeds)(-1L) // unsigned max
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        any = true
        val tb = t.getBytes(UTF8)
        var sd = 0
        while (sd < nSeeds) {
          md.reset()
          md.update(prefixes(sd))
          md.update(tb)
          md.digest(dig, 0, 16)
          val h = prefix64(dig)
          if (java.lang.Long.compareUnsigned(h, mins(sd)) < 0) mins(sd) = h
          sd += 1
        }
      }
      i += 1
    }
    if (any) mins else null
  }

  /** Growable per-partition byte scratch for the xx64 kernel. */
  private final class Scratch { var buf = new Array[Byte](64) }

  /** Per-doc xx64 seed minima (hash input "$sd:$token" through the same
    * XXH64(seed=42) Spark's `xxhash64` uses). Returns null for empty docs. */
  private def xx64Minima(text: String, prefixes: Array[Array[Byte]],
                         sc: Scratch): Array[Long] = {
    val nSeeds = prefixes.length
    val toks = if (text == null) Array.empty[String] else text.split(' ')
    val mins = Array.fill(nSeeds)(-1L) // unsigned max
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        any = true
        val tb = t.getBytes(UTF8)
        var sd = 0
        while (sd < nSeeds) {
          val p = prefixes(sd)
          val len = p.length + tb.length
          if (sc.buf.length < len) sc.buf = new Array[Byte](len * 2)
          System.arraycopy(p, 0, sc.buf, 0, p.length)
          System.arraycopy(tb, 0, sc.buf, p.length, tb.length)
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(sc.buf,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
          if (java.lang.Long.compareUnsigned(h, mins(sd)) < 0) mins(sd) = h
          sd += 1
        }
      }
      i += 1
    }
    if (any) mins else null
  }

  /** Exact dedup groups: content hash → group size + canonical (min) id.
    *
    * Both modes key on a 128-bit digest: EXACT dedup merges groups by hash
    * equality alone, and a single 64-bit key collides ~10^4 times by
    * birthday at the 10^12-doc design point — each collision silently
    * dropping a distinct document. The Xx64 key is therefore two
    * independent 64-bit streams (xxhash64 of the text and of its reverse —
    * the Column API pins the seed, so the second stream comes from the
    * reversed input), concatenated to the same 32-hex width as md5. */
  def exact(docs: DataFrame, hash: HashMode = Md5Portable): DataFrame = {
    val h = hash match {
      case Md5Portable => md5s(col("text")) // full 32-hex digest (pinned oracle shape)
      case Xx64 => concat(hashHex(col("text"), Xx64),
        lower(lpad(hex(xxhash64(reverse(col("text")))), 16, "0")))
    }
    docs.groupBy(h.as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
  }

  /** Per-(doc, seed) MinHash: min over tokens of hash(seed:term).
    * Set semantics are automatic (min over duplicates = min over set).
    *
    * ZERO-shuffle: a signature is a min over the doc's OWN tokens, so it
    * never needs a (doc_id) aggregation at all — each row computes all
    * nSeeds minima narrowly with `array_min(transform(tokens, …))`. Round
    * 2's one-shuffle groupBy was already 8× better than the tokens×seeds
    * crossJoin, but it still pushed the whole token relation through an
    * exchange; measured at 100k pages (~10M tokens) the shuffle dominated
    * the hash cost. This shape is map-only — at 10^12 docs the operator
    * costs exactly one pass over the corpus. */
  def minhash(docs: DataFrame, nSeeds: Int = 8,
              hash: HashMode = Md5Portable): DataFrame = hash match {
    // both modes route to zero-shuffle typed passes, byte-identical to
    // their Column forms (parity-tested); the Column forms survive as the
    // oracle shapes / parity references
    case Md5Portable => minhashFastMd5(docs, nSeeds)
    case Xx64 => minhashFast(docs, nSeeds)
  }

  /** Typed fast path for [[minhash]] in [[Md5Portable]] mode —
    * byte-identical to [[minhashColumnar]] (parity-tested): same md5 of
    * "$sd:$token", minima compared as unsigned digest prefixes (≡
    * lexicographic hex minima), same empty-doc semantics. Removes the
    * per-(token × seed) hex-string render and `transform`/`array_min`
    * machinery the Column form pays — the md5 twin of [[minhashFast]]. */
  def minhashFastMd5(docs: DataFrame, nSeeds: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = new Array[Byte](16)
        val prefixes = Array.tabulate(nSeeds)(sd => s"$sd:".getBytes(UTF8))
        it.flatMap { case (id, text) =>
          val mins = md5Minima(text, prefixes, md, dig)
          if (mins == null) Iterator.empty
          else (0 until nSeeds).iterator.map(sd => (id, sd.toLong, hex16(mins(sd))))
        }
      }.toDF("doc_id", "seed", "minhash")
  }

  /** The Column-function form of [[minhash]] — the md5 oracle shape, and
    * the parity reference the fast path is tested against. */
  private[graft] def minhashColumnar(docs: DataFrame, nSeeds: Int = 8,
                                     hash: HashMode = Md5Portable): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val minima = (0 until nSeeds).map { sd =>
      array_min(transform(col("toks"),
        t => hashHex(concat(lit(s"$sd:"), t), hash)))
    }
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0) // empty docs have no signature
      .select(col("doc_id"), posexplode(array(minima: _*)))
      .select(col("doc_id"), col("pos").cast("long").as("seed"),
        col("col").as("minhash"))
  }

  /** Production fast path for [[minhash]] in [[Xx64]] mode — byte-identical
    * output (property-tested in SearchOpsSpec), one typed pass.
    *
    * Why it exists: with both modes warmed, the bench measured the Column
    * forms at parity (~12 s / 100k pages) — the per-token hash is NOT the
    * bottleneck; the `transform`-array machinery is, because it renders a
    * 16-char hex string per (token × seed) and takes `array_min` over
    * STRINGS. This pass keeps the minima as raw longs compared UNSIGNED
    * (identical order to the padded-hex lexicographic min), hashes
    * prefix+token bytes directly with the same XXH64(seed=42) Spark's
    * `xxhash64` uses (driver-twin parity is the already-tested
    * Bm25.termBucket pattern), and renders exactly nSeeds hex strings per
    * document. Measured **15×** faster than either Column form (2.4 s vs
    * ~35 s for 300k pages / 252M token-seed hashes ≈ 106M hashes/s; bench
    * key minhash_xx64_sec vs minhash_xx64_columnar_sec). mapPartitions is
    * justified here by the brief's own escape hatch: genuine per-partition
    * imperative logic that the Column form demonstrably cannot match. */
  def minhashFast(docs: DataFrame, nSeeds: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val prefixes = Array.tabulate(nSeeds)(sd => s"$sd:".getBytes(UTF8))
        val sc = new Scratch
        it.flatMap { case (id, text) =>
          val mins = xx64Minima(text, prefixes, sc)
          if (mins == null) Iterator.empty // empty docs have no signature
          else (0 until nSeeds).iterator.map(sd => (id, sd.toLong, hex16(mins(sd))))
        }
      }.toDF("doc_id", "seed", "minhash")
  }

  /** Typed fast path for the LSH-forest prefix relation (doc_id, r, ph),
    * r = 1..nSeeds, ph = full md5 of the comma-joined minima hex strings of
    * seeds 0..r−1 — byte-identical to MinHashSearch.prefixes ∘ md5-minhash
    * (parity-tested) and ZERO-shuffle: prefixes are a function of the doc's
    * own signature, so the crossJoin + per-depth collect_list groupBy
    * machinery (36 shuffled rows per doc) collapses into one map pass. */
  def minhashPrefixesFastMd5(docs: DataFrame, nSeeds: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = new Array[Byte](16)
        val prefixes = Array.tabulate(nSeeds)(sd => s"$sd:".getBytes(UTF8))
        val sb = new java.lang.StringBuilder(nSeeds * 17)
        it.flatMap { case (id, text) =>
          val mins = md5Minima(text, prefixes, md, dig)
          if (mins == null) Iterator.empty
          else {
            sb.setLength(0)
            (1 to nSeeds).iterator.map { r =>
              if (r > 1) sb.append(',')
              sb.append(hex16(mins(r - 1)))
              val joined = sb.toString.getBytes(UTF8)
              md.reset(); md.update(joined); md.digest(dig, 0, 16)
              (id, r.toLong, hex32(dig))
            }
          }
        }
      }.toDF("doc_id", "r", "ph")
  }

  /** LSH bands over the minhash signature: rows-per-band = 2, band hash =
    * hash of the band's minima concatenated in seed order (deterministic via
    * array_sort on (seed, minhash) structs). */
  def lshBands(docs: DataFrame, nSeeds: Int = 8, rowsPerBand: Int = 2,
               hash: HashMode = Md5Portable): DataFrame =
    lshBandsFast(docs, nSeeds, rowsPerBand, hash)

  /** The relational form of [[lshBands]] — the DuckDB oracle's shape and
    * the parity reference for [[lshBandsFast]]. */
  private[graft] def lshBandsColumnar(docs: DataFrame, nSeeds: Int = 8,
                                      rowsPerBand: Int = 2,
                                      hash: HashMode = Md5Portable): DataFrame = {
    val bandCol = array_join(
      transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
        x => x.getField("minhash")), ",")
    val bandHash = hash match {
      case Md5Portable => md5s(bandCol) // full digest (pinned oracle shape)
      case Xx64 => hashHex(bandCol, Xx64)
    }
    minhashColumnar(docs, nSeeds, hash)
      .withColumn("band", (col("seed") / rowsPerBand).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(bandHash.as("band_hash"))
  }

  /** Typed fast path for [[lshBands]] — byte-identical to the relational
    * form in BOTH modes (parity-tested) and ZERO-shuffle: a doc's bands are
    * a function of its OWN signature, so the signature groupBy AND the band
    * groupBy both disappear; one map pass emits (doc_id, band, band_hash)
    * directly. Band hash input is the comma-join of the band's minima hex
    * strings in seed order (what the array_sort(struct(seed, minhash))
    * collect produces); Md5Portable hashes it with full-width md5, Xx64
    * with xxhash64 rendered as padded hex. */
  def lshBandsFast(docs: DataFrame, nSeeds: Int = 8, rowsPerBand: Int = 2,
                   hash: HashMode = Md5Portable): DataFrame = {
    import docs.sparkSession.implicits._
    val isMd5 = hash == Md5Portable
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = new Array[Byte](16)
        val prefixes = Array.tabulate(nSeeds)(sd => s"$sd:".getBytes(UTF8))
        val sc = new Scratch
        val sb = new java.lang.StringBuilder(nSeeds * 17)
        it.flatMap { case (id, text) =>
          val mins =
            if (isMd5) md5Minima(text, prefixes, md, dig)
            else xx64Minima(text, prefixes, sc)
          if (mins == null) Iterator.empty
          else {
            val nBands = (nSeeds + rowsPerBand - 1) / rowsPerBand
            (0 until nBands).iterator.map { b =>
              sb.setLength(0)
              var sd = b * rowsPerBand
              val end = math.min(nSeeds, sd + rowsPerBand)
              while (sd < end) {
                if (sd > b * rowsPerBand) sb.append(',')
                sb.append(hex16(mins(sd)))
                sd += 1
              }
              val joined = sb.toString.getBytes(UTF8)
              val bh =
                if (isMd5) {
                  md.reset(); md.update(joined); md.digest(dig, 0, 16)
                  hex32(dig)
                } else hex16(org.apache.spark.sql.catalyst.expressions.XXH64
                  .hashUnsafeBytes(joined,
                    org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                    joined.length, 42L))
              (id, b.toLong, bh)
            }
          }
        }
      }.toDF("doc_id", "band", "band_hash")
  }

  /** Candidate near-dup pairs: docs sharing any band bucket.
    *
    * Bucket-size cap (the 100 TB guard): a bucket of m members emits m²/2
    * pairs, so one degenerate mega-bucket (e.g. the empty-ish-doc band) makes
    * the output quadratic in corpus size. Buckets with more than `maxBucket`
    * members are dropped whole before the self-join — at that size the bucket
    * carries no near-dup signal anyway (it's a collision cluster), and the
    * cap makes the operator's output linear in the input. Deterministic and
    * SQL-expressible (QUALIFY count(*) OVER bucket <= cap), so the oracle
    * applies the identical cap. */
  def lshPairs(docs: DataFrame, nSeeds: Int = 8, rowsPerBand: Int = 2,
               maxBucket: Int = 50, hash: HashMode = Md5Portable): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    val bands = lshBands(docs, nSeeds, rowsPerBand, hash)
      .withColumn("bn", count(lit(1)).over(w))
      .filter(col("bn") <= maxBucket)
    val a = bands.select(col("band").as("band_a"), col("band_hash").as("bh_a"),
      col("doc_id").as("doc_a"))
    val b = bands.select(col("band").as("band_b"), col("band_hash").as("bh_b"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band_a") === col("band_b") && col("bh_a") === col("bh_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** 32-bit SimHash from MD5 hex digits: for hex position p (1..8) and bit
    * j (0..3), the signed tf-weighted bit vote decides the output bit.
    *
    * Production route = [[simhashFast]]: ONE map-only typed pass
    * (tf via a per-doc hash map, votes accumulated in a 32-slot array),
    * bit-identical to the relational form — which survives as
    * [[simhashColumnar]], the parity reference and the DuckDB oracle's
    * shape. The relational plan costs two shuffles (the (doc,term) tf
    * aggregation, then the (doc,bit) vote aggregation over a 32-way
    * row multiplication); at corpus scale simhash is a signature pass and
    * must cost one scan, like minhash. */
  def simhash(docs: DataFrame): DataFrame = simhashFast(docs)

  /** Zero-shuffle SimHash — bit-identical to [[simhashColumnar]]
    * (parity-tested): same lowercase-hex MD5, same hex-digit/bit vote
    * arithmetic, integer end-to-end. */
  def simhashFast(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String] else text.split(' ')
          val tf = new java.util.HashMap[String, Int]()
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            if (t.nonEmpty) tf.merge(t, 1, Integer.sum _)
            i += 1
          }
          if (tf.isEmpty) Iterator.empty
          else {
            val votes = new Array[Long](32)
            tf.forEach { (t, n) =>
              md.reset()
              val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              // hex digit p (0-based 0..7) = nibble of byte p/2, high first —
              // exactly substr(md5hex, p+1, 1) of the relational form
              var p = 0
              while (p < 8) {
                val b = dig(p / 2) & 0xFF
                val v = if (p % 2 == 0) b >>> 4 else b & 0xF
                var j = 0
                while (j < 4) {
                  votes(p * 4 + j) += n.toLong * (((v >> j) & 1) * 2 - 1)
                  j += 1
                }
                p += 1
              }
            }
            var sim = 0L
            var b = 0
            while (b < 32) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
            Iterator.single((id, sim))
          }
        }
      }.toDF("doc_id", "simhash")
  }

  /** The relational SimHash — the oracle shape and parity reference. */
  private[graft] def simhashColumnar(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val tf = TextOps.termFreq(docs)
      .withColumn("hx", md5s(col("term")))
    val pj = spark.range(1, 9).toDF("p")
      .crossJoin(spark.range(0, 4).toDF("j"))
    tf.crossJoin(broadcast(pj))
      .withColumn("v",
        conv(col("hx").substr(col("p").cast("int"), lit(1)), 16, 10).cast("int"))
      .withColumn("bit", ((col("p") - 1) * 4 + col("j")).cast("int"))
      .withColumn("vote", col("tf") *
        (expr("shiftright(v, cast(j as int))").bitwiseAND(1) * 2 - 1))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), bit)")).otherwise(0L)).as("simhash"))
  }

  /** Distinct token n-gram shingles per doc — a NARROW array slide: the
    * token array is built per row, windows of n are concatenated with
    * `transform` over a `sequence` of start offsets, de-duplicated with
    * `array_distinct`, then exploded. Zero shuffles before the downstream
    * aggregation (the previous 3-way self-join of the exploded token table
    * shuffled the full token relation twice for the same output — pure
    * waste at corpus scale). The relational self-join form survives only in
    * the DuckDB oracle (SparkEntry SH), which is exactly the cross-engine
    * check that this slide emits the same shingle set. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = shinglesFast(docs, n)

  /** Typed production route for [[shingles]] — identical (doc_id, shingle)
    * set (parity-tested), one pass, no per-window HOF expression tree: the
    * Column slide allocates a sliced array + concat per window through the
    * `transform` machinery; here a single reused StringBuilder emits each
    * window and a per-doc HashSet de-duplicates. Measured 1.6× on 100k
    * pages (Main shinglebench: 7.1 s Column vs 4.4 s typed, warmed) — a
    * smaller win than the signature passes because the output IS the
    * strings either way; the HOF overhead is what goes away. */
  def shinglesFast(docs: DataFrame, n: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val sb = new java.lang.StringBuilder(128)
        it.flatMap { case (id, text) =>
          val toks =
            if (text == null) Array.empty[String]
            else text.split(' ').filter(_.nonEmpty)
          if (toks.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[String]()
            (0 to toks.length - n).iterator.flatMap { i =>
              sb.setLength(0)
              var k = 0
              while (k < n) {
                if (k > 0) sb.append(' ')
                sb.append(toks(i + k))
                k += 1
              }
              val s = sb.toString
              if (seen.add(s)) Iterator.single((id, s)) else Iterator.empty
            }
          }
        }
      }.toDF("doc_id", "shingle")
  }

  /** The Column-slide form of [[shingles]] — the parity reference (the
    * relational 3-way-join form lives only in the DuckDB oracle). */
  private[graft] def shinglesColumnar(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))).as("shingle"))
  }

  /** n-gram Jaccard near-dup pairs (≥ threshold), via shingle equi-join —
    * never an all-pairs product.
    *
    * Hot-shingle cap (the 100 TB guard, same trade as [[lshPairs]]'s bucket
    * cap): a shingle appearing in m docs emits m²/2 join rows, so ONE
    * boilerplate trigram ("click here to", a license header line) shared by
    * the whole corpus makes the output quadratic in corpus size. Shingles
    * with df > `maxDf` are dropped from the shingle universe BEFORE both
    * the join and the per-doc set sizes: Jaccard is then estimated over the
    * non-boilerplate shingles — the standard dedup trade (pairs that only
    * share boilerplate stop matching; genuinely similar pairs still match
    * on their distinctive shingles). Deterministic and QUALIFY-expressible,
    * so the DuckDB oracle applies the identical cap. The threshold
    * predicate is a ratio of integers, so it is bit-deterministic across
    * engines. */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.2,
                   maxDf: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    val sh = shingles(docs)
      .withColumn("df", count(lit(1)).over(w))
      .filter(col("df") <= maxDf).drop("df")
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jac_raw", col("i") * lit(1.0) / (col("na") + col("nb") - col("i")))
      .filter(col("jac_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac_raw"), 6).as("jaccard"))
  }

  /** Document fingerprint: lexicographic min MD5 over the doc's shingles
    * (a winnowing-style rolling-window fingerprint, window = whole doc). */
  def fingerprint(docs: DataFrame): DataFrame = fingerprintFast(docs)

  /** The relational form of [[fingerprint]] — parity reference (the oracle
    * computes the same min over the SH CTE). */
  private[graft] def fingerprintColumnar(docs: DataFrame): DataFrame =
    shinglesColumnar(docs).groupBy(col("doc_id"))
      .agg(min(md5s(col("shingle"))).as("fingerprint"))

  /** Typed fast path for [[fingerprint]] — byte-identical (parity-tested)
    * and ZERO-shuffle: the min-md5 is a function of the doc's own shingle
    * windows, so the shingle strings never leave the map task (no explode,
    * no groupBy; min over duplicate shingles equals min over the set). */
  def fingerprintFast(docs: DataFrame, n: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = new Array[Byte](16)
        val best = new Array[Byte](16)
        val sb = new java.lang.StringBuilder(128)
        it.flatMap { case (id, text) =>
          val toks =
            if (text == null) Array.empty[String]
            else text.split(' ').filter(_.nonEmpty)
          if (toks.length < n) Iterator.empty
          else {
            var anyBest = false
            var i = 0
            while (i <= toks.length - n) {
              sb.setLength(0)
              var k = 0
              while (k < n) {
                if (k > 0) sb.append(' ')
                sb.append(toks(i + k))
                k += 1
              }
              md.reset()
              md.update(sb.toString.getBytes(UTF8))
              md.digest(dig, 0, 16)
              // unsigned lexicographic digest compare ≡ hex-string min
              var cmp = 0
              var j = 0
              while (cmp == 0 && j < 16) {
                cmp = (dig(j) & 0xFF) - (if (anyBest) best(j) & 0xFF else 0x100)
                j += 1
              }
              if (cmp < 0) { System.arraycopy(dig, 0, best, 0, 16); anyBest = true }
              i += 1
            }
            Iterator.single((id, hex32(best)))
          }
        }
      }.toDF("doc_id", "fingerprint")
  }

  // --- tf-weighted MinHash ---------------------------------------------

  /** tf-WEIGHTED MinHash signature — the Spark-native analog of the
    * reference's datasketch WeightedMinHash index (index/index.py:30-60;
    * there the weights came from the out-of-scope NN encoder, here the
    * natural corpus weights are term frequencies). Uses integer-weight
    * replication: a doc is the multiset {(term, rep) : 0 ≤ rep < tf(term)},
    * and plain MinHash over that expanded set estimates the WEIGHTED
    * Jaccard  J_w(A,B) = Σ_t min(tf_A,tf_B) / Σ_t max(tf_A,tf_B)  exactly
    * (for integer weights the expansion IS the multiset union/intersection).
    * Hash input is "$seed:$rep:$term" — the two numeric prefixes make the
    * encoding prefix-free, so distinct (seed, rep, term) triples never
    * collide as strings.
    *
    * Scale: total replicated rows per doc = Σ_t tf = doc length, i.e. the
    * SAME work as unweighted [[minhash]] does over token instances — the
    * weighting is free. Output shape matches [[minhash]]:
    * (doc_id, seed, minhash); empty docs have no signature. */
  def weightedMinhash(docs: DataFrame, nSeeds: Int = 8,
                      hash: HashMode = Md5Portable): DataFrame = hash match {
    // both modes route to zero-shuffle typed passes (parity-tested); the
    // Column form keeps two shuffles and survives as the oracle shape
    case Md5Portable => weightedMinhashFastMd5(docs, nSeeds)
    case Xx64 => weightedMinhashFast(docs, nSeeds)
  }

  /** Typed fast path for [[weightedMinhash]] in [[Md5Portable]] mode —
    * byte-identical to [[weightedMinhashColumnar]] (parity-tested), ZERO
    * shuffle: tf from a per-doc HashMap, md5("$sd:$rep:$term") minima kept
    * as unsigned digest prefixes, only the nSeeds winners rendered. Drops
    * the columnar form's TWO shuffles (tf groupBy + signature groupBy) and
    * its per-(instance × seed) hex render — the md5 twin of
    * [[weightedMinhashFast]]. */
  def weightedMinhashFastMd5(docs: DataFrame, nSeeds: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = new Array[Byte](16)
        // "$sd:$rep:" prefix bytes, cached for rep < 64 (same cache shape
        // as the xx64 fast path)
        val cache = Array.ofDim[Array[Byte]](nSeeds, 64)
        def prefix(sd: Int, rep: Int): Array[Byte] =
          if (rep < 64) {
            var p = cache(sd)(rep)
            if (p == null) { p = s"$sd:$rep:".getBytes(UTF8); cache(sd)(rep) = p }
            p
          } else s"$sd:$rep:".getBytes(UTF8)
        it.flatMap { case (id, text) =>
          val tf = new java.util.HashMap[String, Integer]()
          val toks = if (text == null) Array.empty[String] else text.split(' ')
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            if (t.nonEmpty) tf.merge(t, 1, (a: Integer, b: Integer) => a + b)
            i += 1
          }
          if (tf.isEmpty) Iterator.empty
          else {
            val mins = Array.fill(nSeeds)(-1L) // unsigned max
            val e = tf.entrySet().iterator()
            while (e.hasNext) {
              val ent = e.next()
              val tb = ent.getKey.getBytes(UTF8)
              val n = ent.getValue.intValue()
              var rep = 0
              while (rep < n) {
                var sd = 0
                while (sd < nSeeds) {
                  md.reset()
                  md.update(prefix(sd, rep))
                  md.update(tb)
                  md.digest(dig, 0, 16)
                  val h = prefix64(dig)
                  if (java.lang.Long.compareUnsigned(h, mins(sd)) < 0) mins(sd) = h
                  sd += 1
                }
                rep += 1
              }
            }
            (0 until nSeeds).iterator.map(sd => (id, sd.toLong, hex16(mins(sd))))
          }
        }
      }.toDF("doc_id", "seed", "minhash")
  }

  /** Column-function form of [[weightedMinhash]] — the md5 oracle shape
    * (tf via groupBy + sequence explode mirrors the DuckDB twin's
    * generate-series expansion) and the parity reference for the fast
    * path. */
  private[graft] def weightedMinhashColumnar(docs: DataFrame, nSeeds: Int = 8,
                                             hash: HashMode = Md5Portable): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val reps = tf.select(col("doc_id"), col("term"),
      explode(sequence(lit(0L), col("tf") - 1)).as("rep"))
    val minima = (0 until nSeeds).map { sd =>
      min(hashHex(concat(lit(s"$sd:"), col("rep").cast("string"), lit(":"),
        col("term")), hash)).as(s"m$sd")
    }
    reps.groupBy(col("doc_id")).agg(minima.head, minima.tail: _*)
      .select(col("doc_id"), posexplode(array((0 until nSeeds).map(sd => col(s"m$sd")): _*)))
      .select(col("doc_id"), col("pos").cast("long").as("seed"),
        col("col").as("minhash"))
  }

  /** Production fast path for [[weightedMinhash]] in [[Xx64]] mode —
    * byte-identical to the columnar form (parity-tested), ZERO shuffle:
    * tf comes from a per-doc HashMap (O(doc) state, the same map-side
    * pre-merge trick as the index build's docTermFreqs), minima stay raw
    * unsigned longs, and only the nSeeds winners are rendered as hex.
    * The columnar form pays TWO shuffles (tf groupBy + signature groupBy)
    * and renders a hex string per (instance × seed) — the same
    * string-machinery tax that made [[minhashFast]] 15× faster. */
  def weightedMinhashFast(docs: DataFrame, nSeeds: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        var buf = new Array[Byte](64)
        // "$sd:$rep:" prefix bytes, cached for rep < 64 (covers all but
        // pathological tf; larger reps build the prefix on the fly)
        val cache = Array.ofDim[Array[Byte]](nSeeds, 64)
        def prefix(sd: Int, rep: Int): Array[Byte] =
          if (rep < 64) {
            var p = cache(sd)(rep)
            if (p == null) { p = s"$sd:$rep:".getBytes(utf8); cache(sd)(rep) = p }
            p
          } else s"$sd:$rep:".getBytes(utf8)
        it.flatMap { case (id, text) =>
          val tf = new java.util.HashMap[String, Integer]()
          val toks = if (text == null) Array.empty[String] else text.split(' ')
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            if (t.nonEmpty) tf.merge(t, 1, (a: Integer, b: Integer) => a + b)
            i += 1
          }
          if (tf.isEmpty) Iterator.empty
          else {
            val mins = Array.fill(nSeeds)(-1L) // unsigned max
            val e = tf.entrySet().iterator()
            while (e.hasNext) {
              val ent = e.next()
              val tb = ent.getKey.getBytes(utf8)
              val n = ent.getValue.intValue()
              var rep = 0
              while (rep < n) {
                var sd = 0
                while (sd < nSeeds) {
                  val p = prefix(sd, rep)
                  val len = p.length + tb.length
                  if (buf.length < len) buf = new Array[Byte](len * 2)
                  System.arraycopy(p, 0, buf, 0, p.length)
                  System.arraycopy(tb, 0, buf, p.length, tb.length)
                  val h = org.apache.spark.sql.catalyst.expressions.XXH64
                    .hashUnsafeBytes(buf,
                      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
                  if (java.lang.Long.compareUnsigned(h, mins(sd)) < 0) mins(sd) = h
                  sd += 1
                }
                rep += 1
              }
            }
            (0 until nSeeds).iterator.map { sd =>
              val hx = java.lang.Long.toHexString(mins(sd))
              (id, sd.toLong, "0" * (16 - hx.length) + hx)
            }
          }
        }
      }.toDF("doc_id", "seed", "minhash")
  }

  /** Weighted-Jaccard near-dup pairs from [[weightedMinhash]] signatures:
    * candidates are docs sharing any (seed, minhash) bucket (the
    * reference's l=1 LSH-forest probe shape, index/index.py:31-33), the
    * estimate is the agreeing-seed fraction — an unbiased estimator of the
    * weighted Jaccard. Bucket-size cap = the same 100 TB quadratic-output
    * guard as [[lshPairs]]; the agreement join costs nSeeds rows per
    * candidate pair, linear in the candidate set. The threshold predicate
    * compares agree/nSeeds, a ratio of small integers — bit-deterministic
    * across engines. */
  def weightedJaccardPairs(docs: DataFrame, threshold: Double = 0.25,
                           nSeeds: Int = 8, maxBucket: Int = 50,
                           hash: HashMode = Md5Portable): DataFrame = {
    val sig = weightedMinhash(docs, nSeeds, hash)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seed"), col("minhash"))
    val capped = sig.withColumn("bn", count(lit(1)).over(w))
      .filter(col("bn") <= maxBucket)
    val cand = capped.select(col("seed"), col("minhash"), col("doc_id").as("doc_a"))
      .join(capped.select(col("seed"), col("minhash"), col("doc_id").as("doc_b")),
        Seq("seed", "minhash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(sig.select(col("doc_id").as("doc_a"), col("seed"),
        col("minhash").as("ma")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("seed"),
        col("minhash").as("mb")), Seq("doc_b", "seed"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("agree"))
      .withColumn("wjac_est", col("agree") * lit(1.0) / nSeeds)
      .filter(col("wjac_est") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("wjac_est"), 6).as("wjaccard"))
  }
}
