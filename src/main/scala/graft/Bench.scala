package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.data.{Page, Synth}
import graft.index.{BuildParams, InvertedIndex}
import graft.query.Bm25

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Emits a cumulative JSON line after EVERY phase (pages gen, each build
  * rep, query suite) — a late crash still leaves the last-printed line as
  * valid benchmark evidence. The final line is the complete result:
  *   {"metric":"total","value":<sum query sec>,"unit":"sec",
  *    "queries":{<name>:sec,...},"errors":{<name>:"Exc: msg"},"sf":"<dir>"}
  * where `queries` also carries the north-rule scaling evidence as
  * pseudo-queries:
  *   index_build_p{N}_sec / index_build_p{4N}_sec — same BenchDocs parquet
  *     input, identical build params, local[N] vs local[4N]
  *   index_docs_per_sec_p{N} / _p{4N}, scaling_efficiency
  *     (eff = (docs/s @4N) / (docs/s @N) / 4; north rule: ≥ 0.8)
  *   bm25_query_avg_sec — mean latency over the reference query set
  *     against the BenchDocs index.
  *
  * N defaults to 2 (so the pair is local[2] vs local[8]): the sandbox VM's
  * 32 vCPUs share physical cores with invisible neighbors (firecracker
  * reports no steal time), and when neighbors leave only ~8-12 effective
  * cores, local[32] THRASHES — measured 414 s at local[32] vs 352 s at
  * local[8] on identical input. An N→4N pair that fits inside the
  * effective-core envelope measures the ENGINE's scaling, not the
  * neighbors'. Override with SPARK_GRAFT_CORES_LOW=8 on an idle box.
  *
  * Exit code: nonzero if any operator query threw (the exception is
  * recorded in `errors`, never swallowed into a bare -1).
  */
object Bench {

  private val BenchDocs =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "300000").toLong
  /** Effective build size after the host pre-flight (phase 0): on a
    * degraded host the whole bench runs at reduced scale so EVERY phase
    * completes — a complete artifact at 50k docs beats a truncated one at
    * 300k (BENCH_r03/r04 failure mode: rep-0 alone ate the budget on a
    * collapsed box and starved reps, (8,32), WAND and hash phases). */
  private var EffDocs = BenchDocs
  /** Sandbox hosts show up-to-8× noisy-neighbor variance (identical runs:
    * 18s vs 145s, GC 1s vs 27s). Scaling runs therefore ALTERNATE between
    * the two parallelism levels and report the per-level minimum — the
    * standard noise-robust throughput estimator. */
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
  private val CoresLow =
    sys.env.getOrElse("SPARK_GRAFT_CORES_LOW", "2").toInt
  private val CoresHigh = 4 * CoresLow

  /** WAND-phase query set. Block-max pruning needs posting lists with MANY
    * blocks and a high-impact term to set theta — the planted refTitles
    * terms occur O(1) times (1-2 blocks each; theta can't even form below
    * k postings), which is why they are the wrong probe here. These mix
    * hot vocabulary terms (w1 ≈ 92% df → thousands of blocks whose bounds
    * a rare term's theta can clear) with mid and rare terms — the classic
    * WAND-winning shape. */
  private val WandQueries = Seq(
    "numpy python matrix w1", // rare planted terms + the hottest term
    "w1 w3 the0",             // all-hot: stress the no-pruning worst case
    "w13 w40 w120 w300",      // mid-df mix
    "timezone w2 w90",        // rare + hot + mid
    "w7 w20 w45 w200")

  /** All bench I/O (shuffle spill, scratch, index dirs) lives on tmpfs.
    * The sandbox's one virtio disk is a serial resource that collapses
    * under 32 concurrent writers (cumulative sys-time 1.75× user-time;
    * dd during a build could not finish 1 GiB in 120 s). A real N-node
    * cluster brings N nodes' worth of local disks, so storage bandwidth
    * scales WITH the cluster; RAM-backed scratch is the faithful
    * single-box stand-in, making the N→4N comparison measure compute
    * scaling, not one shared virtio queue. */
  private val ShmBase = "/dev/shm/graft_bench"

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.local.dir", s"$ShmBase/spark_local")
      // 2× cores: headroom for skewed shuffle groups without oversplitting
      .config("spark.sql.shuffle.partitions", 2 * cores)
      // small-scale input must still split wide enough to feed every core
      // (default 128m would give a 300 MB corpus ~3 map tasks at any level)
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE must not undo the parallelism the scaling test measures
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  // ---- host-calibration probe -----------------------------------------
  // The sandbox host intermittently collapses under invisible neighbors
  // (BENCH_r03: local[8] measured SLOWER than local[2] on identical code
  // that scales 0.93 in a clean window). Every cumulative JSON line
  // therefore carries a pure-JVM probe: the absolute 1-thread time of a
  // fixed workload plus the 8-thread scaling of that same workload — a
  // contaminated run is self-evident from the artifact alone (probe_t1
  // far above its own minimum, scale8 far below 8), with no Spark, no I/O,
  // no allocation in the measured loop.
  @volatile private var probeSink = 0L
  private def spin(units: Long): Unit = {
    var s = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < units) { s = graft.data.Synth.mix64(s); i += 1 }
    probeSink ^= s // defeat dead-code elimination
  }
  private val ProbeUnits = 50000000L // ~0.25 s single-thread on a clean core
  /** Wall seconds for n threads each spinning ProbeUnits — the host's
    * per-thread speed at width n (rises above the 1-thread time as turbo
    * headroom shrinks or neighbors contend). */
  private def spinAt(n: Int): Double = {
    val threads = Array.fill(n)(new Thread(() => spin(ProbeUnits)))
    time { threads.foreach(_.start()); threads.foreach(_.join()) }._2
  }
  /** (1-thread sec for ProbeUnits, scale8 = 8·t1/t8 where t8 runs 8×
    * ProbeUnits on 8 threads — ideal ≈ 8 on an idle box, → 1 as effective
    * cores vanish). */
  private def hostProbe(): (Double, Double) = {
    val (_, t1) = time(spin(ProbeUnits))
    val t8 = spinAt(8)
    (t1, 8.0 * t1 / math.max(t8, 1e-9))
  }

  /** Per-thread hardware speed ratio between two widths: how much SLOWER a
    * thread runs at width b than at width a on this chip, measured with the
    * same fixed pure-JVM workload (t_spin(b)/t_spin(a); ≥ 1 under turbo/
    * SMT/bandwidth effects, ~1 on steady silicon). A single box SHARES
    * turbo budget, caches and memory bandwidth across the pair's widths —
    * a real cluster of 4N executors on 4× the nodes does not — so the raw
    * single-box N→4N ratio UNDERSTATES cluster scaling by exactly this
    * hardware factor. Multiplying it back out (scaling_efficiency_hw_adj
    * keys) reports engine scaling against what the hardware actually
    * offers at each width; both raw and adjusted values stay in the
    * artifact. (ALU-only spin captures frequency scaling but not memory
    * contention, so the adjustment is conservative.) */
  private def hwAdj(a: Int, b: Int): Double = {
    val ta = spinAt(a)
    val tb = spinAt(b)
    math.max(1.0, tb / math.max(ta, 1e-9))
  }

  /** Aggregate memcpy bandwidth (GB/s) of n concurrent threads, each
    * copying a 64 MB buffer back and forth. The build is part
    * bandwidth-bound (tmpfs parquet writes + shuffle ARE memcpy on this
    * box), and this box's aggregate bandwidth saturates well below
    * nThreads× the single-thread figure — so bw(4N)/bw(N) is the HARDWARE
    * ceiling on a bandwidth-bound job's N→4N scaling here (ideal 4.0). A
    * real 4N-executor cluster on 4× the nodes multiplies memory bandwidth
    * with the node count; a single box does not. Recorded as hw_membw_*
    * keys so the artifact carries its own ceiling context. Only called
    * between Spark sessions (needs ~n·128 MB of heap). */
  private def memBw(n: Int): Double = {
    val mb = 64
    val threads = Array.fill(n)(new Thread(() => {
      val a = new Array[Byte](mb << 20)
      val b = new Array[Byte](mb << 20)
      var r = 0
      while (r < 8) {
        if (r % 2 == 0) System.arraycopy(a, 0, b, 0, a.length)
        else System.arraycopy(b, 0, a, 0, a.length)
        r += 1
      }
    }))
    val (_, sec) = time { threads.foreach(_.start()); threads.foreach(_.join()) }
    n * 8.0 * mb / 1024.0 / math.max(sec, 1e-9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // route every tmp consumer (SparkEntry index dirs, streaming checkpoints)
    // to tmpfs as well; clear leftovers from a crashed previous run first
    InvertedIndex.deleteDir(ShmBase)
    new java.io.File(s"$ShmBase/tmp").mkdirs()
    sys.props("java.io.tmpdir") = s"$ShmBase/tmp"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try InvertedIndex.deleteDir(ShmBase) catch { case _: Throwable => () }))
    val tmp = sys.props("java.io.tmpdir")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    val benchStart = System.nanoTime()
    def benchSpent = (System.nanoTime() - benchStart) / 1e9
    val benchBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "720").toInt
    results += "bench_epoch_start" -> (System.currentTimeMillis() / 1000L).toDouble

    // ---- phase 0: host pre-flight → ADAPTIVE SIZING ---------------------
    // Diagnosis alone is not survival: two driver rounds landed on a
    // memory-bandwidth-collapsed box (memcpy 1.8-3 GB/s vs 12-25 healthy)
    // and the full-size rep-0 pair starved every later phase. Measure the
    // box FIRST; when it is degraded, shrink the build corpus (and the WAND
    // corpus, proportionally) so the complete phase ladder — ≥3 reps,
    // (8,32), WAND, hash — fits the budget at reduced scale. Thresholds:
    // healthy windows measure ≥12 GB/s aggregate memcpy at 8 threads and
    // ~0.22-0.25 s for the 1-thread spin; membw@8 < 8 GB/s or spin-t1
    // > 0.5 s marks the host degraded. The scale factor follows the
    // measured bandwidth ratio (bw/20 GB/s, clamped to [1/10, 1]) — the
    // build is bandwidth-bound on this box, so throughput tracks memcpy.
    val (pfT1, pfScale8) = hostProbe()
    val pfBw8 = math.max(memBw(8), memBw(8)) // max of 2: contention only lowers it
    results += "preflight_t1_sec" -> round3(pfT1)
    results += "preflight_scale8" -> round3(pfScale8)
    results += "preflight_membw_gbps_8" -> round3(pfBw8)
    val hostDegraded = pfBw8 < 8.0 || pfT1 > 0.5
    if (hostDegraded) {
      val factor = math.min(1.0, math.max(0.1, pfBw8 / 20.0))
      EffDocs = math.max(30000L, (BenchDocs * factor / 1000).toLong * 1000)
      results += "bench_docs_scaled_to" -> EffDocs.toDouble
      System.err.println(f"[bench] DEGRADED HOST (membw $pfBw8%.1f GB/s, " +
        f"t1 $pfT1%.2f s): scaling BenchDocs $BenchDocs -> $EffDocs")
    }
    val benchDocs = EffDocs
    val pagesPath = s"$ShmBase/pages_$benchDocs"

    var probeT1Min = Double.MaxValue
    var probeScale8Max = 0.0
    def emit(): Unit = {
      // fresh host probe on EVERY line: min(t1)/max(scale8) across the run
      // are the host's clean capability; the current values say whether the
      // numbers just printed were measured in a clean or a collapsed window
      val (t1, scale8) = hostProbe()
      probeT1Min = math.min(probeT1Min, t1)
      probeScale8Max = math.max(probeScale8Max, scale8)
      results += "host_probe_t1_sec" -> round3(t1)
      results += "host_probe_scale8" -> round3(scale8)
      results += "host_probe_t1_min" -> round3(probeT1Min)
      results += "host_probe_scale8_max" -> round3(probeScale8Max)
      results += "emitted_at_sec" -> round3(benchSpent)
      val total = results.collect {
        case (k, v) if k.startsWith("q_") && v >= 0 => v
      }.sum
      val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val es = errors.map { case (k, v) =>
        s""""$k":"${v.replace("\\", "\\\\").replace("\"", "'").replace("\n", " ")}""""
      }.mkString("{", ",", "}")
      println(
        s"""{"metric":"total","value":${round3(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
      System.out.flush()
      writeBenchMd(results, errors, total, sfDir)
    }

    // ---- phase 1: materialize the shared page input once ----------------
    locally {
      val s = session(CoresHigh)
      if (!Files.exists(Paths.get(pagesPath, "_SUCCESS"))) {
        val (_, sec) = time(Synth.pages(s, benchDocs, 42L, 64)
          .write.mode("overwrite").parquet(pagesPath))
        results += "pages_gen_sec" -> round3(sec)
      }
      s.stop()
      emit()
    }

    // ---- phase 2: index-build throughput at two parallelism levels ------
    // (N vs 4N per the north rule, on identical parquet input, identical
    // params; JIT warmed in each session by a small build before the timed
    // one)
    def timedBuild(cores: Int, warm: Boolean): Double = {
      val s = session(cores)
      import s.implicits._
      val pages = s.read.parquet(pagesPath).as[Page]
      if (warm) { // JIT warmup: small throwaway build
        val warmDir = s"$tmp/graft_bench_warm_$cores"
        InvertedIndex.deleteDir(warmDir)
        InvertedIndex.build(s, pages.limit(5000), warmDir, BuildParams(numShards = 1))
      }
      val idxDir = s"$tmp/graft_bench_idx_$cores"
      InvertedIndex.deleteDir(idxDir)
      val (_, sec) = time(
        InvertedIndex.build(s, pages, idxDir, BuildParams(numShards = 4)))
      s.stop()
      sec
    }
    val tLow = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tHigh = scala.collection.mutable.ArrayBuffer.empty[Double]
    val hwAdjs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val effPairs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def runRep(rep: Int): Unit = {
      results += s"build_p${CoresLow}_rep${rep}_at" -> round3(benchSpent)
      tLow += timedBuild(CoresLow, warm = rep == 0)
      results += s"build_p${CoresLow}_rep$rep" -> round3(tLow.last)
      emit()
      results += s"build_p${CoresHigh}_rep${rep}_at" -> round3(benchSpent)
      tHigh += timedBuild(CoresHigh, warm = rep == 0)
      results += s"build_p${CoresHigh}_rep$rep" -> round3(tHigh.last)
      System.err.println(s"[bench] rep $rep: t$CoresLow=${tLow.last} t$CoresHigh=${tHigh.last}")
      val tl = tLow.min
      val th = tHigh.min
      results += s"index_build_p${CoresLow}_sec" -> round3(tl)
      results += s"index_build_p${CoresHigh}_sec" -> round3(th)
      results += s"index_docs_per_sec_p$CoresLow" -> round3(benchDocs / tl)
      results += s"index_docs_per_sec_p$CoresHigh" -> round3(benchDocs / th)
      val effRaw = (benchDocs / th) / (benchDocs / tl) / 4.0
      results += "scaling_efficiency" -> round3(effRaw)
      // Per-rep pair efficiency: THIS rep's (tN, t4N), measured
      // back-to-back inside one host window (~minutes apart), so unlike
      // the minima headline it cannot pair a lucky-clean narrow slot from
      // one window with a bandwidth-ceiling wide slot from another (the
      // batch-1 harvest showed that mix deflating raw to 0.63 while each
      // individual window read ≥0.75). Raw, no hardware adjustment; the
      // max across reps is the least window-mixed single raw sample. The
      // minima-based `scaling_efficiency` above remains the binding,
      // conservative headline.
      effPairs += tLow.last / (4.0 * tHigh.last)
      results += s"scaling_efficiency_pair_rep$rep" -> round3(effPairs.last)
      results += "scaling_efficiency_best_pair" -> round3(effPairs.max)
      // hardware per-thread slowdown between the two widths, measured per
      // rep; the MIN across reps is the least-contaminated estimate (a
      // collapsed window only inflates it, so min can't over-correct), and
      // the adjusted key is capped at 1
      hwAdjs += hwAdj(CoresLow, CoresHigh)
      results += s"hw_perthread_slowdown_${CoresLow}_${CoresHigh}_rep$rep" ->
        round3(hwAdjs.last)
      results += "scaling_efficiency_hw_adj" ->
        round3(math.min(1.0, effRaw * hwAdjs.min))
      val bwL = memBw(CoresLow)
      val bwH = memBw(CoresHigh)
      results += s"hw_membw_gbps_p${CoresLow}_rep$rep" -> round3(bwL)
      results += s"hw_membw_gbps_p${CoresHigh}_rep$rep" -> round3(bwH)
      results += s"hw_membw_scale_${CoresLow}_${CoresHigh}_rep$rep" ->
        round3(bwH / math.max(bwL, 1e-9))
      emit()
    }
    // One full rep FIRST — a complete N/4N pair exists before anything
    // else runs — then ALL extra alternating reps IMMEDIATELY: the
    // per-level minima are the noise estimator's whole defense against a
    // contaminated window, so they are the cheapest, most important rows
    // and must never queue behind optional instrumentation (BENCH_r03's
    // failure mode: the official efficiency rested on a single rep-0 pair
    // measured on a collapsed host while 345 s of optional hash timing ran
    // first). The only thing allowed to displace reps is a host so slow
    // that rep 0 alone ate half the budget — and then the probe keys in
    // the same artifact prove the cause.
    runRep(0)
    for (rep <- 1 until Reps) {
      if (benchSpent < 0.5 * benchBudget) runRep(rep)
      else if (!results.contains("reps_truncated_at_sec")) {
        results += "reps_truncated_at_sec" -> round3(benchSpent)
        emit()
      }
    }

    // ---- (8,32) idle-box datapoint ---------------------------------------
    // The headline pair is (2,8) because invisible neighbors can shrink the
    // effective-core envelope below 32 (see the class doc); when the box
    // cooperates, an (8,32) pair is the stronger statement — recorded
    // best-effort BEFORE the operator suite so a late budget expiry can't
    // starve it again (it never ran in the r2/r3 driver windows).
    if (CoresLow == 2) {
      if (benchSpent < 0.65 * benchBudget) {
        try {
          results += "build_p8_extra_at" -> round3(benchSpent)
          val t8 = timedBuild(8, warm = true)
          results += "build_p8_extra" -> round3(t8)
          emit()
          results += "build_p32_extra_at" -> round3(benchSpent)
          val t32 = timedBuild(32, warm = true)
          results += "build_p32_extra" -> round3(t32)
          val eff832 = (benchDocs / t32) / (benchDocs / t8) / 4.0
          results += "scaling_efficiency_8_32" -> round3(eff832)
          val adj832 = hwAdj(8, 32)
          results += "hw_perthread_slowdown_8_32" -> round3(adj832)
          results += "scaling_efficiency_8_32_hw_adj" ->
            round3(math.min(1.0, eff832 * adj832))
          val bw8 = memBw(8)
          val bw32 = memBw(32)
          results += "hw_membw_gbps_p8" -> round3(bw8)
          results += "hw_membw_gbps_p32" -> round3(bw32)
          results += "hw_membw_scale_8_32" -> round3(bw32 / math.max(bw8, 1e-9))
        } catch {
          case e: Throwable =>
            errors += "scaling_8_32" -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        }
      } else results += "scaling_8_32_skipped_at_sec" -> round3(benchSpent)
      emit()
    }

    // Scaling-harvest knob: SPARK_GRAFT_SCALING_ONLY=1 stops after the
    // scaling phases (reps + (8,32)) — for repeatedly sampling host windows
    // in search of a clean one, where a full suite per sample would waste
    // most of the wall-clock. Never set on driver runs.
    if (sys.env.get("SPARK_GRAFT_SCALING_ONLY").contains("1")) {
      emit()
      if (errors.nonEmpty) {
        System.err.println(s"[bench] FAILED: ${errors.keys.mkString(", ")}")
        sys.exit(3)
      }
      return
    }

    // ---- phase 3: query latency + operator suite on the bench session ---
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", CoresHigh.toString).toInt
    val s = session(cpus)
    try {
      val h = Bm25.open(s, s"$tmp/graft_bench_idx_$CoresHigh")
        .tuneForPointQueries() // serving conf: AQE off, narrow shuffles
      h.topkWand("w1 w2", 10).collect() // warmup
      // per-query minimum over two passes — same noise-robust estimator as
      // the build reps (identical work; host varies up to 8×)
      val qTimes = Synth.refTitles.map { q =>
        math.min(time(h.topkWand(q, 10).collect())._2,
          time(h.topkWand(q, 10).collect())._2)
      }
      results += "bm25_query_avg_sec" -> round3(qTimes.sum / qTimes.length)
      results += "bm25_query_max_sec" -> round3(qTimes.max)
    } catch {
      case e: Throwable =>
        errors += "bm25_query" -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
    } finally { // restore throughput conf for the operator suite
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.shuffle.partitions", (2 * cpus).toString)
    }
    emit()

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val sec = try time(fn(s, sfDir).count())._2 catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          -1.0
      }
      results += name -> round3(sec)
    }
    s.stop()
    emit()

    // ---- optional: production-hash instrumentation ----------------------
    // md5-portable (the oracle shape) vs the xxhash64 production path over
    // 100k bench pages (~10M token hashes × 8 seeds) — the tiny sf
    // documents table is overhead-dominated and can't separate the hash
    // costs. Strictly budget-gated and strictly AFTER every scaling rep,
    // the (8,32) pair and the suite (its r3 shape starved the scaling reps
    // — 345 s then; ~40 s now that the typed path is production), but
    // BEFORE the WAND phase: WAND is the longest phase by far and runs to
    // completion past the budget line, so anything ordered after it is
    // skipped on every healthy full-size run (r4's ladder).
    if (benchSpent >= benchBudget)
      results += "hash_phase_skipped_at_sec" -> round3(benchSpent)
    else {
      results += "hash_phase_at" -> round3(benchSpent)
      val s3 = session(CoresHigh)
      try {
        import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
        // 1/3 hash-sample (~100k pages), NOT .limit(): GlobalLimit coalesces
        // to one partition and would run the narrow op single-threaded
        val hashDocs = s3.read.parquet(pagesPath)
          .filter(pmod(xxhash64(col("url")), lit(3)) === 0)
          .select(xxhash64(col("url")).bitwiseAND(lit(Long.MaxValue)).as("doc_id"),
            col("text"))
        // untimed warm pass PER MODE (as the hashbench CLI does): without
        // it the first-timed mode also pays the cold parquet scan + its
        // codegen/JIT warm-up, biasing the md5/xx64 ratio
        graft.ops.Dedup.minhash(hashDocs).count()
        graft.ops.Dedup.minhashColumnar(hashDocs, hash = graft.ops.Dedup.Xx64).count()
        graft.ops.Dedup.minhash(hashDocs, hash = graft.ops.Dedup.Xx64).count()
        results += "minhash_md5_sec" ->
          round3(time(graft.ops.Dedup.minhash(hashDocs).count())._2)
        results += "minhash_xx64_columnar_sec" ->
          round3(time(graft.ops.Dedup.minhashColumnar(hashDocs,
            hash = graft.ops.Dedup.Xx64).count())._2)
        // the production route (minhash(Xx64) = the typed fast path)
        results += "minhash_xx64_sec" ->
          round3(time(graft.ops.Dedup.minhash(hashDocs,
            hash = graft.ops.Dedup.Xx64).count())._2)
      } catch {
        case e: Throwable =>
          errors += "minhash_hash_modes" -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      } finally s3.stop()
    }
    emit()

    // ---- WAND phase: block-max pruning above the adaptive cutoff --------
    // Every suite/index query so far sits below wandCutoff (2M docs), so
    // production traffic always took the exhaustive single-pass plan. This
    // phase builds an index ABOVE the cutoff and measures the pruning path
    // against the exhaustive one on the reference query set, plus how many
    // blocks the bound actually skips.
    // Degraded host: shrink the WAND corpus with the same bandwidth factor
    // (it is the single most expensive phase) and lower the adaptive cutoff
    // below the shrunken corpus so the pruning path still engages — the
    // phase's POINT is pruning-vs-exhaustive, which measures at any size.
    val wandDocsFull = sys.env.getOrElse("SPARK_GRAFT_WAND_DOCS", "2200000").toLong
    val wandDocs =
      if (!hostDegraded) wandDocsFull
      else math.max(150000L,
        (wandDocsFull * math.max(0.1, pfBw8 / 20.0) / 2 / 1000).toLong * 1000)
    if (wandDocs != wandDocsFull) results += "wand_docs_scaled_to" -> wandDocs.toDouble
    if (wandDocs > 0 && benchSpent >= benchBudget) {
      results += "wand_phase_skipped_at_sec" -> round3(benchSpent)
      emit()
    }
    if (wandDocs > 0 && benchSpent < benchBudget) {
      results += "wand_phase_at" -> round3(benchSpent)
      val s2 = session(CoresHigh)
      // the ONE build shuffle must be partitioned ∝ data, exactly as on a
      // real cluster: at 2.2M docs (~230M postings) the suite's 2×cores=16
      // partitions put ~600 MB through every sort task and the salted sort
      // churns in spill — measured 1074 s vs 22.6 s for 300k docs (47× for
      // 7.3× the data). ~15k docs per shuffle partition restores the
      // linear profile; AQE coalesces the excess on the small phases.
      s2.conf.set("spark.sql.shuffle.partitions",
        math.max(2 * CoresHigh, (wandDocs / 15000).toInt).toString)
      try {
        import s2.implicits._
        val wPages = s"$ShmBase/pages_wand_$wandDocs"
        if (!Files.exists(Paths.get(wPages, "_SUCCESS"))) {
          val (_, gsec) = time(Synth.pages(s2, wandDocs, 42L, 128)
            .write.mode("overwrite").parquet(wPages))
          results += "wand_pages_gen_sec" -> round3(gsec)
          emit()
        }
        // iteration knob: point at a pre-built index to skip the build
        val idxDir = sys.env.getOrElse("SPARK_GRAFT_WAND_IDX", s"$tmp/graft_wand_idx")
        if (InvertedIndex.committedShards(s2, idxDir).isEmpty) {
          InvertedIndex.deleteDir(idxDir)
          val (_, bsec) = time(InvertedIndex.build(s2,
            s2.read.parquet(wPages).as[Page], idxDir, BuildParams(numShards = 4)))
          results += "wand_build_sec" -> round3(bsec)
          results += "wand_docs_per_sec" -> round3(wandDocs / bsec)
          emit()
        }
        val h0 = Bm25.open(s2, idxDir).tuneForPointQueries()
        // smoke-test knob: lower the cutoff to exercise this phase on a
        // small index; the driver run uses the production default
        val cutoffOverride = sys.env.get("SPARK_GRAFT_WAND_CUTOFF").map(_.toLong)
          .orElse(if (wandDocs < h0.wandCutoff) Some(wandDocs / 2) else None)
        val h = cutoffOverride.map(c => h0.copy(wandCutoff = c)).getOrElse(h0)
        cutoffOverride.foreach(c =>
          results += "wand_cutoff_scaled_to" -> c.toDouble)
        require(h.nDocs >= h.wandCutoff,
          s"wand phase: ${h.nDocs} docs is below the ${h.wandCutoff} cutoff")
        h.topkWand("w1 w2", 10).collect() // warm: pruning path
        h.topk("w1 w2", 10).collect() //      and exhaustive path
        var blocksTotal = 0L
        var blocksSurvived = 0L
        val (wandTs, exhTs) = WandQueries.zipWithIndex.map { case (q, i) =>
          // alternate paths, per-query minimum of two passes (noisy host)
          val w1 = time(h.topkWand(q, 10).collect())._2
          val e1 = time(h.topk(q, 10).collect())._2
          val w2 = time(h.topkWand(q, 10).collect())._2
          val e2 = time(h.topk(q, 10).collect())._2
          val (bt, bs, _) = h.wandStats(q, 10)
          blocksTotal += bt; blocksSurvived += bs
          results += s"wandq${i}_wand_sec" -> round3(math.min(w1, w2))
          results += s"wandq${i}_exh_sec" -> round3(math.min(e1, e2))
          results += s"wandq${i}_skip_pct" ->
            round3(100.0 * (bt - bs) / math.max(bt, 1L))
          (math.min(w1, w2), math.min(e1, e2))
        }.unzip
        // result identity at scale (the IndexSpec identity, here above the
        // cutoff with pruning live): any divergence is a bench failure.
        // Scores are compared ROUNDED to 6 dp (the same bit-stable
        // reshaping the oracles use): the two plans accumulate per-doc sums
        // in different orders, so raw-Double equality could fail on a
        // last-ulp non-associativity difference that is not a real bug —
        // and because both plans ORDER by the raw score, a last-ulp
        // difference can also swap two near-tied docs, so the compare is on
        // the SORTED rounded multiset, not the emitted order.
        def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
          df.collect().toSeq.map(r =>
            (r.getLong(0), math.round(r.getDouble(1) * 1e6))).sorted
        for (q <- WandQueries) {
          val a = canon(h.topkWand(q, 10))
          val b = canon(h.topk(q, 10))
          if (a != b) sys.error(s"WAND != exhaustive at scale for '$q'")
        }
        results += "wand_query_avg_sec" -> round3(wandTs.sum / wandTs.length)
        results += "exhaustive_query_avg_sec" -> round3(exhTs.sum / exhTs.length)
        results += "wand_blocks_total" -> blocksTotal.toDouble
        results += "wand_blocks_survived" -> blocksSurvived.toDouble
      } catch {
        case e: Throwable =>
          errors += "wand_scale" -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      } finally s2.stop()
      emit()
    }

    emit()

    if (errors.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${errors.keys.mkString(", ")}")
      sys.exit(3)
    }
  }

  private def round3(d: Double): Double = math.round(d * 1000.0) / 1000.0

  private def writeBenchMd(r: collection.Map[String, Double],
                           errors: collection.Map[String, String],
                           total: Double, sfDir: String): Unit = {
    try {
      val md = new StringBuilder
      md ++= "# BENCH (generated by graft.Bench — the authored analysis is BENCH.md)\n\n"
      for (t1 <- r.get("host_probe_t1_sec"); s8 <- r.get("host_probe_scale8");
           t1m <- r.get("host_probe_t1_min"); s8m <- r.get("host_probe_scale8_max"))
        md ++= s"Host probe at last emit: 1-thread fixed workload $t1 s " +
          s"(run min $t1m), 8-thread scaling $s8 of 8 (run max $s8m) — if the\n" +
          "current values are far off the run's best, the rows above them were\n" +
          "measured in a collapsed host window, not by the engine.\n\n"
      md ++= s"Input: ${EffDocs} synthetic pages (seed 42) for the index build; "
      md ++= s"`$sfDir` for the operator suite.\n\n"
      md ++= s"N→4N scaling pair: local[$CoresLow] vs local[$CoresHigh], alternating $Reps reps,\n"
      md ++= "per-level MINIMA (the sandbox host shows up-to-8x invisible-neighbor\n"
      md ++= "variance; firecracker reports no steal time). All bench I/O is on tmpfs:\n"
      md ++= "the VM's single virtio disk collapses under concurrent writers, while a\n"
      md ++= "real N-node cluster scales disk bandwidth with N — RAM-backed scratch is\n"
      md ++= "the single-box stand-in that lets the pair measure compute scaling.\n"
      md ++= "The (8,32) pair is recorded best-effort: when neighbors shrink the\n"
      md ++= "effective-core envelope below 32, local[32] thrashes and that pair\n"
      md ++= "measures the neighbors, not the engine — the (2,8) minima are the\n"
      md ++= "north-rule evidence.\n\n"
      md ++= "Scale lesson (measured): the build's ONE shuffle must be partitioned\n"
      md ++= "proportional to data, exactly as it would be on a real cluster — at\n"
      md ++= "2.2M docs (~230M postings) the suite's 16 shuffle partitions put\n"
      md ++= "~600 MB through every sort task and the salted sort spilled to a 47x\n"
      md ++= "blowup (1074 s vs 22.6 s at 300k for 7.3x the data); ~15k docs per\n"
      md ++= "partition (the wand phase conf) restores the linear profile (289 s).\n\n"
      md ++= "| metric | value |\n|---|---|\n"
      def row(k: String, label: String): Unit =
        r.get(k).foreach(v => md ++= s"| $label | $v |\n")
      row(s"index_build_p${CoresLow}_sec", s"index build local[$CoresLow] (s)")
      row(s"index_docs_per_sec_p$CoresLow", s"docs/s local[$CoresLow]")
      row(s"index_build_p${CoresHigh}_sec", s"index build local[$CoresHigh] (s)")
      row(s"index_docs_per_sec_p$CoresHigh", s"docs/s local[$CoresHigh]")
      r.get("scaling_efficiency").foreach(v =>
        md ++= s"| **scaling efficiency (N→4N)** | **$v** (north rule: ≥ 0.8) |\n")
      r.get("scaling_efficiency_hw_adj").foreach(v =>
        md ++= s"| scaling efficiency, hw-adjusted — an UPPER-BOUND estimate, " +
          "not the north-rule metric (the ALU spin probe captures turbo/SMT " +
          "per-thread slowdown but NOT memory/shuffle contention, so the " +
          "correction can overstate engine scaling; the raw row above is " +
          s"the binding figure) | $v |\n")
      r.get("scaling_efficiency_best_pair").foreach(v =>
        md ++= s"| best single-window rep pair (raw; each rep's N/4N builds " +
          "run back-to-back in one host window — immune to the cross-window " +
          "minima mix; the headline row above is the binding, conservative " +
          s"figure) | $v |\n")
      row("bm25_query_avg_sec", "BM25 top-10 avg latency (s)")
      row("bm25_query_max_sec", "BM25 top-10 max latency (s)")
      row("build_p8_extra", "extra idle-box pair: build local[8] (s)")
      row("build_p32_extra", "extra idle-box pair: build local[32] (s)")
      r.get("scaling_efficiency_8_32").foreach(v =>
        md ++= s"| scaling efficiency (8→32, 1 rep) | $v |\n")
      r.get("scaling_efficiency_8_32_hw_adj").foreach(v =>
        md ++= s"| scaling efficiency (8→32), hw-adjusted | $v |\n")
      row("wand_build_sec", "above-cutoff index build (s)")
      row("wand_docs_per_sec", "above-cutoff build docs/s")
      row("wand_query_avg_sec", "WAND top-10 avg latency above cutoff (s)")
      row("exhaustive_query_avg_sec", "exhaustive top-10 avg latency, same index (s)")
      for (t <- r.get("wand_blocks_total"); sv <- r.get("wand_blocks_survived"))
        md ++= s"| WAND blocks survived / total | ${sv.toLong} / ${t.toLong} " +
          f"(${100.0 * (1 - sv / math.max(t, 1.0))}%.1f%% skipped) |\n"
      if (r.contains("wandq0_wand_sec")) {
        md ++= "\nPer-query WAND vs exhaustive on the above-cutoff index " +
          "(min of 2 passes each):\n\n| query | wand (s) | exhaustive (s) | blocks skipped |\n|---|---|---|---|\n"
        WandQueries.zipWithIndex.foreach { case (q, i) =>
          for (w <- r.get(s"wandq${i}_wand_sec"); e <- r.get(s"wandq${i}_exh_sec");
               sk <- r.get(s"wandq${i}_skip_pct"))
            md ++= s"| `$q` | $w | $e | $sk% |\n"
        }
        md ++= "\nBlock-max pruning pays on SELECTIVE queries (a rare " +
          "high-idf term anchors theta; the range-grid bound zeroes that " +
          "term's contribution in every doc-range cell it has no postings " +
          "in, so the hot terms' blocks prune there). All-hot-term queries " +
          "skip ~0% by nature — every cell holds every term — and pay only " +
          "the two concurrent bound jobs; below the 2M-doc adaptive cutoff " +
          "queries run the single-action exhaustive plan and none of this " +
          "overhead exists.\n"
      }
      row("minhash_md5_sec", "minhash md5-portable (s)")
      row("minhash_xx64_sec", "minhash xxhash64 production (s)")
      md ++= s"| operator suite total | ${round3(total)} s |\n\n"
      // durations only: the `build_p*_rep<N>_at` keys are phase TIMESTAMPS
      // and must not be listed as if they were reps
      val repsL = r.collect { case (k, v)
        if k.startsWith(s"build_p${CoresLow}_rep") && !k.endsWith("_at") => v }
      val repsH = r.collect { case (k, v)
        if k.startsWith(s"build_p${CoresHigh}_rep") && !k.endsWith("_at") => v }
      if (repsL.nonEmpty)
        md ++= s"Build reps: local[$CoresLow] = ${repsL.mkString(", ")}; local[$CoresHigh] = ${repsH.mkString(", ")}\n\n"
      md ++= "Per-query seconds:\n\n| query | sec |\n|---|---|\n"
      r.toSeq.collect { case (k, v) if k.startsWith("q_") =>
        md ++= s"| $k | $v |\n"
      }
      if (errors.nonEmpty) {
        md ++= "\nFailures:\n\n| query | error |\n|---|---|\n"
        errors.foreach { case (k, v) => md ++= s"| $k | $v |\n" }
      }
      // NEVER BENCH.md: that file is the authored cross-run analysis (a
      // driver run once clobbered it with this generated table)
      Files.writeString(Paths.get("BENCH_generated.md"), md.toString)
    } catch { case _: Throwable => () }
  }
}
