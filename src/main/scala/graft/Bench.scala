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
  *   index_build_p8_sec / index_build_p32_sec   — same BenchDocs parquet
  *     input, identical build params, local[8] vs local[32]
  *   index_docs_per_sec_p8 / _p32, scaling_efficiency
  *     (eff = (docs/s @32) / (docs/s @8) / 4; north rule: ≥ 0.8)
  *   bm25_query_avg_sec — mean latency over the reference query set
  *     against the BenchDocs index.
  *
  * Exit code: nonzero if any operator query threw (the exception is
  * recorded in `errors`, never swallowed into a bare -1).
  */
object Bench {

  private val BenchDocs =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "500000").toLong
  /** Sandbox hosts show up-to-8× noisy-neighbor variance (identical runs:
    * 18s vs 145s, GC 1s vs 27s). Scaling runs therefore ALTERNATE between
    * the two parallelism levels and report the per-level minimum — the
    * standard noise-robust throughput estimator. */
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = sys.props("java.io.tmpdir")
    val pagesPath = s"$tmp/graft_bench_pages_$BenchDocs"
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def emit(): Unit = {
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
      val s = session(32)
      if (!Files.exists(Paths.get(pagesPath, "_SUCCESS"))) {
        val (_, sec) = time(Synth.pages(s, BenchDocs, 42L, 64)
          .write.mode("overwrite").parquet(pagesPath))
        results += "pages_gen_sec" -> round3(sec)
      }
      s.stop()
      emit()
    }

    // ---- phase 2: index-build throughput at two parallelism levels ------
    // (N vs 4N proxy per the driver instruction: local[8] vs local[32] on
    // identical parquet input, identical params; JIT warmed in each session
    // by a small build before the timed one)
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
    val t8s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t32s = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (rep <- 0 until Reps) {
      t8s += timedBuild(8, warm = rep == 0)
      results += s"build_p8_rep$rep" -> round3(t8s.last)
      emit()
      t32s += timedBuild(32, warm = rep == 0)
      results += s"build_p32_rep$rep" -> round3(t32s.last)
      System.err.println(s"[bench] rep $rep: t8=${t8s.last} t32=${t32s.last}")
      val t8 = t8s.min
      val t32 = t32s.min
      results += "index_build_p8_sec" -> round3(t8)
      results += "index_build_p32_sec" -> round3(t32)
      results += "index_docs_per_sec_p8" -> round3(BenchDocs / t8)
      results += "index_docs_per_sec_p32" -> round3(BenchDocs / t32)
      results += "scaling_efficiency" -> round3((BenchDocs / t32) / (BenchDocs / t8) / 4.0)
      emit()
    }

    // ---- phase 3: query latency + operator suite on the bench session ---
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    try {
      val h = Bm25.open(s, s"$tmp/graft_bench_idx_32")
      h.topkWand("w1 w2", 10).collect() // warmup
      val qTimes = Synth.refTitles.map { q =>
        time(h.topkWand(q, 10).collect())._2
      }
      results += "bm25_query_avg_sec" -> round3(qTimes.sum / qTimes.length)
      results += "bm25_query_max_sec" -> round3(qTimes.max)
    } catch {
      case e: Throwable =>
        errors += "bm25_query" -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
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
      md ++= "# BENCH — measured (graft.Bench)\n\n"
      md ++= s"Input: ${BenchDocs} synthetic pages (seed 42) for the index build; "
      md ++= s"`$sfDir` for the operator suite. Scaling runs alternate local[8]/\n"
      md ++= s"local[32] $Reps times and report per-level minima (the sandbox host\n"
      md ++= "shows up-to-8x noisy-neighbor variance between identical runs).\n\n"
      md ++= "| metric | value |\n|---|---|\n"
      def row(k: String, label: String): Unit =
        r.get(k).foreach(v => md ++= s"| $label | $v |\n")
      row("index_build_p8_sec", "index build local[8] (s)")
      row("index_docs_per_sec_p8", "docs/s local[8]")
      row("index_build_p32_sec", "index build local[32] (s)")
      row("index_docs_per_sec_p32", "docs/s local[32]")
      r.get("scaling_efficiency").foreach(v =>
        md ++= s"| **scaling efficiency (N→4N)** | **$v** (north rule: ≥ 0.8) |\n")
      row("bm25_query_avg_sec", "BM25 top-10 avg latency (s)")
      row("bm25_query_max_sec", "BM25 top-10 max latency (s)")
      md ++= s"| operator suite total | ${round3(total)} s |\n\n"
      val reps8 = r.collect { case (k, v) if k.startsWith("build_p8_rep") => v }
      val reps32 = r.collect { case (k, v) if k.startsWith("build_p32_rep") => v }
      if (reps8.nonEmpty)
        md ++= s"Build reps: local[8] = ${reps8.mkString(", ")}; local[32] = ${reps32.mkString(", ")}\n\n"
      md ++= "Per-query seconds:\n\n| query | sec |\n|---|---|\n"
      r.toSeq.collect { case (k, v) if k.startsWith("q_") =>
        md ++= s"| $k | $v |\n"
      }
      if (errors.nonEmpty) {
        md ++= "\nFailures:\n\n| query | error |\n|---|---|\n"
        errors.foreach { case (k, v) => md ++= s"| $k | $v |\n" }
      }
      Files.writeString(Paths.get("BENCH.md"), md.toString)
    } catch { case _: Throwable => () }
  }
}
