package graft

import org.apache.spark.sql.SparkSession

import graft.data.Synth
import graft.index.{BuildParams, InvertedIndex}
import graft.query.Bm25

/** spark-submit entry point for the engine (the north rule's cluster
  * surface; in the sandbox it runs under local[N]).
  *
  * Usage:
  *   graft.Main build <indexDir> <nDocs> [seed] [numShards]
  *   graft.Main query <indexDir> <k> <query words...>
  *   graft.Main wand  <indexDir> <k> <query words...>
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", 2 * cpus.toInt)
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  private def run(spark: SparkSession, args: Array[String]): Unit = args.toList match {
    case "build" :: dir :: n :: rest =>
      val seed = rest.headOption.map(_.toLong).getOrElse(42L)
      val shards = rest.drop(1).headOption.map(_.toInt).getOrElse(4)
      val t0 = System.nanoTime()
      val built = InvertedIndex.build(spark, Synth.pages(spark, n.toLong, seed),
        dir, BuildParams(numShards = shards))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"built $built shards over $n docs in $sec%.2f s " +
        f"(${n.toLong / math.max(sec, 1e-9)}%.0f docs/sec)")
      spark.read.parquet(s"$dir/manifest").orderBy("partition_id").show(false)
    case verb :: dir :: k :: qw if (verb == "query" || verb == "wand") && qw.nonEmpty =>
      val h = Bm25.open(spark, dir)
      val q = qw.mkString(" ")
      val t0 = System.nanoTime()
      val res = if (verb == "wand") h.topkWand(q, k.toInt) else h.topk(q, k.toInt)
      val rows = h.withUrls(res).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"query: \"$q\"  (n_docs=${h.nDocs}, avgdl=${h.avgdl})")
      rows.foreach(r => println(f"  ${r.getAs[Double]("score")}%12.6f  " +
        s"${r.getAs[Long]("doc_id")}  ${r.getAs[String]("url")}"))
      println(f"$verb took $sec%.3f s, ${rows.length} results")
    case "build2" :: dir :: n :: Nil =>
      // warmed fixed-overhead measurement: two full builds, same session
      for (i <- 1 to 2) {
        val d = s"$dir-$i"
        graft.index.InvertedIndex.deleteDir(d)
        val t0 = System.nanoTime()
        InvertedIndex.build(spark, Synth.pages(spark, n.toLong, 42L), d,
          BuildParams(numShards = 4))
        println(f"[build2] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    case "rawcpu" :: threads :: Nil =>
      println(s"[rawcpu] availableProcessors=${Runtime.getRuntime.availableProcessors}")
      println(s"[rawcpu] Cpus_allowed_list=" + scala.io.Source
        .fromFile("/proc/self/status").getLines()
        .find(_.startsWith("Cpus_allowed_list")).getOrElse("?"))
      for (k <- Seq(1, threads.toInt)) {
        val t0 = System.nanoTime()
        val its = new java.util.concurrent.atomic.AtomicLong()
        val ts = (0 until k).map { _ =>
          new Thread(() => {
            var x = 12345L; var i = 0L
            val end = System.nanoTime() + 4000000000L
            while (System.nanoTime() < end) {
              var j = 0
              while (j < 100000) { x = x * 6364136223846793005L + 1442695040888963407L; j += 1 }
              i += 100000
            }
            its.addAndGet(i + (x & 1))
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        println(f"[rawcpu] k=$k%-3d ${its.get / ((System.nanoTime() - t0) / 1e9) / 1e6}%9.1f M iter/s")
      }

    case "rawalloc" :: threads :: Nil =>
      // allocation-only probe: small short-lived objects, no strings
      for (k <- Seq(1, threads.toInt)) {
        val t0 = System.nanoTime()
        val its = new java.util.concurrent.atomic.AtomicLong()
        val ts = (0 until k).map { _ =>
          new Thread(() => {
            var i = 0L
            var keep: Array[Byte] = null
            val end = System.nanoTime() + 4000000000L
            while (System.nanoTime() < end) {
              var j = 0
              while (j < 1000) { keep = new Array[Byte](64 + (j & 63)); j += 1 }
              i += 1000
            }
            its.addAndGet(i + (if (keep == null) 0 else 1))
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        println(f"[rawalloc] k=$k%-3d ${its.get / ((System.nanoTime() - t0) / 1e9) / 1e6}%9.1f M allocs/s")
      }

    case "rawtok2" :: n :: threads :: Nil =>
      // decompose the tokenizer: which op fails to scale across threads?
      val texts2 = (0L until n.toLong).map(i =>
        graft.data.Synth.genRow(42L, i).text).toArray
      val cleaned2 = texts2.map(graft.core.TextExtract.cleanText)
      def bench(name: String, k: Int)(op: Int => Long): Unit = {
        val t0 = System.nanoTime()
        val acc = new java.util.concurrent.atomic.AtomicLong()
        val chunk = (texts2.length + k - 1) / k
        val ts = (0 until k).map { ti =>
          new Thread(() => {
            var i = ti * chunk; val end = math.min(i + chunk, texts2.length)
            var a = 0L
            while (i < end) { a += op(i); i += 1 }
            acc.addAndGet(a)
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        println(f"[rawtok2] $name%-12s k=$k%-3d ${(System.nanoTime() - t0) / 1e9}%7.2f s (acc=${acc.get})")
      }
      val tlPat = ThreadLocal.withInitial[java.util.regex.Pattern](() =>
        java.util.regex.Pattern.compile("[^a-zA-Z0-9 \n]+"))
      def handClean(s: String): String = {
        val sb = new java.lang.StringBuilder(s.length)
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ' || c == '\n')
            sb.append(c)
          else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
          i += 1
        }
        sb.toString
      }
      for (k <- Seq(1, threads.toInt)) {
        bench("clean", k)(i => graft.core.TextExtract.cleanText(texts2(i)).length.toLong)
        bench("clean-tl", k)(i => tlPat.get.matcher(texts2(i)).replaceAll("")
          .toLowerCase(java.util.Locale.ROOT).length.toLong)
        bench("clean-hand", k)(i => handClean(texts2(i)).length.toLong)
        bench("split", k)(i => cleaned2(i).split("\\s+").length.toLong)
        bench("full", k)(i => graft.core.TextExtract.tokenizeFull(cleaned2(i)).length.toLong)
      }

    case "rawtok" :: n :: threads :: Nil =>
      // Spark-free scaling probe: tokenize the same texts with K plain
      // threads — separates JVM/host string-op scaling from Spark overhead
      val texts = (0L until n.toLong).map(i =>
        graft.data.Synth.genRow(42L, i).text).toArray
      for (k <- Seq(1, threads.toInt)) {
        val t0 = System.nanoTime()
        val chunk = (texts.length + k - 1) / k
        val ts = (0 until k).map { ti =>
          new Thread(() => {
            var i = ti * chunk
            val end = math.min(i + chunk, texts.length)
            var acc = 0L
            while (i < end) {
              val toks = graft.core.TextExtract.tokenizeFull(
                graft.core.TextExtract.cleanText(texts(i)))
              acc += toks.length
              i += 1
            }
            if (acc < 0) println(acc) // keep acc live
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        println(f"[rawtok] k=$k%-3d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }

    case "tokprof" :: n :: Nil =>
      // isolates the tokenize stage's scaling: cold vs warm (JIT), count vs
      // write (commit overhead), with explicit wide partitioning
      import org.apache.spark.sql.functions._
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[tokprof] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val par = 4 * spark.sparkContext.defaultParallelism
      val pages = Synth.pages(spark, n.toLong, 42L, par)
      t("gen+count-cold")(pages.count())
      t("gen+count-warm")(pages.count())
      val scratchDir = s"${sys.props("java.io.tmpdir")}/tokprof"
      val p = BuildParams()
      t("tok+write-cold")(graft.index.IndexBuild.tokenize(pages, p)
        .write.mode("overwrite").partitionBy("shard").parquet(scratchDir))
      t("tok+write-warm")(graft.index.IndexBuild.tokenize(pages, p)
        .write.mode("overwrite").partitionBy("shard").parquet(scratchDir))
      t("tok+count-warm")(graft.index.IndexBuild.tokenize(pages, p).count())

    case "profile" :: n :: Nil =>
      // stage-by-stage timing of the build pipeline (no writes)
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val p = BuildParams(numShards = 1)
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      def t[A](name: String)(f: => A): A = {
        val g0 = gcMs; val t0 = System.nanoTime(); val r = f
        println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
          f"  (driver-gc ${(gcMs - g0) / 1000.0}%6.1f s)"); r
      }
      val scratch = s"${sys.props("java.io.tmpdir")}/graft_profile"
      val pages = Synth.pages(spark, n.toLong, 42L)
      t("gen+count")(pages.count())
      t("tokenize+write")(graft.index.IndexBuild.tokenize(pages, p)
        .write.mode("overwrite").parquet(s"$scratch/tok"))
      val tok = spark.read.parquet(s"$scratch/tok")
      val avgdl = t("avgdl")(tok.agg(avg($"dl")).head.getDouble(0))
      val toks = tok.select($"shard".cast("int").as("shard"),
        explode($"tokens").as("term"), $"doc_id", lit(1).as("tf"), $"dl")
        .as[graft.index.ShardPosting]
      t("salted-encode+write")(
        graft.index.IndexBuild.saltedRuns(toks, Map.empty, p, avgdl)
          .write.mode("overwrite").parquet(s"$scratch/runs"))
      t("layout-repartition+write")(
        spark.read.parquet(s"$scratch/runs")
          .withColumn("bucket", pmod(xxhash64($"term"), lit(p.nTermBuckets)).cast("int"))
          .repartition(col("shard"), col("bucket"))
          .sortWithinPartitions($"term", $"salt", $"block_id")
          .write.mode("overwrite").partitionBy("shard", "bucket")
          .parquet(s"$scratch/laidout"))
    case _ =>
      System.err.println("usage: build <dir> <nDocs> [seed] [shards] | query|wand <dir> <k> <terms...> | profile <nDocs>")
      sys.exit(2)
  }
}
