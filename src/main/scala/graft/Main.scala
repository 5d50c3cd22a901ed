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
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
    case _ =>
      System.err.println("usage: build <dir> <nDocs> [seed] [shards] | query|wand <dir> <k> <terms...>")
      sys.exit(2)
  }
}
