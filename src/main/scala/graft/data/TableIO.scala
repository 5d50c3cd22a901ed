package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-boundary utilities.
  *
  * - [[splitBucket]]: deterministic train/test split — the Spark form of the
  *   reference's offset-range slicing (reference: dataprocess/parser.py:12-17,
  *   hparams.py:12-14 TRAIN/TEST_DATASET_RANGE). Never `limit()` on
  *   unordered data: the bucket is a pure function of the row key, so the
  *   split is stable under any partitioning, resume, or scale-up. The hash
  *   is an MD5 hex digit (portable to the DuckDB oracle), not engine hash.
  * - [[exportTsv]]: TSV sink (reference: main.py:41-64 embedding-projector
  *   vecs.tsv/meta.tsv export, S8).
  */
object TableIO {

  /** Bucket 0..nBuckets-1 from the row key, stable across engines:
    * first 4 hex digits of md5(key) mod nBuckets. The key is hashed as its
    * DECIMAL STRING (cast to string first): a bigint cast straight to binary
    * hashes the 8-byte big-endian representation, which no other engine's
    * md5(key::VARCHAR) reproduces. */
  def splitBucket(key: Column, nBuckets: Int = 10): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % nBuckets).cast("int")

  /** Add a split column: "train" for buckets < trainBuckets, else "test". */
  def withSplit(df: DataFrame, key: String, nBuckets: Int = 10,
                trainBuckets: Int = 8): DataFrame =
    df.withColumn("split",
      when(splitBucket(col(key), nBuckets) < trainBuckets, "train")
        .otherwise("test"))

  /** TSV export (header-less, tab-separated — the embedding-projector
    * format the reference emits). */
  def exportTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)
}
