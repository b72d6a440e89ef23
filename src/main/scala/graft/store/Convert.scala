package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage→storage migration jobs — the Spark twins of the reference's
  * convert CLI (reference src/topic_store/convert.py):
  *
  * - `migrate` ≙ `mongodb_to_mongodb_clone_fast` (convert.py:136-186):
  *   copy only documents missing from the destination. The reference pulls
  *   every destination id into a driver-side set and round-trips each
  *   document; here it is one distributed anti-join + one append write —
  *   the only shape that survives 100 TB.
  * - `exportByTopic` ≙ `mongodb_to_ros_bag` (convert.py:190-213): a bag is
  *   a per-topic time-ordered log; the columnar analog is a
  *   topic-partitioned, time-sorted parquet layout.
  */
object Convert {

  /** Data files under `path` (recursive, skipping `_SUCCESS`/hidden). */
  private def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) out += f.getPath.toString
      }
      out.toSeq
    }
  }

  /** Incremental copy: append to `dstPath` the rows of `src` whose `key`
    * is not already present. Returns the number of rows copied.
    *
    * Single source scan: the anti-join result is WRITTEN first, and the
    * copied-row count comes from the parquet footers of the newly created
    * files (metadata-only) — not a second `count()` job re-scanning the
    * source.
    */
  def migrate(spark: SparkSession, src: DataFrame, dstPath: String, key: String): Long = {
    val existing =
      try spark.read.parquet(dstPath).select(key)
      catch { case _: Exception => spark.emptyDataFrame.withColumn(key,
        org.apache.spark.sql.functions.lit(null).cast("long")) }
    val missing = DocumentStore.cloneMissing(src, existing, key)
    val before = listDataFiles(spark, dstPath).toSet
    missing.write.mode("append").parquet(dstPath)
    val fresh = listDataFiles(spark, dstPath).filterNot(before)
    if (fresh.isEmpty) 0L
    else spark.sparkContext
      .parallelize(fresh, math.min(fresh.size, spark.sparkContext.defaultParallelism))
      .map { p =>
        import scala.jdk.CollectionConverters._
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }
      .sum().toLong
  }

  /** Export as a per-topic, time-ordered log layout. */
  def exportByTopic(df: DataFrame, topicCol: String, tsCol: String, dstPath: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(topicCol))
      .sortWithinPartitions(topicCol, tsCol)
      .write.partitionBy(topicCol).mode("overwrite").parquet(dstPath)
}
