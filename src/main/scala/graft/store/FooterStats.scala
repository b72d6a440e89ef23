package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Serializable carrier for the session's Hadoop configuration.
  *
  * Executor-side metadata reads (parquet footers below) must see the SAME
  * filesystem configuration as the driver — object-store credentials,
  * endpoints, `spark.hadoop.*` overrides. A bare `new Configuration()` on
  * the executor works on local disk but silently mis-resolves S3/GCS/HDFS,
  * exactly the deployments the metadata-only paths exist for. Hadoop's
  * `Configuration` is `Writable` but not `Serializable` (and Spark's own
  * wrapper is `private[spark]`), so serialize via write/readFields.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Distributed parquet-footer row counting: metadata-only, no column data
  * read. The driver lists the files; executors each open a slice of the
  * footers (a 100 TB table has ~10^5 files — listing is cheap, opening
  * every footer from the driver is not).
  */
object FooterStats {
  def rowCount(spark: SparkSession, files: Seq[String]): Long = {
    if (files.isEmpty) return 0L
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(files, math.min(files.size, spark.sparkContext.defaultParallelism))
      .map { p =>
        import scala.jdk.CollectionConverters._
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(p), conf.value)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }
      .sum().toLong
  }

  /** Data files under `path` (recursive, skipping `_SUCCESS`/hidden). */
  def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
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
}
