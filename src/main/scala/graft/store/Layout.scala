package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout strategies for the 100 TB deployment (SURVEY.md §5).
  *
  * - Bucketed tables: co-partition fact tables on the join key at write
  *   time so repeated key joins (document ⋈ chunks, events ⋈ events) plan
  *   with NO shuffle exchange on either side.
  * - Session/date partitioned directories: session-scoped queries
  *   (find_by_session, incremental clone) prune entire partitions.
  * - Salted joins: a hot key (one session producing 1% of all events)
  *   would put its whole key group on one reducer; salting fans the hot
  *   side across `salt` sub-keys and replicates the small side.
  */
object Layout {

  /** Write bucketed+sorted by the join key. Readers joining two tables
    * bucketed the same way get a shuffle-free sort-merge join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Write partitioned by a low-cardinality scope column (session/date):
    * directory-level pruning for scoped reads.
    */
  def writePartitioned(df: DataFrame, path: String, scopeCol: String): Unit =
    df.write.partitionBy(scopeCol).mode("overwrite").parquet(path)

  /** Skew-safe equi-join: fan the (big, possibly skewed) left side over
    * `salt` sub-keys derived from a unique column, replicate the small
    * right side across all sub-keys, join on (key, salt). Output equals
    * the plain join; the hot key's rows now spread over `salt` reducers.
    * (AQE skew-join handles moderate skew automatically; explicit salting
    * is for the pathological keys AQE splits can't fix, e.g. one key
    * bigger than executor memory.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(salt)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
