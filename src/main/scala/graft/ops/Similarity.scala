package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteTopK` is the exact baseline (score every corpus vector per query,
  * windowed top-k). `lshTopK` is the scale path: sign-random-projection
  * buckets shrink each query's candidate set to ~corpus/2^planes — the
  * bucket build is one scan, the probe an equality join.
  */
object Similarity {

  /** Embeddings widened to double with the L2 norm precomputed. */
  def prep(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))

  private def cosineExpr: Column =
    expr("aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
      (col("q.norm") * col("c.norm"))

  /** Exact top-k neighbors for each query vector (brute force). Per-query
    * ranking is a window over the scored candidates; Spark plans the
    * rank-filter as a running top-k, not a full sort of the cross product.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    prep(queries).as("q").join(prep(corpus).as("c"),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane weights: plane p, dimension d →
    * md5-derived value in [-7.5, 7.5]. Reproducible in SQL (oracle) and on
    * any cluster without shipping a weights file.
    */
  def hyperplanes(spark: org.apache.spark.sql.SparkSession, planes: Int, dims: Int): DataFrame =
    spark.range(planes).withColumnRenamed("id", "p")
      .crossJoin(spark.range(dims).withColumnRenamed("id", "d"))
      .withColumn("w",
        expr("cast(instr('0123456789abcdef', substr(md5(concat(cast(p as string), '|', cast(d as string))), 1, 1)) - 1 as double) - 7.5"))

  /** Bucket id per vector: sign bit per hyperplane packed into a long.
    * Two partial-aggregated groupBys; the hyperplane table is broadcast.
    */
  def buckets(emb: DataFrame, planes: Int): DataFrame = {
    val hp = hyperplanes(emb.sparkSession, planes, 64)
    prep(emb)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("d", "x")))
      .join(broadcast(hp), "d")
      .groupBy("vec_id", "p").agg(sum(col("w") * col("x")).as("proj"))
      .groupBy("vec_id")
      .agg(expr("sum(if(proj >= 0, shiftleft(1L, cast(p as int)), 0L))").as("bucket"))
  }

  /** LSH-bucketed ANN: score only candidates sharing the query's bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val cb = buckets(corpus, planes)
    val qb = buckets(queries, planes)
    val cPrep = prep(corpus).join(cb, "vec_id")
    val qPrep = prep(queries).join(qb, "vec_id")
    qPrep.as("q").join(cPrep.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
