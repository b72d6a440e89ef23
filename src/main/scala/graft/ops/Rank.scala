package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order rank / ntile / prefix-sum — the replacement for
  * every corpus-scale `ntile(k).over(Window.orderBy(...))` (a
  * partition-less window funnels ALL rows through ONE task: the
  * `WindowExec: No Partition Defined` scale defect).
  *
  * Shape: `repartitionByRange` on the caller's total order (Spark's
  * sample-based `RangePartitioner` — the same machinery a global
  * `orderBy` uses, so partitions are range-ordered and every key lands
  * in exactly one partition), then the global rank decomposes as
  *
  *   rank(row) = (#rows in earlier partitions) + row_number within its
  *               partition
  *
  * where the per-partition counts are a `numShufflePartitions`-row
  * aggregate whose cumulative offsets broadcast back. The only windows
  * are (a) PARTITIONED by `__pid` — parallelism = partition count — and
  * (b) the offset cumsum over the partition-count-sized table, declared
  * bounded with the repo's `partitionBy(lit(0))` convention. Ranks are
  * EXACT for any sampled boundary placement: the offsets come from the
  * realized partition counts, not from the sample, and the caller's
  * order must be a deterministic TOTAL order (unique tie-break column),
  * so ties never straddle a rank ambiguity.
  *
  * The ranged frame is persisted through [[OpCache]] for the duration of
  * the query: the rank side and the offsets side must observe the SAME
  * physical partitioning, and while Spark's exchange reuse makes that
  * the overwhelmingly common plan, a cache makes it a contract (shuffle
  * fetch order is not deterministic, so two independent executions of a
  * range exchange may sample different boundaries). The FULL caller
  * frame is cached — all its columns, not just the order columns (the
  * carry columns cannot be re-joined generically) — so callers ranking
  * a wide corpus should pre-project to the order + carry columns they
  * need; the intended input is a pre-aggregated table (per-doc counts,
  * per-customer rollups), not raw documents.
  */
private[graft] object Rank {

  /** Working columns these operators add internally. Caller frames must
    * not collide with them: `withColumn` silently REPLACES same-named
    * columns, which would corrupt results instead of failing.
    */
  private val Reserved = Set("__pid", "__rank", "__total", "__below",
    "__base", "__cut", "__c")

  private def checkNames(df: DataFrame, extra: Set[String]): Unit = {
    val clash = df.columns.toSet.intersect(Reserved ++ extra)
    require(clash.isEmpty,
      s"Rank: input columns ${clash.mkString(", ")} collide with reserved working names")
  }

  private def ranged(df: DataFrame, order: Seq[Column]): DataFrame = {
    val p = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    OpCache.share(
      df.repartitionByRange(p, order: _*)
        .withColumn("__pid", spark_partition_id()),
      enabled = true)
  }

  /** Per-`__pid` offset table: rows strictly below each partition plus,
    * for every `sums` column, the non-null SUM and non-null COUNT of the
    * rows strictly below (offsets exclude the partition's own
    * contribution; NULL values contribute 0 to the sum and 0 to the
    * count, matching SQL aggregate semantics).
    */
  private def offsets(r: DataFrame, sums: Seq[String]): DataFrame = {
    val run = Window.partitionBy(lit(0)).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(0))
    val aggs = count(lit(1)).as("__c") +:
      sums.flatMap(s => Seq(
        coalesce(sum(col(s)), lit(0L)).as(s"__s_$s"),
        count(col(s)).as(s"__n_$s")))
    val base = r.groupBy("__pid").agg(aggs.head, aggs.tail: _*)
    val withRows = base
      .withColumn("__below", sum(col("__c")).over(run) - col("__c"))
      .withColumn("__total", sum(col("__c")).over(all))
    sums.foldLeft(withRows) { (d, s) =>
      d.withColumn(s"__below_$s", sum(col(s"__s_$s")).over(run) - col(s"__s_$s"))
        .withColumn(s"__belown_$s", sum(col(s"__n_$s")).over(run) - col(s"__n_$s"))
    }.drop("__c").drop(sums.flatMap(s => Seq(s"__s_$s", s"__n_$s")): _*)
  }

  /** Attach the exact 1-based global rank over `order` (MUST be a total
    * order — include a unique tie-break column) as `rankCol`, plus the
    * row total as `totalCol`. No partition-less window touches more than
    * the partition-count-sized offset table.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
                     rankCol: String = "__rank",
                     totalCol: String = "__total"): DataFrame = {
    checkNames(df, Set(rankCol, totalCol))
    val r = ranged(df, order)
    val local = Window.partitionBy("__pid").orderBy(order: _*)
    r.join(broadcast(offsets(r, Nil)), Seq("__pid"))
      .withColumn(rankCol, row_number().over(local).cast("long") + col("__below"))
      .withColumnRenamed("__total", totalCol)
      .drop("__pid", "__below")
  }

  /** Exact SQL-`ntile(buckets) OVER (ORDER BY order…)` without the
    * single-partition window: closed-form ntile of the distributed rank
    * (base = N div k rows per bucket, the first N mod k buckets take one
    * extra — identical to SQL ntile over the same total order). Emits
    * `out` as INT like Spark's ntile. Pure integer arithmetic.
    */
  def rangedNtile(df: DataFrame, buckets: Int, order: Seq[Column],
                  out: String): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    checkNames(df, Set(out))
    val ranked = withGlobalRank(df, order)
    // duplicated from TextAnalysis.curriculum's closed form: base-sized
    // buckets after the first `rem` (base+1)-sized ones; greatest() keeps
    // the dead branch div-by-zero-free under ANSI when buckets > N.
    val base = expr(s"__total DIV $buckets")
    val rem = col("__total") % buckets
    val cut = rem * (base + 1)
    ranked
      .withColumn("__base", base)
      .withColumn("__cut", cut)
      .withColumn(out,
        (when(col("__rank") <= col("__cut"),
            expr("(__rank - 1) DIV (__base + 1)"))
          .otherwise(rem + expr("(__rank - 1 - __cut) DIV greatest(__base, 1L)"))
          + 1).cast("int"))
      .drop("__rank", "__total", "__base", "__cut")
  }

  /** Exact running sum of `value` over the `order` total order (the
    * `sum(v).over(Window.orderBy(...))` prefix sum) without the
    * single-partition window: partition-local running sum + the
    * broadcast per-partition offsets. `value` must be a LONG column
    * name on `df`. NULL semantics match SQL exactly: NULL values are
    * skipped (the prior non-null prefix carries forward), and a row
    * whose whole prefix is NULL gets a NULL running sum.
    */
  def withRunningSum(df: DataFrame, order: Seq[Column], value: String,
                     out: String): DataFrame = {
    checkNames(df, Set(out, s"__below_$value", s"__belown_$value"))
    val r = ranged(df, order)
    val local = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // count() skips NULLs: localN + __belown = non-null values in the
    // whole prefix; zero ⇒ SQL's running sum is NULL, else the two
    // coalesced partial sums add exactly.
    val localSum = sum(col(value)).over(local)
    val localN = count(col(value)).over(local)
    r.join(broadcast(offsets(r, Seq(value))), Seq("__pid"))
      .withColumn(out,
        when(localN + col(s"__belown_$value") === 0L, lit(null).cast("long"))
          .otherwise(coalesce(localSum, lit(0L)) + col(s"__below_$value")))
      .drop("__pid", "__below", "__total", s"__below_$value", s"__belown_$value")
  }
}
