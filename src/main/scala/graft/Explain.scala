package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for the named
  * queries (or a default set of representative ones). Used to audit
  * pushdown (`PushedFilters`/`ReadSchema`), join strategies (broadcast vs
  * shuffle) and whole-stage-codegen coverage — see SURVEY.md §5.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "ts_find_filter_project", "q1_pricing_summary", "q3_top_revenue",
      "q5_region_revenue", "ts_lookup_join", "ts_clone_incremental",
      "dedup_minhash_lsh", "dedup_embedding_cosine", "ann_lsh_bucketed",
      "ts_asof_join_exec", "dedup_embedding_cosine_lsh", "q17_small_qty_revenue",
      "q22_idle_balances", "q9_part_profit", "q13_order_distribution",
      "corpus_dedup_paragraph", "text_tfidf_topk", "text_inverted_index",
      "agg_qsketch_quantiles")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
