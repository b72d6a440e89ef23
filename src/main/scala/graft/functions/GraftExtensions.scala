package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-wide registration of graft's native expressions via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — the deployment path that
  * makes `graft_simhash60` / `graft_minhash` / `graft_dot` available to
  * every session and to plain SQL users, without per-DataFrame
  * registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule { session =>
      graft.plans.RangeJoinBinning(
        session.conf.get("spark.graft.rangeJoin.binSize", "86400").toLong)
    }
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(array<string>) - 60-bit simhash"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(array<string>, k) - k-element minhash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(array<double>, array<double>) - dot product"),
      (exprs: Seq[Expression]) => DotDouble(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "graft_l2sq(array<double>, array<double>) - squared L2 distance"),
      (exprs: Seq[Expression]) => L2SqDouble(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_jlproject"),
      info("graft_jlproject",
        "graft_jlproject(array<float|double>, planes) - micro-rounded JL projections"),
      (exprs: Seq[Expression]) => JlProject(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(array<string>, n) - distinct word n-gram shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("graft_char_ssq"),
      info("graft_char_ssq", "graft_char_ssq(string) - sum of squared code-point counts"),
      (exprs: Seq[Expression]) => CharSsq(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_hll_sketch"),
      info("graft_hll_sketch", "graft_hll_sketch(col[, p]) - portable HLL sketch bytes"),
      (exprs: Seq[Expression]) => HllSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null).asInstanceOf[Int] else 12)))
    e.injectFunction((
      FunctionIdentifier("graft_hll_union"),
      info("graft_hll_union", "graft_hll_union(sketch) - union of HLL sketches"),
      (exprs: Seq[Expression]) => HllUnionAgg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_hll_est"),
      info("graft_hll_est", "graft_hll_est(sketch) - cardinality estimate"),
      (exprs: Seq[Expression]) => HllEstimate(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_sketch"),
      info("graft_kmv_sketch", "graft_kmv_sketch(col[, k]) - portable k-minimum-values sketch bytes"),
      (exprs: Seq[Expression]) => KmvSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null).asInstanceOf[Int] else 4096)))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_union"),
      info("graft_kmv_union", "graft_kmv_union(sketch) - union of KMV sketches"),
      (exprs: Seq[Expression]) => KmvUnionAgg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_est"),
      info("graft_kmv_est", "graft_kmv_est(sketch) - distinct estimate"),
      (exprs: Seq[Expression]) => KmvEstimate(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_inter"),
      info("graft_kmv_inter", "graft_kmv_inter(a, b) - intersection-cardinality estimate"),
      (exprs: Seq[Expression]) => KmvIntersect(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "graft_bloom_agg(hash64[, numBits, numHashes]) - portable Bloom filter bytes"),
      (exprs: Seq[Expression]) => BloomAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null).asInstanceOf[Int] else 1 << 20,
        if (exprs.size > 2) exprs(2).eval(null).asInstanceOf[Int] else 5)))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "graft_bloom_contains(filter, hash64) - membership probe"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_cm_sketch"),
      info("graft_cm_sketch", "graft_cm_sketch(item, weight[, width, depth]) - count-min sketch bytes"),
      (exprs: Seq[Expression]) => CmSketchAgg(exprs(0), exprs(1),
        if (exprs.size > 2) exprs(2).eval(null).asInstanceOf[Int] else 1024,
        if (exprs.size > 3) exprs(3).eval(null).asInstanceOf[Int] else 4)))
    e.injectFunction((
      FunctionIdentifier("graft_cm_union"),
      info("graft_cm_union", "graft_cm_union(sketch) - union of count-min sketches"),
      (exprs: Seq[Expression]) => CmUnionAgg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_cm_est"),
      info("graft_cm_est", "graft_cm_est(sketch, item) - frequency estimate"),
      (exprs: Seq[Expression]) => CmEstimate(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_mg_sketch"),
      info("graft_mg_sketch", "graft_mg_sketch(col[, k]) - Misra-Gries heavy-hitter candidates"),
      (exprs: Seq[Expression]) => MgSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null).asInstanceOf[Int] else 4096)))
    e.injectFunction((
      FunctionIdentifier("graft_qsketch"),
      info("graft_qsketch", "graft_qsketch(value, idStr[, k]) - deterministic bottom-k quantile sketch"),
      (exprs: Seq[Expression]) => QSketchAgg(exprs(0), exprs(1),
        if (exprs.size > 2) exprs(2).eval(null).asInstanceOf[Int] else 1024)))
    e.injectFunction((
      FunctionIdentifier("graft_qsketch_union"),
      info("graft_qsketch_union", "graft_qsketch_union(sketch) - union of quantile sketches"),
      (exprs: Seq[Expression]) => QSketchUnionAgg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_qsketch_q"),
      info("graft_qsketch_q", "graft_qsketch_q(sketch, q) - nearest-rank quantile estimate"),
      (exprs: Seq[Expression]) => QSketchQuantile(exprs(0), exprs(1))))
  }
}
