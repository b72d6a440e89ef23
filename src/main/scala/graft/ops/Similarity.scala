package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteTopK` is the exact baseline (score every corpus vector per query,
  * windowed top-k). `lshTopK` is the scale path: sign-random-projection
  * buckets shrink each query's candidate set to ~corpus/2^planes — the
  * bucket build is one scan, the probe an equality join.
  *
  * All dot products go through the native `graft_dot` expression
  * (graft.functions.DotDouble): codegen'd tight loop, bit-identical to a
  * sequential double fold.
  */
object Similarity {

  /** Embeddings widened to double with the L2 norm precomputed. The scan
    * is spread across cores only when narrower than the cluster (see
    * Dedup.spread — guarded, so a pre-partitioned input takes no Exchange).
    */
  def prep(emb: DataFrame): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    Dedup.spread(emb)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
  }

  private def cosineExpr: Column =
    expr("graft_dot(q.v, c.v)") / (col("q.norm") * col("c.norm"))

  /** Exact top-k neighbors for each query vector (brute force). Per-query
    * ranking is a window over the scored candidates; the rank filter plans
    * as a running top-k, not a full sort of the cross product.
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
    * first md5('p|d') hex nibble − 7.5 ∈ [−7.5, 7.5]. Identical to the SQL
    * oracle's `strpos('0123456789abcdef', substr(md5(...), 1, 1)) − 1`, and
    * reproducible on any cluster without shipping a weights file.
    */
  def planeWeights(planes: Int, dims: Int): Array[Array[Double]] =
    graft.functions.JlProjectImpl.planeWeights(planes, dims)

  /** The packed SRP bucket id as one column expression over a double-array
    * column — the weights are literal arrays in the plan (no join, no
    * shuffle): one codegen'd dot per plane per row. Shared by the batch
    * bucket build and the streaming probes (`Monitor.embNearDupStream`),
    * so both sides hash identically by construction.
    */
  def bucketExpr(planes: Int, vCol: String = "v"): Column = {
    val w = planeWeights(planes, 64)
    def wLit(p: Int): String =
      w(p).map(x => s"cast($x as double)").mkString("array(", ",", ")")
    (0 until planes)
      .map(p => when(expr(s"graft_dot($vCol, ${wLit(p)})") >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Bucket id per vector: sign bit per hyperplane packed into a long. */
  def buckets(emb: DataFrame, planes: Int): DataFrame =
    prep(emb).select(col("vec_id"), bucketExpr(planes).as("bucket"))

  /** The persisted SRP probe index (vec_id, v, norm, bucket) — the static
    * side every ingest-time embedding near-dup probe joins against
    * (`Monitor.embNearDupStream`), and the bucketed corpus half of
    * [[lshTopK]] reusable across queries. One scan; parquet-persist the
    * result and it never needs re-bucketing.
    */
  def srpIndex(emb: DataFrame, planes: Int = 4): DataFrame =
    prep(emb).withColumn("bucket", bucketExpr(planes))

  /** SRP recall audit with PLANTED perturbed vectors — the embedding-side
    * twin of the token-shingle audit (Dedup.lshPlantedRecall, 42cc): are
    * the `planes` bits actually catching the near-duplicates at the
    * angles my corpus drifts by? A deterministic md5 sample of vectors is
    * perturbed by per-dimension multiplicative noise whose MAGNITUDE
    * sweeps with vec_id % 10 (0% … 90% — so the audit covers the whole
    * angle range instead of one operating point), the twins probe the
    * PRODUCTION [[srpIndex]] by bucket equality exactly like an ingest
    * increment, and each planted pair reports its cosine (micro,
    * round-to-integer — the established engine-parity convention) next
    * to whether the probe surfaced it. Observed recall at angle θ sits
    * on the analytic SRP collision curve (1 − θ/π)^planes — pinned by
    * spec; the noise is md5-derived like [[planeWeights]], so the audit
    * replays identically on any cluster.
    */
  def srpPlantedRecall(emb: DataFrame, planes: Int = 4,
                       samplePermille: Int = 200): DataFrame = {
    require(samplePermille > 0 && samplePermille <= 1000)
    val base = prep(emb)
    val sampled = base.filter(expr(
      "cast(conv(substring(md5(cast(vec_id as string)), 1, 13), 16, 10) as bigint)" +
        s" % 1000 < $samplePermille"))
    val twins = sampled
      .select(col("vec_id"), expr(
        """transform(v, (x, i) -> x * (1 + (cast(instr('0123456789abcdef',
          |substr(md5(concat(cast(vec_id as string), '|', cast(i as string))), 1, 1))
          |- 1 as double) - 7.5) * cast(vec_id % 10 as double) / 75.0))"""
          .stripMargin.replace("\n", " ")).as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
    val probes = twins.select(col("vec_id"), bucketExpr(planes).as("bucket"))
    // production probe shape: bucket-equality join against the index —
    // at 10¹⁰ vectors the probe side stays O(sample), never all-pairs
    val hits = probes.as("p")
      .join(srpIndex(emb, planes).select(col("vec_id"), col("bucket")).as("ix"),
        col("p.bucket") === col("ix.bucket") && col("p.vec_id") === col("ix.vec_id"))
      .select(col("p.vec_id").as("vec_id"), lit(1L).as("srp_hit"))
    sampled.as("o")
      .join(twins.select(col("vec_id"), col("v").as("tv"),
        col("norm").as("tnorm")), Seq("vec_id"))
      .select(col("vec_id"),
        expr("cast(round(graft_dot(v, tv) / (norm * tnorm) * 1000000) as bigint)")
          .as("cos_micro"))
      .join(hits, Seq("vec_id"), "left").na.fill(0L, Seq("srp_hit"))
      .orderBy(col("vec_id"))
  }

  /** Spherical k-means coarse quantizer for IVF, trained driver-side on a
    * deterministic seeded sample. This is the standard IVF training shape
    * (FAISS trains its coarse quantizer on ~10⁵–10⁶ sampled vectors, not
    * the corpus): the hash-ordered sample is one distributed top-`sampleCap`
    * (TakeOrdered — no full sort), Lloyd iterations run on ≤ sampleCap
    * unit vectors in driver memory, and the expensive steps — corpus
    * assignment and query probing — stay fully distributed in
    * [[ivfAssign]]. Deterministic end-to-end: xxhash64-seeded sample
    * order, first-k init, fixed iteration count, max-dot/lowest-index
    * tie-break — identical centroids on any cluster, no weights file.
    */
  def kmeansCentroids(emb: DataFrame, kCells: Int, iters: Int = 5,
                      sampleCap: Int = 100000, seed: Long = 42L): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = prep(emb)
      .orderBy(xxhash64(concat_ws("|", col("vec_id"), lit(seed))), col("vec_id"))
      .limit(sampleCap)
      .select(expr("transform(v, x -> x / norm)").as("nv"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= kCells, s"need >= $kCells sample vectors, got ${sample.length}")
    val dim = sample.head.length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    var cents = sample.take(kCells).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(kCells)(new Array[Double](dim))
      val counts = new Array[Long](kCells)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < kCells) {
          val d = dot(v, cents(c))
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(kCells) { c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else {
          val m = sums(c)
          val n = math.sqrt(dot(m, m))
          if (n == 0) cents(c) else m.map(_ / n)
        }
      }
    }
    cents
  }

  /** IVF cell assignment: nearest of `kCells` coarse centroids per vector.
    *
    * Default quantizer: the first `kCells` corpus vectors serve as
    * centroids — reproducible and oracle-checkable (a SQL engine can name
    * the same centroids), the right baseline for correctness gating. Pass
    * `centroids` (e.g. from [[kmeansCentroids]]) for recall on real
    * corpora — the assignment/probe machinery is identical. Centroids
    * broadcast either way; assignment is one scan.
    */
  def ivfAssign(emb: DataFrame, kCells: Int, rankCol: String = "cell_rank",
                centroids: Option[Array[Array[Double]]] = None,
                centroidSource: Option[DataFrame] = None): DataFrame = {
    val cents = centroids match {
      case None =>
        // default quantizer = first-k vectors of `centroidSource` (the
        // CORPUS when assigning queries — both sides of an IVF probe must
        // share one quantizer, and a query frame is rarely a superset of
        // the corpus' first k)
        prep(centroidSource.getOrElse(emb).filter(col("vec_id") < kCells))
          .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))
      case Some(cs) =>
        val spark = emb.sparkSession
        import spark.implicits._
        VectorFunctions.register(spark)
        cs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v.toSeq) }
          .toDF("cell", "cv")
          .withColumn("cnorm", expr("sqrt(graft_dot(cv, cv))"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cell_cos").desc, col("cell"))
    prep(emb).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("norm"), col("cell"),
        (expr("graft_dot(v, cv)") / (col("norm") * col("cnorm"))).as("cell_cos"))
      .withColumn(rankCol, row_number().over(w))
  }

  /** Johnson–Lindenstrauss random projection — the dimensionality
    * reduction the SRP bucketer takes the SIGN of, kept as values: each
    * vector becomes `planes` projections onto the md5-derived literal
    * hyperplanes ([[planeWeights]] — engine-portable, no RNG, no weights
    * file). 64 floats → `planes` longs is the cheap compression feeding
    * approximate distance/cosine estimates downstream (E[p·p'] tracks
    * v·v' up to the JL distortion), and pairs of projections are the
    * input to any learned index. Exactness: weight entries are halves
    * (k − 7.5 — exact in binary), x is a float image, so x·w·10⁶ is one
    * exact double product per term, micro-rounded BEFORE the per-row
    * integer sum — associative, bit-identical in any engine. Zero
    * shuffles: the weights ride the plan as literals.
    */
  def jlProject(emb: DataFrame, planes: Int = 16): DataFrame = {
    // one native codegen'd pass over the float array (graft_jlproject)
    // instead of `planes` interpreted aggregate(zip_with(...)) lambdas —
    // identical per-term micro-rounding and fold order, 4× on the bench
    VectorFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"),
        expr(s"graft_jlproject(embedding, $planes)").as("projs"))
      .select(col("vec_id"),
        posexplode(col("projs")).as(Seq("p", "proj_micro")))
      .orderBy(col("vec_id"), col("p"))
  }

  /** Cluster-balanced diversity sampling: assign every vector to its
    * nearest coarse cell ([[ivfAssign]] — broadcast centroids, one
    * scan), then keep the first `perCell` vectors per cell in the
    * deterministic md5 order — the embedding-space analogue of
    * stratified sampling, the standard move for building a
    * diversity-preserving subset of a skewed corpus (a dominant content
    * cluster contributes `perCell` rows, same as a rare one).
    *
    * Scale shape: the per-cell pick is a running top-k window over k
    * partitions; with few cells and a huge corpus that window's sort is
    * the bottleneck — raise kCells (256–4096 trained centroids via
    * [[kmeansCentroids]]) so the shuffle fans out, and the pick stays
    * O(corpus) scan + O(kCells·perCell) output. The md5 key means the
    * sample is reproducible on any cluster layout or engine.
    */
  def clusterSample(emb: DataFrame, kCells: Int = 8, perCell: Int = 16,
                    centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("u"), col("vec_id"))
    ivfAssign(emb, kCells, centroids = centroids)
      .filter(col("cell_rank") === 1)
      .withColumn("u", expr("substr(md5(cast(vec_id as string)), 1, 13)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCell)
      .select(col("cell"), col("vec_id"), col("rank"))
      .orderBy(col("cell"), col("rank"))
  }

  /** Per-cell embedding outliers — the curation sweep that catches
    * mislabeled, corrupted, or off-manifold vectors BEFORE they pollute
    * dedup thresholds and retrieval quality: assign every vector to its
    * nearest coarse cell ([[ivfAssign]]), micro-round the cosine to its
    * own centroid, and flag the bottom `permille`‰ of each cell by exact
    * integer rank (rank·1000 ≤ cellCount·permille — no float quantile
    * estimation, no global threshold that a dense cell would drown out).
    * A vector far from EVERY centroid is precisely a vector far from its
    * best one, so one assignment pass suffices.
    *
    * Scale shape: the assignment is a broadcast-centroid scan; the flag
    * is one per-cell window (the [[clusterSample]] caveat applies — with
    * a huge corpus raise kCells via [[kmeansCentroids]] so the window
    * fans out). Integer epilogue → engine-exact.
    */
  def cellOutliers(emb: DataFrame, kCells: Int = 8, permille: Int = 100,
                   centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("cos_micro"), col("vec_id"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("cell")
    ivfAssign(emb, kCells, centroids = centroids)
      .filter(col("cell_rank") === 1)
      .withColumn("cos_micro", expr("cast(round(cell_cos * 1000000.0D) as bigint)"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wc))
      .filter(col("r") * 1000 <= col("cnt") * permille)
      .select(col("cell"), col("vec_id"), col("cos_micro"), col("r"))
      .orderBy(col("cell"), col("r"))
  }

  /** IVF ANN: score only candidates whose cell is among the query's
    * `nprobe` nearest cells. Probe cost ≈ corpus · nprobe / kCells per
    * query instead of the full corpus. `centroids` switches both sides to
    * a trained quantizer (see [[kmeansCentroids]]); cells must come from
    * the same centroids as probes or recall collapses.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              kCells: Int = 8, nprobe: Int = 2,
              centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val cells = ivfAssign(corpus, kCells, centroids = centroids)
      .filter(col("cell_rank") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
    val probes = ivfAssign(queries, kCells, centroids = centroids,
        centroidSource = Some(corpus))
      .filter(col("cell_rank") <= nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("cell"))
    probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr("graft_dot(qv, v)") / (col("qnorm") * col("norm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Semantic deduplication (the SemDeDup shape, Abbas et al. 2023 —
    * public method): cluster embeddings into `kCells` via the IVF coarse
    * quantizer, compare pairs ONLY within a cell, and drop every vector
    * that has an above-threshold twin with a smaller id. Returns the
    * surviving vec_ids — the semantically deduplicated corpus.
    *
    * Scale shape: pair work collapses from the corpus n² to Σ|cell|²
    * (~n²/kCells balanced) and each cell's pairs come from one equality
    * join on the cell id — shuffle O(within-cell pairs). Cross-cell
    * near-dups are deliberately not compared: that is SemDeDup's
    * documented approximation, and raising kCells trades recall for
    * speed exactly as in the paper. Pass trained [[kmeansCentroids]] for
    * real corpora; the first-k default keeps the oracle reproducible.
    * Cosine is rounded to 6 dp before thresholding (cross-engine float
    * parity, SURVEY §6).
    */
  def semanticDedup(emb: DataFrame, threshold: Double, kCells: Int = 8,
                    centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val cells = ivfAssign(emb, kCells, centroids = centroids)
      .filter(col("cell_rank") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
    val dropped = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"),
        round(expr("graft_dot(a.v, b.v)") / (col("a.norm") * col("b.norm")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select("vec_id").distinct()
    emb.select("vec_id").join(dropped, Seq("vec_id"), "left_anti")
  }

  /** LSH-bucketed ANN: score only candidates sharing the query's bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val cPrep = prep(corpus).join(buckets(corpus, planes), "vec_id")
    val qPrep = prep(queries).join(buckets(queries, planes), "vec_id")
    qPrep.as("q").join(cPrep.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** (vec_id, d, x) triples, optionally L2-normalized. The norm comes
    * from `graft_dot`'s SEQUENTIAL fold (not a partial-aggregated sum),
    * so the doubles are bit-identical on any partitioning and equal to
    * an index-order SQL sum — the same portability contract the cosine
    * oracles rely on.
    */
  private def explodedVals(emb: DataFrame, normalize: Boolean): DataFrame =
    if (!normalize)
      Dedup.spread(emb)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("vec_id"), col("d"), col("x").cast("double").as("x"))
    else
      prep(emb)
        .select(col("vec_id"), col("norm"), posexplode(col("v")).as(Seq("d", "x")))
        .select(col("vec_id"), col("d"),
          when(col("norm") === 0.0, lit(0.0)).otherwise(col("x") / col("norm")).as("x"))

  /** Per-dimension corpus min/max — the affine scalar-quantizer training
    * pass. One scan, |dims| output rows (broadcast onward). Compute with
    * the same `normalize` the encoder will use.
    */
  def dimStats(emb: DataFrame, normalize: Boolean = true): DataFrame =
    explodedVals(emb, normalize)
      .groupBy(col("d"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Symmetric int8 scalar quantization against the given per-dim stats:
    * `code = clamp(floor((x − mn)·254 / (mx − mn)) − 127, ±127)`, with
    * vectors L2-normalized first by default (so the integer code dot
    * tracks COSINE — the retrieval metric — rather than raw inner
    * product; pass `normalize = false` for true-MIPS corpora). The
    * quantized corpus is the PERSISTED form at scale — 4× smaller than
    * float32 (32× vs the float64 compute form), so a 100 TB embedding
    * store scans as 25 TB and each executor holds 4× more candidates
    * in memory; the code dot is integer math (SIMD-friendly, and exact
    * in IEEE doubles — |code·code|·dims ≪ 2^53 — so partial-aggregation
    * order can't perturb it). Codes are engine-portable: normalization
    * and the affine map are fixed-tree double expressions, identical in
    * any IEEE engine, and everything after them is integer. Constant
    * dimensions and zero vectors quantize to 0; out-of-range query
    * values clamp.
    */
  def quantizeInt8(emb: DataFrame, stats: DataFrame,
                   normalize: Boolean = true): DataFrame =
    explodedVals(emb, normalize)
      .join(broadcast(stats), "d")
      .withColumn("code", when(col("mn") === col("mx"), lit(0L)).otherwise(
        expr("least(greatest(cast(floor(((x - mn) * 254.0D) / (mx - mn)) as bigint)" +
          " - 127L, -127L), 127L)")))
      .groupBy(col("vec_id"))
      .agg(collect_list(struct(col("d"), col("code"))).as("dc"))
      .withColumn("cv", expr("transform(array_sort(dc), s -> cast(s.code as double))"))
      .select(col("vec_id"), col("cv"))

  /** Quantized brute-force top-k: rank by the integer code dot product.
    * The memory/IO scale path that composes with the routing paths —
    * [[ivfTopK]]/[[lshTopK]] shrink WHO you score, int8 shrinks what
    * scoring COSTS; a production pipeline buckets first, scores codes,
    * then exact-re-ranks the shortlist with [[bruteTopK]] on the float
    * vectors. Queries quantize through the CORPUS stats (one broadcast),
    * so out-of-distribution queries clamp rather than shift the grid.
    */
  /** Product-quantization codebook: split `dims` into `m` subspaces and
    * take the first `codebookK` vectors' sub-vectors as centroids
    * (deterministic and oracle-reproducible, exactly like [[ivfTopK]]'s
    * first-k coarse quantizer — swap in per-subspace [[kmeansCentroids]]
    * for recall on real corpora). Output (s, j, cvec): m·codebookK rows,
    * broadcast onward.
    */
  def pqCodebook(emb: DataFrame, m: Int = 4, codebookK: Int = 256,
                 dims: Int = 64): DataFrame = {
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val sub = dims / m
    Dedup.spread(emb)
      .filter(col("vec_id") < codebookK)
      .select(col("vec_id").cast("int").as("j"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("j"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(v, s * $sub + 1, $sub) AS cvec))"))
        .as("e"))
      .select(col("e.s").as("s"), col("j"), col("e.cvec").as("cvec"))
  }

  /** Trained PQ codebook: per-subspace Lloyd k-means on a deterministic
    * seeded sample (the FAISS training shape, like [[kmeansCentroids]]
    * for the coarse quantizer but per subspace under squared-L2 — PQ
    * reconstructs sub-vectors, it does not rank directions, so centroids
    * are means, not unit vectors). One distributed TakeOrdered sample,
    * m independent driver-side trainings over ≤ sampleCap sub-vectors,
    * fixed iteration count, first-k init, min-distance/lowest-index
    * tie-break — identical centroids on any cluster. Output has the
    * same (s, j, cvec) shape as [[pqCodebook]]; [[pqEncode]]/[[pqTopK]]
    * composition is unchanged (first-k stays the oracle-reproducible
    * default, this is the recall path for real corpora).
    */
  def pqKmeansCodebook(emb: DataFrame, m: Int = 4, codebookK: Int = 256,
                       dims: Int = 64, iters: Int = 5,
                       sampleCap: Int = 100000, seed: Long = 42L): DataFrame = {
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val sub = dims / m
    val sample: Array[Array[Double]] = prep(emb)
      .orderBy(xxhash64(concat_ws("|", col("vec_id"), lit(seed))), col("vec_id"))
      .limit(sampleCap)
      .select(col("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= codebookK,
      s"need >= $codebookK sample vectors, got ${sample.length}")
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = (0 until m).flatMap { s =>
      val pts = sample.map(_.slice(s * sub, (s + 1) * sub))
      var cents = pts.take(codebookK).map(_.clone())
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < sub) { val t = a(i) - b(i); acc += t * t; i += 1 }
        acc
      }
      for (_ <- 1 to iters) {
        val sums = Array.fill(codebookK)(new Array[Double](sub))
        val counts = new Array[Long](codebookK)
        pts.foreach { p =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < codebookK) {
            val dd = d2(p, cents(c))
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
        }
        cents = Array.tabulate(codebookK) { c =>
          if (counts(c) == 0) cents(c) // empty cell keeps its centroid
          else sums(c).map(_ / counts(c))
        }
      }
      cents.zipWithIndex.map { case (cv, j) => (s, j, cv.toSeq) }
    }
    rows.toDF("s", "j", "cvec")
  }

  /** PQ encoding: each vector becomes `m` one-byte codes — the nearest
    * codebook centroid per subspace (squared-L2, sequential fold; ties
    * break on the lower code). The encoded corpus is the DEEP-compression
    * persisted form: m bytes per vector ≈ 64× smaller than float64 (vs
    * int8's 4×), which is what makes exhaustive candidate scoring over
    * 10¹⁰ vectors a memory-resident operation. The encode itself is an
    * embarrassingly parallel scan against the broadcast codebook; the
    * argmin is a map-side-combinable min(struct) — no window, no sort,
    * no shuffle beyond the final groupBy on (vec_id, s).
    */
  def pqEncode(emb: DataFrame, codebook: DataFrame, m: Int = 4,
               dims: Int = 64): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val sub = dims / m
    Dedup.spread(emb)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(v, s * $sub + 1, $sub) AS sv))"))
        .as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sv").as("sv"))
      .join(broadcast(codebook), "s")
      .withColumn("dm", expr(
        "cast(round(graft_l2sq(sv, cvec) * 1000000.0D) as bigint)"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dm"), col("j"))).getField("j").as("code"))
  }

  /** PQ top-k via asymmetric distance computation (ADC): the query stays
    * exact, each corpus vector is scored as Σ_s ‖q_s − c_{s,code}‖² read
    * from the query's per-subspace lookup table (|queries|·m·codebookK
    * rows, broadcast). Sub-distances are micro-unit integers (the BM25
    * parity trick), so the per-pair sum is exact integer addition —
    * partial-aggregation order can't perturb it and the oracle reproduces
    * SCORES bit-for-bit. Composes the same way as [[int8TopK]]: IVF/LSH
    * choose who to score, PQ makes scoring memory-resident, a float
    * re-rank of the shortlist restores exactness.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
             codebookK: Int = 256, dims: Int = 64): DataFrame = {
    val cb = pqCodebook(corpus, m, codebookK, dims)
    // the encoded corpus IS the op's persisted deep-compression form (m
    // bytes/vector); share it so repeated actions (rerank epilogues,
    // multi-batch serving) pay the O(corpus·K·dims) encode once — the
    // tfidf persist-the-shared-feed convention
    val codes = OpCache.share(pqEncode(corpus, cb, m, dims), enabled = true)
    val qtab = pqQueryTable(queries, cb, m, dims)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_micro"), col("neighbor_id"))
    codes.join(broadcast(qtab), Seq("s", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("dm")).as("adc_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_micro", "rank")
  }

  /** The per-query ADC lookup table: ‖q_s − c_{s,j}‖² for every
    * (subspace, codebook entry), micro-rounded — |queries|·m·codebookK
    * rows, built once and broadcast into every scoring join.
    */
  private def pqQueryTable(queries: DataFrame, codebook: DataFrame,
                           m: Int, dims: Int): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    val sub = dims / m
    Dedup.spread(queries)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("query_id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(v, s * $sub + 1, $sub) AS sv))"))
        .as("e"))
      .select(col("query_id"), col("e.s").as("s"), col("e.sv").as("sv"))
      .join(broadcast(codebook), "s")
      .withColumn("dm", expr(
        "cast(round(graft_l2sq(sv, cvec) * 1000000.0D) as bigint)"))
      .select(col("query_id"), col("s"), col("j").as("code"), col("dm"))
  }

  /** IVF+PQ — the FAISS-standard composition, wired end-to-end: the
    * coarse quantizer ([[ivfAssign]]) decides WHO gets scored (corpus ·
    * nprobe / kCells candidates per query, an equality join on the cell
    * id), PQ ADC decides what scoring COSTS (m integer adds per pair
    * read from the broadcast lookup table — the corpus side touches only
    * its m-byte codes, never the float vectors). Candidate pairs are
    * unique by construction (a corpus vector lives in exactly one cell,
    * a query probes nprobe DISTINCT cells), so no dedup step. Both
    * quantizers take trained centroids ([[kmeansCentroids]] /
    * per-subspace k-means) through the same parameters; first-k defaults
    * keep the oracle reproducible. A float re-rank of the returned
    * shortlist ([[bruteTopK]] over k·|queries| rows) restores exactness
    * at negligible cost — the standard three-stage retrieval stack.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                kCells: Int = 8, nprobe: Int = 2, m: Int = 4,
                codebookK: Int = 256, dims: Int = 64,
                centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val cb = pqCodebook(corpus, m, codebookK, dims)
    // shared for the same reason as pqTopK: the codes are the persisted
    // corpus form, encoded once per corpus, probed by every query batch
    val codes = OpCache.share(pqEncode(corpus, cb, m, dims), enabled = true)
    val cells = ivfAssign(corpus, kCells, centroids = centroids)
      .filter(col("cell_rank") === 1)
      .select(col("vec_id"), col("cell"))
    val probes = ivfAssign(queries, kCells, centroids = centroids,
        centroidSource = Some(corpus))
      .filter(col("cell_rank") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val qtab = pqQueryTable(queries, cb, m, dims)
    val cand = probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_micro"), col("neighbor_id"))
    cand.join(codes, Seq("vec_id"))
      .join(broadcast(qtab), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("dm")).as("adc_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_micro", "rank")
  }

  /** FAISS-style two-stage retrieval: the IVF+PQ shortlist (`rerank`
    * candidates per query, ADC-approximate) re-scored by EXACT cosine
    * against the raw vectors, then cut to the final top-k. The exact
    * work is O(queries·rerank·d) — never the corpus — and the shortlist
    * join ships O(queries·rerank) rows to wherever the raw vectors live;
    * this is the standard recall-repair epilogue every PQ deployment
    * runs (ADC distortion reorders near-ties; exact re-rank fixes the
    * head of the list at shortlist cost). `adc_micro` of each survivor
    * ships as integer evidence of the first stage.
    */
  def ivfPqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      rerank: Int = 50, kCells: Int = 8, nprobe: Int = 2,
                      m: Int = 4, codebookK: Int = 256,
                      dims: Int = 64): DataFrame = {
    val shortlist = ivfPqTopK(corpus, queries, rerank, kCells, nprobe, m,
      codebookK, dims)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist
      .join(prep(queries).as("q"), col("query_id") === col("q.vec_id"))
      .join(prep(corpus).as("c"), col("neighbor_id") === col("c.vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("adc_micro"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_micro", "rank")
  }

  /** Maximal-marginal-relevance diversification (Carbonell & Goldstein
    * 1998) over a retrieval shortlist — the LAST stage of the retrieval
    * stack: after IVF/PQ/re-rank produce the `rerank` most RELEVANT
    * candidates, MMR picks the `k` that are relevant AND mutually
    * diverse (`argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`),
    * the dedup-at-serving-time step a RAG pipeline wants so its context
    * window isn't five near-copies of one document.
    *
    * Greedy selection is inherently sequential per query, so it runs as
    * one typed fold per query group over the SHORTLIST ONLY (≤ rerank
    * rows — serving-bounded, never corpus-bounded; the k·rerank pairwise
    * sims compute inside the task): queries are the parallelism unit,
    * exactly the per-series smoother discipline. Candidates enter the
    * fold in the deterministic (relevance desc, id) order and ties
    * break on the smaller id, so the selection replays anywhere.
    *
    * `shortlist` needs (query_id, neighbor_id, cosine); vectors join
    * from `corpus`. λ in permille.
    */
  def mmrRerank(corpus: DataFrame, shortlist: DataFrame, k: Int,
                lambdaPermille: Int = 700): DataFrame = {
    require(k >= 1 && lambdaPermille >= 0 && lambdaPermille <= 1000)
    val spark = corpus.sparkSession
    import spark.implicits._
    val lam = lambdaPermille / 1000.0
    val withVec = shortlist
      .join(prep(corpus).as("c"), col("neighbor_id") === col("c.vec_id"))
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("cosine").cast("double"), col("c.v"), col("c.norm").cast("double"))
      .as[(Long, Long, Double, Seq[Double], Double)]
    withVec.groupByKey(_._1)
      .flatMapGroups { (q: Long, it: Iterator[(Long, Long, Double, Seq[Double], Double)]) =>
        val cands = it.toArray.sortBy(c => (-c._3, c._2))
        def sim(a: (Long, Long, Double, Seq[Double], Double),
                b: (Long, Long, Double, Seq[Double], Double)): Double = {
          var d = 0.0
          var i = 0
          val av = a._4; val bv = b._4
          while (i < av.length) { d += av(i) * bv(i); i += 1 }
          if (a._5 == 0.0 || b._5 == 0.0) 0.0 else d / (a._5 * b._5)
        }
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double, Seq[Double], Double)]
        val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
        while (selected.size < k && remaining.nonEmpty) {
          val best = remaining.minBy { c =>
            val pen = if (selected.isEmpty) 0.0 else selected.map(sim(c, _)).max
            (-(lam * c._3 - (1.0 - lam) * pen), c._2)
          }
          selected += best
          remaining -= best
        }
        selected.iterator.zipWithIndex.map { case (c, i) =>
          (q, c._2, c._3, i + 1)
        }
      }
      .toDF("query_id", "neighbor_id", "cosine", "mmr_rank")
  }

  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
               normalize: Boolean = true): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("idot").desc, col("neighbor_id"))
    val stats = dimStats(corpus, normalize)
    val c = quantizeInt8(corpus, stats, normalize)
    val q = quantizeInt8(queries, stats, normalize)
    q.as("q").join(c.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        expr("cast(graft_dot(q.cv, c.cv) as bigint)").as("idot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "idot", "rank")
  }

  /** Margin-based nearest-neighbor pair mining (the ratio-margin retrieval
    * criterion of Artetxe & Schwenk 2019, the standard bitext/semantic
    * pair-mining recipe): a pair (a, b) across two embedding sides scores
    * `margin = cos(a,b) / ((avgTopK(a→B) + avgTopK(b→A)) / 2)` — raw
    * cosine normalized by how crowded each endpoint's neighborhood is, so
    * hubs (vectors near everything) stop winning every pairing. Kept
    * pairs are MUTUAL margin-argmaxes above `minMarginPpm` — the
    * "intersection" strategy from the paper.
    *
    * Engine parity: each pair's cosine is one fixed-tree double expression
    * rounded to integer micro BEFORE anything aggregates (the BM25/PQ
    * trick), so the top-k sums are exact integer additions and the margin
    * is one integer division `cos_micro · 2k · 10⁶ div (Σ_a + Σ_b)` — the
    * oracle reproduces every score bit-for-bit on any partitioning.
    *
    * Scale shape: this is the exact all-pairs CORRECTNESS baseline
    * (O(|A|·|B|) scored pairs — the same contract as [[bruteTopK]]); at
    * corpus scale the identical rank/sum/margin epilogue runs over
    * LSH-bucket or IVF-cell candidates instead of the cross join
    * ([[lshTopK]]/[[ivfTopK]] shapes) — A&S themselves mine over an
    * ANN shortlist. The epilogue's shuffles are O(scored pairs): two
    * window top-k passes (per-partition heaps before the exchange), two
    * k-row-per-vector integer sums, one join back.
    */
  def marginPairs(sideA: DataFrame, sideB: DataFrame, k: Int = 4,
                  minMarginPpm: Long = 1000000L, cache: Boolean = true): DataFrame = {
    // the scored-pair table feeds three branches (two rank passes + the
    // margin join-back) — persisted so the cross product is paid once
    // (releasable via Dedup.unpersistShared, the tfidf discipline)
    val pairs = OpCache.share(
      prep(sideA).as("q").join(prep(sideB).as("c"),
          col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("a_id"), col("c.vec_id").as("b_id"),
          expr("cast(round(graft_dot(q.v, c.v) / (q.norm * c.norm) * 1000000.0D) as bigint)")
            .as("cos_micro")),
      cache)
    marginEpilogue(pairs, k, minMarginPpm)
  }

  /** [[marginPairs]] over SRP-LSH bucket candidates — the 100 TB mining
    * shape: each side hashes to sign-random-projection buckets ONCE
    * ([[buckets]] — the same deterministic hyperplanes as [[lshTopK]]),
    * candidates meet in an equality join on the bucket id, and the
    * identical margin epilogue ranks them. The normalizer top-k is taken
    * over each vector's CANDIDATE neighborhood (exactly what A&S do when
    * mining over an ANN shortlist — the margin is a local crowding
    * statistic either way). Shuffle O(candidate pairs) ≈ |A|·|B| / 2^planes
    * per bucket-match instead of the full cross product; raising `planes`
    * trades recall for candidate volume exactly as in [[lshTopK]].
    */
  def marginPairsLsh(sideA: DataFrame, sideB: DataFrame, k: Int = 4,
                     minMarginPpm: Long = 1000000L, planes: Int = 4,
                     cache: Boolean = true): DataFrame = {
    val a = prep(sideA).join(buckets(sideA, planes), "vec_id")
    val b = prep(sideB).join(buckets(sideB, planes), "vec_id")
    val pairs = OpCache.share(
      a.as("q").join(b.as("c"),
          col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("a_id"), col("c.vec_id").as("b_id"),
          expr("cast(round(graft_dot(q.v, c.v) / (q.norm * c.norm) * 1000000.0D) as bigint)")
            .as("cos_micro"))
        .distinct(), // a pair can collide in at most one bucket id, but keep the contract explicit
      cache)
    marginEpilogue(pairs, k, minMarginPpm)
  }

  /** The rank/sum/margin epilogue shared by the exact baseline and every
    * candidate-generation front end: takes (a_id, b_id, cos_micro) and
    * returns the mutual margin-argmax pairs. All integer arithmetic —
    * see [[marginPairs]] for the parity contract.
    */
  def marginEpilogue(pairs: DataFrame, k: Int,
                     minMarginPpm: Long): DataFrame = {
    require(k >= 1, "margin normalizer needs k >= 1")
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("cos_micro").desc, col("b_id"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("b_id").orderBy(col("cos_micro").desc, col("a_id"))
    val ranked = pairs
      .withColumn("rka", row_number().over(wa))
      .withColumn("rkb", row_number().over(wb))
    val sumA = ranked.filter(col("rka") <= k)
      .groupBy("a_id").agg(sum("cos_micro").as("s_a"))
    val sumB = ranked.filter(col("rkb") <= k)
      .groupBy("b_id").agg(sum("cos_micro").as("s_b"))
    // numerator clamped at 0: a negative-cosine pair can never be mined,
    // and truncating (Spark div) vs flooring (SQL //) integer division
    // disagree on negatives — clamping keeps every engine bit-identical.
    // s_a + s_b <= 0 (all-negative neighborhoods) can't yield a real
    // margin either; those endpoints are dropped before the division.
    val margins = pairs.join(sumA, "a_id").join(sumB, "b_id")
      .filter(col("s_a") + col("s_b") > 0)
      .withColumn("margin_ppm",
        expr(s"greatest(cos_micro, 0L) * ${2L * k} * 1000000L div (s_a + s_b)"))
    val ma = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("margin_ppm").desc, col("b_id"))
    val mb = org.apache.spark.sql.expressions.Window
      .partitionBy("b_id").orderBy(col("margin_ppm").desc, col("a_id"))
    margins
      .withColumn("best_a", row_number().over(ma))
      .withColumn("best_b", row_number().over(mb))
      .filter(col("best_a") === 1 && col("best_b") === 1 &&
        col("margin_ppm") >= minMarginPpm)
      .select(col("a_id"), col("b_id"), col("cos_micro"), col("margin_ppm"))
  }

  /** Gram matrix of the embedding corpus — Σ xᵢxⱼ over all vectors, the
    * Xᵀ X aggregation behind covariance, PCA, and whitening. The d×d
    * result is tiny; the whole job is making the SUM scale: each row
    * map-side explodes its d(d+1)/2 upper-triangle products (never a
    * row-pair join — O(n·d²) generated rows, but partial aggregation
    * collapses them to d² per partition BEFORE the one groupBy shuffle,
    * so the exchange carries O(partitions·d²) regardless of n). Products
    * of two floats are EXACT in double (24+24 < 53 mantissa bits);
    * rounding each to integer micro makes the running sum associative,
    * so any partitioning — and the oracle — reproduces it bit-for-bit.
    * Eigendecomposition of the d×d output is a driver-side epilogue (64²
    * doubles), which is exactly where it belongs at any corpus size.
    */
  /** Principal-component projection — the [[gramMatrix]] epilogue made
    * concrete: collect the d×d Gram (the ONLY driver-side data, d²
    * doubles at any corpus size), center it into a covariance, extract
    * the top-k eigenvectors by deterministic power iteration with
    * Gram-Schmidt deflation (fixed iteration count, fixed basis-vector
    * start — no RNG), then project every row through one broadcast
    * literal matrix: k codegen'd dot products per row, no shuffle at
    * all. This is the whitening/compression path: 64-d float embeddings
    * → k-d PCA codes with one corpus scan for stats and one for codes.
    * Sign convention: each eigenvector's largest-|component| entry is
    * made positive, so the output is reproducible across runs/engines.
    */
  def pcaProject(emb: DataFrame, k: Int = 4, dims: Int = 64,
                 iters: Int = 50): DataFrame = {
    require(k >= 1 && k <= dims)
    val n = emb.count().toDouble
    val sums = emb.select(expr(
        s"""explode(transform(sequence(0, ${dims - 1}), i ->
           |  struct(i AS i, cast(embedding[i] as double) AS x))) AS e""".stripMargin))
      .groupBy(col("e.i")).agg(sum(col("e.x")).as("sx"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val gram = gramMatrix(emb, dims).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3) / 1e6).toMap
    val mu = Array.tabulate(dims)(i => sums(i) / n)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val s = gram(if (i <= j) (i, j) else (j, i))
      s / n - mu(i) * mu(j)
    }
    // power iteration + deflation, deterministic start e_c (c-th basis)
    val comps = Array.ofDim[Double](k, dims)
    for (c <- 0 until k) {
      var v = Array.tabulate(dims)(i => if (i == c) 1.0 else 0.0)
      for (_ <- 1 to iters) {
        val w = Array.tabulate(dims)(i =>
          (0 until dims).map(j => cov(i)(j) * v(j)).sum)
        // deflate against found components
        for (p <- 0 until c) {
          val d = (0 until dims).map(i => w(i) * comps(p)(i)).sum
          for (i <- 0 until dims) w(i) -= d * comps(p)(i)
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = if (norm > 1e-12) w.map(_ / norm) else v
      }
      val pivot = (0 until dims).maxBy(i => math.abs(v(i)))
      comps(c) = if (v(pivot) < 0) v.map(-_) else v
    }
    val pcCols = (0 until k).map { c =>
      expr(s"aggregate(zip_with(cast(embedding as array<double>), " +
        s"array(${comps(c).map(x => s"${x}D").mkString(",")}), (x, y) -> x * y), " +
        s"0.0D, (acc, z) -> acc + z)").as(s"pc${c + 1}")
    }
    emb.select(col("vec_id") +: pcCols: _*)
  }

  /** Per-dimension standardization profile of an embedding corpus — the
    * feature-scaling statistics (n, mean, std, range per dimension) an
    * ML pipeline precomputes before normalizing or whitening. One
    * posexplode pass; sums are micro-rounded INTEGERS (the [[gramMatrix]]
    * trick: float×float products are exact in double, and the rounded
    * integer sum is associative, so Spark's partial-agg order can't
    * shift a bit vs any oracle); the mean/std epilogue is a fixed IEEE
    * expression over those exact integers, spelled identically in the
    * oracle. Output is |dims| rows regardless of corpus size and the
    * only shuffle carries |dims| × partitions partial rows.
    */
  def dimProfile(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(x * 1000000.0D) as bigint)")).as("sx_micro"),
        sum(expr("cast(round(x * x * 1000000.0D) as bigint)")).as("sxx_micro"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"))
      .withColumn("mean", expr("cast(sx_micro as double) / 1000000.0D / n"))
      .withColumn("ex2", expr("cast(sxx_micro as double) / 1000000.0D / n"))
      .withColumn("std", expr("sqrt(greatest(ex2 - mean * mean, 0.0D))"))
      .drop("ex2")
      .orderBy(col("dim"))

  /** Applied per-dimension standardization — the feature-scaling APPLY
    * step downstream of [[dimProfile]]: z = (x − μ_d)/σ_d per element,
    * shipped as integer MILLI z-scores. μ is the truncating integer
    * micro mean; σ comes from the exact integer (Σx, Σx²) moments
    * through the SAME fixed double expression tree as [[dimProfile]]
    * (one correctly-rounded sqrt from identical doubles → identical
    * micro rounding on any engine); the per-element epilogue is then
    * pure integer arithmetic. A constant dimension (σ = 0) standardizes
    * to 0. One corpus scan + a 64-row broadcast join — no shuffle of
    * the vectors, embarrassingly parallel at any corpus size.
    */
  def standardize(emb: DataFrame): DataFrame = {
    val stats = dimProfile(emb).select(col("dim"), col("n"), col("sx_micro"),
      expr("cast(round(std * 1000000.0D) as bigint)").as("sd_micro"),
      expr("sx_micro div n").as("mean_micro"))
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"),
        expr("cast(round(cast(xf as double) * 1000000.0D) as bigint)").as("xm"))
      .join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(col("sd_micro") === 0L, 0L)
          .otherwise(expr("((xm - mean_micro) * 1000) div sd_micro"))
          .as("z_milli"))
      .orderBy("vec_id", "dim")
  }

  def gramMatrix(emb: DataFrame, dims: Int = 64): DataFrame = {
    // Upper-triangle co-moment accumulation per PARTITION (the syrk
    // shape): each task folds its rows into one dims·(dims+1)/2 long
    // array, so the shuffle carries partitions × 2080 partial rows
    // instead of rows × 2080 exploded products — at 100 TB the network
    // cost is a constant per task, independent of corpus size. Products
    // are micro-rounded to integers BEFORE summation (float×float is
    // exact in double, and integer sums are associative), so the merge
    // order across partitions can't shift a bit vs any oracle.
    val spark = emb.sparkSession
    import spark.implicits._
    val nPairs = dims * (dims + 1) / 2
    emb.select(expr("transform(embedding, x -> cast(x as double))"))
      .as[Seq[Double]]
      .mapPartitions { rows =>
        val s = new Array[Long](nPairs)
        var n = 0L
        rows.foreach { v =>
          n += 1
          var idx = 0
          var i = 0
          while (i < dims) {
            val xi = v(i)
            var j = i
            while (j < dims) {
              s(idx) += math.round(xi * v(j) * 1000000.0)
              idx += 1; j += 1
            }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty
        else {
          var idx = 0
          val out = Array.newBuilder[(Int, Int, Long, Long)]
          var i = 0
          while (i < dims) {
            var j = i
            while (j < dims) {
              out += ((i, j, n, s(idx)))
              idx += 1; j += 1
            }
            i += 1
          }
          out.result().iterator
        }
      }
      .toDF("i", "j", "n", "sxy_micro")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("sxy_micro")).as("sxy_micro"))
      .orderBy(col("i"), col("j"))
  }

  /** Round-half-away-from-zero, matching both Spark SQL `round(double)`
    * (BigDecimal HALF_UP) and DuckDB `round` — `math.round` differs on
    * negative exact halves (floor(x+0.5) pulls -0.5 to 0), so driver-side
    * arithmetic that must agree with an SQL oracle goes through this.
    */
  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** Top principal direction of the corpus second-moment matrix by FIXED
    * fixed-point power iteration — the oracle-able sibling of
    * [[pcaProject]] (which converges in doubles and is spec-verified
    * instead). The distributed work is one [[gramMatrix]] pass (exact
    * integer micro sums); the d×d result is collected (d² longs at ANY
    * corpus size — the same driver-side epilogue budget as Layout's
    * min/max row) and iterated `iters` times in exact arithmetic:
    *
    *   w = G·v           (long × milli-long products, exact)
    *   v' = round(w / max|w| · 1000)   (one IEEE division + multiply on
    *                                    doubles that are exact images of
    *                                    the longs, identical tree in SQL)
    *
    * Because v is re-quantized to milli units every step, the procedure
    * is a deterministic FIXTURE: an engine reproducing these two lines
    * reproduces every intermediate bit, converged or not. Sign is fixed
    * by making the largest-|component| entry (smallest dim on ties)
    * positive. Overflow bound: |G| ≤ n·10⁶ and |v| ≤ 10³ keep G·v under
    * 2⁶³ for n < 9·10⁹ vectors and under the 2⁵³ double-exactness line
    * for n < 10⁷ per matvec TERM sum; past that, drop v to centi units
    * (same two lines, one constant).
    */
  private[graft] def pcaPowerVector(emb: DataFrame, dims: Int = 64,
                                    iters: Int = 12): Array[Long] =
    pcaPowerFromGram(gramMatrix(emb, dims), dims, iters)

  /** The same fixed-point iteration off an already-materialized Gram
    * table (i, j, n, sxy_micro — upper triangle) — e.g. the streaming
    * maintained log (`Monitor.readGram`), so the principal direction
    * stays current against an ingest stream without re-scanning the
    * corpus: the log partials are associative integer sums, so the
    * merged Gram — and therefore every iterate here — is bit-equal to a
    * batch recompute over everything ever streamed.
    */
  private[graft] def pcaPowerFromGram(gram: DataFrame, dims: Int = 64,
                                      iters: Int = 12): Array[Long] = {
    val g = gram.collect()
    val G = Array.ofDim[Long](dims, dims)
    g.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val s = r.getLong(3)
      G(i)(j) = s; G(j)(i) = s
    }
    var v = Array.fill(dims)(1000L)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dims) { i =>
        var s = 0L; var j = 0
        while (j < dims) { s += G(i)(j) * v(j); j += 1 }
        s
      }
      val m = w.map(math.abs).max
      if (m > 0L)
        v = w.map(x => roundHalfAway(x.toDouble / m.toDouble * 1000.0))
      it += 1
    }
    val mx = v.map(math.abs).max
    val pivot = v.indexWhere(x => math.abs(x) == mx)
    if (v(pivot) < 0) v.map(x => -x) else v
  }

  /** The power-iteration eigenvector as a 64-row DataFrame (dim, v_milli)
    * — the driver-contract face of [[pcaPowerVector]]. */
  def pcaPower(emb: DataFrame, dims: Int = 64, iters: Int = 12): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    pcaPowerVector(emb, dims, iters).toSeq.zipWithIndex
      .map { case (v, d) => (d, v) }.toDF("dim", "v_milli")
  }

  /** Distributed fixed-point Lloyd k-means over the WHOLE corpus — the
    * trained-quantizer sibling of [[kmeansCentroids]] (which samples to
    * driver memory, FAISS-style) for when the training set itself must
    * stay distributed, and the oracle-able sibling of both: like
    * [[pcaPowerFromGram]], every centroid is re-quantized to integer
    * MILLI units each round, so the whole trajectory (converged or not)
    * is a deterministic fixture any engine replays bit-for-bit.
    *
    * Per round (reference semantics: the corpus-wide clustering the
    * reference's per-session grouping approximates by hand;
    * topic_store has no trainer — this is the 100 TB-pipeline op):
    *   - assignment: one corpus scan against the BROADCAST k×d milli
    *     centroids; the L2 objective is decided in exact integers —
    *     obj_c = Σ c_j² − 2000·Σ round(x_j·c_j) ≈ 10⁶(|c|² − 2x·c)
    *     (x_j is a float image × an integer: exact in double; each term
    *     rounded BEFORE the sum, so the fold is associative), ties to
    *     the lowest cell id.
    *   - update: per-partition syrk-style accumulation folds every row
    *     into k×d longs of micro-unit sums + k member counts, so the
    *     ONE exchange per round carries O(partitions·k·d) partial rows
    *     — never the corpus (the [[gramMatrix]] discipline). New
    *     centroid = (Σ micro // n) // 1000 (truncating long division,
    *     = DuckDB `//`); an empty cell keeps its centroid.
    * Init = the first `kCells` corpus vectors quantized to milli (the
    * deterministic, oracle-nameable seed every quantizer here shares);
    * driver holds only k×d longs between rounds. Returns the milli
    * centroids and the member counts of the LAST update round.
    */
  private[graft] def kmeansFixedPointCentroids(
      emb: DataFrame, kCells: Int = 8, iters: Int = 3,
      dims: Int = 64): (Array[Array[Long]], Array[Long]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val data = emb
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[Seq[Double]]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init: Array[Array[Long]] = emb
      .filter(col("vec_id") < kCells).orderBy("vec_id")
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(_.getSeq[Double](0).toArray.map(x => roundHalfAway(x * 1000.0)))
    require(init.length == kCells,
      s"need the first $kCells vec_ids present for the deterministic init, got ${init.length}")
    var cents = init
    var counts = new Array[Long](kCells)
    try {
      for (_ <- 1 to iters) {
        val stats = kmeansPartialStats(data.toDF(), cents, dims,
          vCol = "v", projected = true).collect()
          .map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
            r.getLong(2), r.getLong(3)))
        // the ONE update epilogue — shared with the maintained streaming
        // log so batch and log-served rounds stay bit-equal by definition
        val (next, nextCounts) = kmeansUpdateFromStats(stats, cents)
        cents = next
        counts = nextCounts
      }
    } finally data.unpersist()
    (cents, counts)
  }

  /** One Lloyd update's sufficient statistics against FROZEN milli
    * centroids: (cell, dim, n, sm) — member count and micro-unit value
    * sums of every vector assigned to each cell, already collapsed to
    * O(partitions·k·d) rows map-side (the per-partition fold) and
    * reduced to k×d by one tiny groupBy. Partial sums are associative
    * integers, so partials from ANY split of the corpus (partitions,
    * micro-batches, shards) merge into statistics bit-equal to a
    * single-pass computation — the contract the maintained streaming
    * log (`Monitor.maintainKmeansStats`) is built on.
    */
  private[graft] def kmeansPartialStats(emb: DataFrame,
                                        cents: Array[Array[Long]],
                                        dims: Int = 64, vCol: String = "v",
                                        projected: Boolean = false): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val data =
      if (projected) emb.select(col(vCol)).as[Seq[Double]]
      else emb.select(expr("transform(embedding, x -> cast(x as double))"))
        .as[Seq[Double]]
    val bc = spark.sparkContext.broadcast(cents)
    data.mapPartitions { rows =>
      val cs = bc.value
      val k = cs.length
      val normsq = cs.map { c =>
        var s = 0L; var j = 0
        while (j < dims) { s += c(j) * c(j); j += 1 }; s
      }
      val sums = Array.ofDim[Long](k, dims)
      val ns = new Array[Long](k)
      rows.foreach { v =>
        var best = 0; var bestObj = Long.MaxValue
        var c = 0
        while (c < k) {
          var dot = 0L; var j = 0
          while (j < dims) { dot += roundHalfAway(v(j) * cs(c)(j)); j += 1 }
          val obj = normsq(c) - 2000L * dot
          if (obj < bestObj) { bestObj = obj; best = c } // tie: lowest cell
          c += 1
        }
        ns(best) += 1
        var j = 0
        while (j < dims) { sums(best)(j) += roundHalfAway(v(j) * 1000000.0); j += 1 }
      }
      (0 until k).iterator.filter(ns(_) > 0L).flatMap { c =>
        (0 until dims).iterator.map(j => (c.toLong, j.toLong, ns(c), sums(c)(j)))
      }
    }.toDF("cell", "dim", "n", "sm")
      .groupBy("cell", "dim")
      .agg(sum(col("n")).as("n"), sum(col("sm")).as("sm"))
  }

  /** The Lloyd update epilogue off a (cell, dim, n, sm) statistics table
    * — e.g. the merged streaming log: next centroid = (sm // n) // 1000
    * milli units, empty cells keep `prev`. Statistics merging is
    * associative, so this equals a batch update round over every vector
    * the statistics ever saw.
    */
  private[graft] def kmeansUpdateFromStats(stats: Array[(Int, Int, Long, Long)],
                                           prev: Array[Array[Long]]): (Array[Array[Long]], Array[Long]) = {
    val next = prev.map(_.clone())
    val counts = new Array[Long](prev.length)
    stats.foreach { case (c, j, n, sm) =>
      counts(c) = n
      next(c)(j) = (sm / n) / 1000L
    }
    (next, counts)
  }

  /** The trained fixed-point centroids as a (cell, dim, c_milli,
    * n_members) DataFrame — k×dims rows at ANY corpus size. `n_members`
    * is the membership of the final Lloyd update (assignment against the
    * PENULTIMATE centroids — the count that produced the shipped ones).
    */
  def kmeansTrain(emb: DataFrame, kCells: Int = 8, iters: Int = 3,
                  dims: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (cents, counts) = kmeansFixedPointCentroids(emb, kCells, iters, dims)
    (for { c <- 0 until kCells; j <- 0 until dims }
      yield (c.toLong, j.toLong, cents(c)(j), counts(c)))
      .toDF("cell", "dim", "c_milli", "n_members")
  }

  /** Assignment of every vector against FROZEN fixed-point centroids:
    * the k×d milli table rides the scan as a broadcast, the integer
    * objective of the chosen cell ships as `obj` (engine-exact). One
    * scan, zero shuffles — shared by [[kmeansAssign]] and the maintained
    * cell-partitioned index (`Monitor.maintainCellIndex`).
    */
  private[graft] def assignToCentroids(emb: DataFrame,
                                       cents: Array[Array[Long]],
                                       dims: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        val k = cs.length
        val normsq = cs.map { c =>
          var s = 0L; var j = 0
          while (j < dims) { s += c(j) * c(j); j += 1 }; s
        }
        rows.map { case (id, v) =>
          var best = 0; var bestObj = Long.MaxValue
          var c = 0
          while (c < k) {
            var dot = 0L; var j = 0
            while (j < dims) { dot += roundHalfAway(v(j) * cs(c)(j)); j += 1 }
            val obj = normsq(c) - 2000L * dot
            if (obj < bestObj) { bestObj = obj; best = c }
            c += 1
          }
          (id, best.toLong, bestObj)
        }
      }
      .toDF("vec_id", "cell", "obj")
  }

  /** Top-`nprobe` cell assignment against FROZEN milli centroids — the
    * query-side routing of an IVF probe (the corpus side uses the top-1
    * [[assignToCentroids]]). Same integer objective, ties to the lowest
    * cell; emits (vec_id, cell, cell_rank 1..nprobe). One broadcast
    * scan, zero shuffles.
    */
  private[graft] def assignTopCells(emb: DataFrame,
                                    cents: Array[Array[Long]], nprobe: Int,
                                    dims: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(nprobe >= 1 && nprobe <= cents.length)
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        val k = cs.length
        val normsq = cs.map { c =>
          var s = 0L; var j = 0
          while (j < dims) { s += c(j) * c(j); j += 1 }; s
        }
        rows.flatMap { case (id, v) =>
          val objs = Array.tabulate(k) { c =>
            var dot = 0L; var j = 0
            while (j < dims) { dot += roundHalfAway(v(j) * cs(c)(j)); j += 1 }
            (normsq(c) - 2000L * dot, c.toLong)
          }
          objs.sortBy(identity).take(nprobe).zipWithIndex.map {
            case ((_, cell), r) => (id, cell, r + 1)
          }
        }
      }
      .toDF("vec_id", "cell", "cell_rank")
  }

  /** IVF probe against a cell-partitioned index: queries route to their
    * top-`nprobe` cells, and the candidate join touches ONLY those
    * cells' vectors — the probe side is a broadcast build, so when
    * `index` is a `cell=`-partitioned file scan (the
    * `Monitor.maintainCellIndex` / `Layout.writeCellIndex` layout)
    * Catalyst's dynamic partition pruning reuses that broadcast to
    * prune the index's directory listing to the probed cells. Fully
    * lazy: no `collect()` of cell ids on the serving path (the earlier
    * design listed distinct cells driver-side — O(queries·nprobe) per
    * batch, and an eager action inside a "query" constructor).
    * Candidates score by EXACT cosine, top-`k` per query ships
    * rank-only (the `ann_cosine_topk` parity discipline). This is the
    * shared serving core of `Monitor.serveAnnStream` and any batch
    * probe.
    */
  def probeIndexTopK(index: DataFrame, queries: DataFrame,
                     centroids: Array[Array[Long]], k: Int = 10,
                     nprobe: Int = 2, dims: Int = 64): DataFrame = {
    val probes = assignTopCells(queries, centroids, nprobe, dims)
      .select(col("vec_id").as("query_id"), col("cell"))
    // the candidate join carries the neighbor vectors it just read — the
    // probed cells are scanned ONCE (DPP prunes the rest); the norm
    // recompute per candidate pair is O(d), the same as the dot it
    // accompanies
    val cand = index.select(col("vec_id").as("neighbor_id"),
        col("cell"), col("embedding"))
      .join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("transform(embedding, x -> cast(x as double))").as("cv"))
      .withColumn("cnorm", expr("sqrt(graft_dot(cv, cv))"))
    val qp = prep(queries)
      .select(col("vec_id").as("query_id"), col("v"), col("norm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(broadcast(qp), "query_id")
      .withColumn("cosine",
        expr("graft_dot(v, cv)") / (col("norm") * col("cnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** The cell-partitioned ANN index's rows — (vec_id, cell, embedding),
    * one per corpus vector. The SINGLE definition of the index's content
    * shared by the bulk build (`Layout.writeCellIndex`) and the ingest
    * maintenance (`Monitor.maintainCellIndex`), so the two layouts can't
    * drift.
    */
  private[graft] def cellIndexRows(emb: DataFrame,
                                   centroids: Array[Array[Long]],
                                   dims: Int = 64): DataFrame =
    assignToCentroids(emb, centroids, dims)
      .select(col("vec_id"), col("cell"))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")

  /** Final assignment of every vector against the trained fixed-point
    * centroids — [[kmeansFixedPointCentroids]] + [[assignToCentroids]].
    * Assignment work at 100 TB is embarrassingly parallel once training
    * has fixed the centroids.
    */
  def kmeansAssign(emb: DataFrame, kCells: Int = 8, iters: Int = 3,
                   dims: Int = 64): DataFrame = {
    val (cents, _) = kmeansFixedPointCentroids(emb, kCells, iters, dims)
    assignToCentroids(emb, cents, dims).orderBy("vec_id")
  }

  /** Per-vector projection onto the power-iteration top component: each
    * term x_i·v_i·1000 is rounded to an integer BEFORE the per-row sum
    * (x_i is a float image — 24 mantissa bits — times an ≤11-bit integer
    * times 10³: exact in double), so the 64-term reduction is associative
    * integer addition and bit-identical in any engine. One corpus scan,
    * the eigenvector enters as a literal array — no join, no shuffle.
    */
  def pcaScores(emb: DataFrame, dims: Int = 64, iters: Int = 12): DataFrame = {
    val v = pcaPowerVector(emb, dims, iters)
    val arr = v.map(_ + "L").mkString(",")
    emb.select(col("vec_id"),
        expr(s"""aggregate(zip_with(transform(embedding, x -> cast(x as double)),
                |  array($arr), (x, c) -> cast(round(x * c * 1000.0D) as bigint)),
                |  0L, (acc, t) -> acc + t)""".stripMargin).as("pc1_micro"))
      .orderBy(col("vec_id"))
  }

  /** Per-cell majority-label purity of the frozen k-means cells — the
    * supervised twin of the silhouette: when vectors carry labels, a
    * cell dominated by one label says the geometry found real structure
    * (and a 50/50 cell says the index mixes classes a downstream
    * stratified sampler would want separated). Majority is
    * deterministic: the top label is max by (count desc, label asc) —
    * an integer struct max, engine-exact; purity is the truncating
    * permille (1000·top_cnt) div n.
    *
    * Scale shape: one broadcast-centroid assignment scan, one equality
    * join back to the (vec_id, label) projection, then a map-side-
    * combined (cell, label) groupBy whose output is ≤ k·|labels| rows.
    */
  def cellPurity(emb: DataFrame, kCells: Int = 8, iters: Int = 3,
                 dims: Int = 64): DataFrame = {
    val (cents, _) = kmeansFixedPointCentroids(emb, kCells, iters, dims)
    val assigned = assignToCentroids(emb, cents, dims).select("vec_id", "cell")
    val labeled = assigned.join(
      emb.select(col("vec_id"), col("label").cast("long").as("label")), "vec_id")
    labeled.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cell"))
      .agg(sum(col("cnt")).as("n"),
        max(struct(col("cnt"), (-col("label")).as("nl"))).as("top"))
      .select(col("cell"), col("n"),
        (-col("top.nl")).as("top_label"), col("top.cnt").as("top_cnt"),
        expr("(1000 * top.cnt) div n").as("purity_permille"))
      .orderBy("cell")
  }

  /** Recall@k audit of the IVF index against the exact answer — the
    * third leg of the recall-audit family (42cc audits the token-shingle
    * LSH, 42ch the SRP bands; this audits the coarse quantizer): for a
    * bounded query panel, how many of the TRUE top-k neighbors does the
    * nprobe-cell search return? Per query: the exact hit count and the
    * truncating recall permille — the number that decides whether
    * `nprobe` is big enough for this corpus's cluster structure.
    *
    * Scale shape: the exact side is per-query LINEAR (|panel|·n scored
    * pairs with the panel riding as a broadcast — bounded by nQueries,
    * never all-pairs); the IVF side probes nprobe/kCells of the corpus
    * per query. Both rankings use the deterministic (cosine desc, id)
    * order the ann oracles already pin.
    */
  def ivfRecallAudit(emb: DataFrame, nQueries: Int = 32, k: Int = 10,
                     kCells: Int = 8, nprobe: Int = 2): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
    val brute = bruteTopK(emb, q, k).select("query_id", "neighbor_id")
    val ivf = ivfTopK(emb, q, k, kCells, nprobe)
      .select("query_id", "neighbor_id")
    val hits = brute.intersect(ivf)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("(1000 * coalesce(n_hits, 0L)) div n_true")
          .as("recall_permille"))
      .orderBy("query_id")
  }

  /** Leave-one-out 1-NN label accuracy, IVF-restricted — the standard
    * "does nearest-neighbor structure respect the labels" eval of an
    * embedding space, searched exactly the way production searches it:
    * each vector's nearest OTHER vector within its frozen k-means cell
    * (the [[semanticDedup]] cell-bounding contract — pair work is
    * Σ|cell|², never n², and kCells scales with the corpus), ranked by
    * the 6-decimal-rounded cosine with vec_id ties (deterministic in
    * both engines — the dedup_embedding_cosine convention), then the
    * per-label agreement rate in truncating permille. Vectors alone in
    * their cell have no candidate and drop out (both sides agree by
    * construction).
    */
  def knnLooCellAccuracy(emb: DataFrame, kCells: Int = 8, iters: Int = 3,
                         dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, _) = kmeansFixedPointCentroids(emb, kCells, iters, dims)
    val assigned = assignToCentroids(emb, cents, dims).select("vec_id", "cell")
    val p = prep(emb).join(assigned, "vec_id")
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
    val pairs = p.as("q").join(p.as("c"),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("q.label").as("label"),
        col("c.vec_id").as("nn_id"), col("c.label").as("nn_label"),
        round(cosineExpr, 6).as("cos"))
    // the 1-NN argmax as a struct max instead of a rank window: the
    // window shuffled AND sorted every candidate pair; max(struct)
    // combines map-side, so only per-task winners cross the exchange
    // (guide §2.3 "aggregate before you shuffle"). Field order (cos,
    // −nn_id) reproduces the (cos desc, nn_id asc) winner exactly —
    // struct ordering is lexicographic and null-smallest, matching the
    // window's nulls-last descending order.
    pairs.groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("cos"), (-col("nn_id")).as("ni"),
        col("nn_label").as("nl"))).as("top"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === col("top.nl"), 1L).otherwise(0L))
          .as("correct"))
      .select(col("label"), col("n"), col("correct"),
        expr("(1000 * correct) div n").as("accuracy_permille"))
      .orderBy("label")
  }

  /** Per-cluster simplified (centroid-based) silhouette over the frozen
    * fixed-point k-means cells — the standard "are these clusters real"
    * quality number read beside the assignment table: for each vector,
    * a = distance to its OWN centroid, b = distance to the NEAREST OTHER
    * centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; a cluster whose mean s
    * hugs 0 is not separated from its neighbors. (The classic all-pairs
    * silhouette is O(n²); the centroid form is the standard scale
    * substitute and the one every big-data stack ships.)
    *
    * Exactness: squared distances fold per-term in milli² —
    * round((1000·x_j − c_j)²) per dimension, an associative integer sum
    * (the [[pcaScores]] convention) — so a2/b2 are engine-exact
    * integers; own cell is the ASSIGNMENT objective's argmin (ties to
    * the lowest cell, identical to [[kmeansAssign]]); s converts through
    * sqrt (IEEE-exact in both engines) and rounds to micro, then the
    * per-cell mean is an integer div. Per-cell output:
    * (cell, n, mean_s_micro).
    *
    * Scale shape: centroids train on the [[kmeansFixedPointCentroids]]
    * contract; scoring is ONE scan with the k×d milli table riding as a
    * broadcast — zero shuffles until the k-row groupBy.
    */
  def kmeansSilhouette(emb: DataFrame, kCells: Int = 8, iters: Int = 3,
                       dims: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (cents, _) = kmeansFixedPointCentroids(emb, kCells, iters, dims)
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        val k = cs.length
        val normsq = cs.map { c =>
          var s = 0L; var j = 0
          while (j < dims) { s += c(j) * c(j); j += 1 }; s
        }
        rows.map { case (_, v) =>
          // own cell by the exact assignment objective (kmeansAssign)
          var best = 0; var bestObj = Long.MaxValue
          val d2 = new Array[Long](k)
          var c = 0
          while (c < k) {
            var dot = 0L; var dd = 0L; var j = 0
            while (j < dims) {
              dot += roundHalfAway(v(j) * cs(c)(j))
              val t = 1000.0 * v(j) - cs(c)(j)
              dd += roundHalfAway(t * t)
              j += 1
            }
            d2(c) = dd
            val obj = normsq(c) - 2000L * dot
            if (obj < bestObj) { bestObj = obj; best = c }
            c += 1
          }
          val a2 = d2(best)
          var b2 = Long.MaxValue
          c = 0
          while (c < k) { if (c != best && d2(c) < b2) b2 = d2(c); c += 1 }
          val sMicro =
            if (math.max(a2, b2) == 0L) 0L
            else roundHalfAway(1000000.0 *
              ((math.sqrt(b2.toDouble) - math.sqrt(a2.toDouble)) /
                math.sqrt(math.max(a2, b2).toDouble)))
          (best.toLong, sMicro)
        }
      }
      .toDF("cell", "s_micro")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        // fold in decimal: Σ|s_micro| ≤ 10⁶·n passes int64 near 10¹³ rows
        expr("sum(cast(s_micro as decimal(32,0))) div count(1)")
          .as("mean_s_micro"))
      .orderBy(col("cell"))
  }
}
