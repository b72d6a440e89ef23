package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Analytics, TextAnalysis}

/** Hand-computed semantics for the resample/ACF/RRF trio. Oracle value
  * parity at sf0.01 is the driver's job (tools/check_oracle.py locally);
  * here the contracts are pinned on tiny inputs where the right answer
  * is computable by eye.
  */
class TsResampleSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Double)]) =
    rows.toDF("t", "event_type", "value")
      .select(col("t").cast("timestamp").as("ts"), col("event_type"),
        col("value"))

  test("gapFill forward-fills missing hours per series, flags observed") {
    // series A: hours 0 (two rows, mean 1.5), 1 (x=7), 3 (x=2) — hour 2 gap
    // series B: single hour → single spine row
    val df = ev(Seq(
      (100L, "A", 1.0), (200L, "A", 2.0),
      (3700L, "A", 7.0),
      (3600L * 3 + 5, "A", 2.0),
      (500L, "B", 9.0)))
    val out = Analytics.gapFill(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("A", 0L, 1500000L, true),
      ("A", 1L, 7000000L, true),
      ("A", 2L, 7000000L, false), // LOCF from hour 1
      ("A", 3L, 2000000L, true),
      ("B", 0L, 9000000L, true)))
  }

  test("gapFill hourly mean is the truncating integer division") {
    // three rows summing to 10 micro-units above a multiple of 3
    val df = ev(Seq((1L, "A", 1.0), (2L, "A", 1.0), (3L, "A", 1.000001)))
    val out = Analytics.gapFill(df).collect()
    assert(out.head.getLong(2) === (3000001L / 3L)) // 1000000, truncated
  }

  test("acf: alternating series has lag-1 ≈ -1 and lag-2 ≈ +1") {
    // x_h = ±1 alternating over 8 hours: perfect negative lag-1, positive
    // lag-2 autocorrelation; mean 0 keeps deviations exactly ±1e6 micro
    val rows = (0 until 8).map(h =>
      (h * 3600L, "A", if (h % 2 == 0) 1.0 else -1.0))
    val out = Analytics.acf(ev(rows), maxLag = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(5)))
    val byLag = out.map(t => t._1 -> t).toMap
    assert(byLag(1)._2 === 7L) // 7 adjacent pairs over 8 buckets
    assert(math.abs(byLag(1)._3 - (-7.0 / 8.0)) < 1e-9)
    assert(byLag(2)._2 === 6L)
    assert(math.abs(byLag(2)._3 - (6.0 / 8.0)) < 1e-9)
  }

  test("pacf: Durbin-Levinson replay off the acf rows; constant series " +
      "gates to NULL") {
    // a deterministic sawtooth over 24 hours: rich enough that every
    // lag 1..6 has pairs and the recursion exercises all stages
    val rows = (0 until 24).map(h => (h * 3600L, "A", (h % 5).toDouble))
    val df = ev(rows)
    val out = Analytics.pacf(df).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    // independent in-memory Durbin-Levinson on the SAME acf values
    val acfRows = Analytics.acf(df).collect()
      .map(r => r.getInt(1) -> (r.getLong(3).toDouble / r.getLong(4).toDouble))
      .toMap
    var prev = Map.empty[Int, Double]
    val expect = (1 to 6).map { k =>
      val fkk =
        if (k == 1) acfRows(1)
        else {
          val num = acfRows(k) -
            (1 until k).map(j => prev(j) * acfRows(k - j)).sum
          val den = 1.0 - (1 until k).map(j => prev(j) * acfRows(j)).sum
          num / den
        }
      prev = ((1 until k).map(j => j -> (prev(j) - fkk * prev(k - j))) :+
        (k -> fkk)).toMap
      k.toLong -> math.round(1000000.0 * fkk)
    }.toMap
    assert(out === expect.view.mapValues(Some(_)).toMap)
    // constant series: zero variance, every coefficient NULL (never NaN)
    val flat = ev((0 until 24).map(h => (h * 3600L, "A", 2.0)))
    val fo = Analytics.pacf(flat).collect()
    assert(fo.length === 6 && fo.forall(_.isNullAt(2)))
  }

  test("log-rank: hand-computed O-E and variance terms; censors drop " +
      "out of the event times") {
    import spark.implicits._
    // A dies at 1 and 2; B dies at 1, censored at 3. t=1: OE 0, V 1/3;
    // t=2: OE 1/2, V 1/4; t=3: censor only -> no term
    val du = Seq(("A", 1L, true), ("A", 2L, true),
      ("B", 1L, true), ("B", 3L, false)).toDF("g", "dur_h", "observed")
    val r = Analytics.logRank(du).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 2L, 1L)))
    assert(r.getAs[Long]("oe_micro") === 500000L)
    assert(r.getAs[Long]("v_micro") === 333333L + 250000L)
    assert(r.getAs[Long]("chi2_micro") ===
      math.round(500000.0 * 500000.0 / 583333.0))
    // identical groups: every O-E term is exactly 0, chi2 exactly 0
    val same = Seq(("A", 1L, true), ("B", 1L, true),
      ("A", 2L, true), ("B", 2L, true)).toDF("g", "dur_h", "observed")
    val s = Analytics.logRank(same).collect()(0)
    assert(s.getAs[Long]("oe_micro") === 0L && s.getAs[Long]("chi2_micro") === 0L)
    // no deaths at all -> V = 0 -> NULL chi2, never a division artifact
    val cens = Seq(("A", 1L, false), ("B", 2L, false))
      .toDF("g", "dur_h", "observed")
    assert(Analytics.logRank(cens).collect()(0).isNullAt(6))
  }

  test("mann-kendall: monotone series by hand, tie correction, sen's " +
      "lower-median slope") {
    // strictly increasing hourly values 1..4: S = 6, no ties,
    // var18 = 4*3*13, every pairwise slope exactly 1e6 micro/h
    val up = ev((0 until 4).map(h => (h * 3600L, "A", (h + 1).toDouble)))
    val r = Analytics.mannKendall(up).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 6L, 156L)))
    assert(r.getAs[Long]("z_micro") ===
      math.round(1000000.0 * 5.0 / math.sqrt(156.0 / 18.0)))
    assert(r.getAs[Long]("sen_num_micro") === 1000000L
      && r.getAs[Long]("sen_den_h") === 1L
      && r.getAs[Long]("sen_slope_micro_per_h") === 1000000L)
    // all-equal series: S = 0 -> z 0; ties drain the variance term
    val flat = ev((0 until 4).map(h => (h * 3600L, "A", 2.0)))
    val f = Analytics.mannKendall(flat).collect()(0)
    assert(f.getLong(2) === 0L)
    assert(f.getLong(3) === 156L - 4L * 3L * 13L, "t=4 tie block")
    assert(f.getAs[Long]("z_micro") === 0L)
    assert(f.getAs[Long]("sen_slope_micro_per_h") === 0L)
  }

  test("percent rank maps a group's extremes to 0 and 1000 exactly") {
    import spark.implicits._
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "B", 5.0))
      .toDF("event_id", "event_type", "value")
    val out = Analytics.percentRank(df).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 0L, 2L -> 500L, 3L -> 1000L, 4L -> 0L))
  }

  test("vocab growth: a repeated-text corpus stops growing after decile 1") {
    import spark.implicits._
    val docs = (1 to 10).map(i => (i.toLong, "same words every time"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.head === ((1L, 4L, 4L, 4L))) // all 4 types appear in doc 1
    out.tail.foreach { case (_, _, newTypes, cumVocab) =>
      assert(newTypes === 0L && cumVocab === 4L)
    }
    assert(out.last._2 === 40L) // volume keeps growing, vocab doesn't
  }

  test("percentile bands are ordered and exact on a small group") {
    import spark.implicits._
    graft.functions.QSketchFunctions.register(spark)
    // 5 values in one (series, day) group — under k the sketch IS the
    // exact sample: nearest-rank p10/p50/p90 of {1..5} = 1, 3, 4
    val df = (1 to 5).map(i => (i.toLong, i * 3600L, "A", i.toDouble))
      .toDF("event_id", "t", "event_type", "value")
      .select(col("event_id"), col("t").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    val out = df.groupBy(col("event_type").as("series"),
        (graft.model.Documents.tsSec(col("ts")) / 86400L).cast("long").as("day"))
      .agg(expr("graft_qsketch(cast(value as double), cast(event_id as string), 256)").as("sk"))
      .select(expr("graft_qsketch_q(sk, 0.1d)").as("p10"),
        expr("graft_qsketch_q(sk, 0.5d)").as("p50"),
        expr("graft_qsketch_q(sk, 0.9d)").as("p90"))
      .collect().head
    assert(out.getDouble(0) === 1.0 && out.getDouble(1) === 3.0 &&
      out.getDouble(2) === 4.0)
  }

  test("funnel rates: per-stage conversion and lower-median deltas by hand") {
    import spark.implicits._
    // A completes (deltas 10, 20 us), B view+click (delta 30), C view
    // only, D never enters → stage rows: 3/4=750‰, 2/3=666‰, 1/2=500‰;
    // stage-2 lower median of {10, 30} is 10
    val ev = Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "click", 110L), (3L, 1L, "purchase", 130L),
      (4L, 2L, "view", 200L), (5L, 2L, "click", 230L),
      (6L, 3L, "view", 300L),
      (7L, 4L, "error", 400L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.funnelRates(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, 3L, 750L, -1L),
      (2, 2L, 666L, 10L),
      (3, 1L, 500L, 20L)))
  }

  test("gapFillLinear: bracketing lerp by hand, incl. negative-slope truncation") {
    import spark.implicits._
    // series A, bucket width 100 µs: anchors at buckets 0 (vm 0, the
    // OHLC close of two rows — the later ts wins over vm 99), 3 (−10),
    // and 6 (5). Gap values are the exact integer lerp; the negative
    // slope pins div's truncation TOWARD ZERO (−10 div 3 = −3, −20 div
    // 3 = −6 — a floor division would give −4/−7 and hash-mismatch the
    // oracle).
    val ev = Seq(
      ("A", 1L, 99L, 10L), ("A", 2L, 0L, 20L),
      ("A", 3L, -10L, 310L),
      ("A", 4L, 5L, 620L))
      .toDF("series", "event_id", "vm", "ts_us")
    val out = Analytics.gapFillLinearFrames(ev, bucketUs = 100L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 2L, 0L),   // observed: close anchor is the LATER row's vm
      (1L, 0L, -3L),  // 0 + (−10·1) div 3 — truncation, not floor
      (2L, 0L, -6L),  // 0 + (−10·2) div 3
      (3L, 1L, -10L), // observed
      (4L, 0L, -5L),  // −10 + (15·1) div 3
      (5L, 0L, 0L),   // −10 + (15·2) div 3
      (6L, 1L, 5L)))  // observed
  }

  test("windowed funnel: re-arming anchors and window bounds by hand") {
    import spark.implicits._
    val W = 100L
    val ev = Seq(
      // user 1 — RE-ARM saves the conversion: click@550 is 550 past the
      // first view but 50 past the second; first-touch anchoring would
      // miss it. purchase@600 within W of the click conversion.
      (1L, 1L, "view", 0L), (2L, 1L, "view", 500L),
      (3L, 1L, "click", 550L), (4L, 1L, "purchase", 600L),
      // user 2 — window binds: click one µs past W never converts, so
      // the purchase has no anchor either
      (5L, 2L, "view", 0L), (6L, 2L, "click", 101L), (7L, 2L, "purchase", 150L),
      // user 3 — boundary: exactly W converts (≤), W+1 downstream fails
      (8L, 3L, "view", 0L), (9L, 3L, "click", 100L), (10L, 3L, "purchase", 201L),
      // user 4 — strictly-after: the click tied with the view does not
      // convert; the later one does, and the purchase rides it
      (11L, 4L, "view", 50L), (12L, 4L, "click", 50L),
      (13L, 4L, "click", 60L), (14L, 4L, "purchase", 61L),
      // user 5 — stage-3 anchor re-arms too: the first purchase misses
      // its window (110 past the only conversion), the second session's
      // purchase converts off the SECOND click conversion
      (15L, 5L, "view", 0L), (16L, 5L, "click", 50L), (17L, 5L, "purchase", 160L),
      (18L, 5L, "view", 200L), (19L, 5L, "click", 250L), (20L, 5L, "purchase", 300L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.funnelUsersWindowed(ev, windowUs = W).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))))
      .toMap
    assert(out === Map(
      1L -> ((Some(0L), Some(550L), Some(600L))),
      2L -> ((Some(0L), None, None)),
      3L -> ((Some(0L), Some(100L), None)),
      4L -> ((Some(50L), Some(60L), Some(61L))),
      5L -> ((Some(0L), Some(50L), Some(300L)))))
  }

  test("benford audit counts leading digits of the decimal rendering") {
    import spark.implicits._
    val ord = Seq(100.00, 150.25, 199.99, 250.00).toDF("o_totalprice")
    val out = Analytics.benfordAudit(ord).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out === Map(
      1 -> (3L, 750L, 301L, 449L),
      2 -> (1L, 250L, 176L, 74L)))
  }

  test("gini: two-point extremes match the closed form") {
    import spark.implicits._
    // one-whale market {0, 100} → G = 1/2; equal market {100, 100} → 0
    val rev = Seq(("w", 1L, 0L), ("w", 2L, 100L),
      ("e", 1L, 100L), ("e", 2L, 100L)).toDF("grp", "id", "rev")
    val out = Analytics.giniByGroup(rev).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out === Map("w" -> 500L, "e" -> 0L))
    // all-zero group: NULL, not 0/0
    val z = Analytics.giniByGroup(Seq(("z", 1L, 0L)).toDF("grp", "id", "rev"))
      .collect().head
    assert(z.isNullAt(3))
  }

  test("top movers rank consecutive-week deltas, gaps break the chain") {
    // series A: weeks 0,1 sums 10, 40 → delta +30; series B: weeks 0, 2
    // (gap) → no delta row at all; negative permille truncates toward 0
    val day = 86400L
    val rows = Seq(
      (0L, "A", 10.0), (7 * day, "A", 40.0), (14 * day, "A", 30.0),
      (0L, "B", 5.0), (14 * day, "B", 50.0))
    val out = Analytics.topMovers(ev(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4),
        if (r.isNullAt(5)) Long.MinValue else r.getLong(5)))
    assert(out.toSeq === Seq(
      ("A", 1L, 30000000L, 3000L), // +300% of week 0
      ("A", 2L, -10000000L, -250L))) // −25% of week 1, truncated toward 0
    assert(!out.exists(_._1 == "B"), "gap weeks must not fabricate a delta")
  }

  test("trimmed/winsorized means drop vs clamp exactly one tail row") {
    // 10 rows 1..9 plus a 1000 outlier, 10% per side → cut = 1:
    // trimmed keeps 2..9 +? — by hand: sorted 1,2,..,9,1000; drop rank 1
    // and rank 10 → keep 2..9, mean 5.5; winsorized clamps 1→2 and
    // 1000→9 → sum 44+2+9 = 55 over 10 → 5.5 too (integer micro)
    val rows = ((1 to 9).map(_.toDouble) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i * 10L, "A", v) }
    val df = rows.toDF("t", "event_type", "value")
      .select(col("t").cast("timestamp").as("ts"), col("event_type"),
        col("value"), col("t").as("event_id"))
    val r = Analytics.trimmedMeans(df, trimPermille = 100).collect().head
    assert(r.getLong(1) === 10L && r.getLong(2) === 1L && r.getLong(3) === 8L)
    assert(r.getLong(4) === 5500000L) // trimmed mean 5.5
    assert(r.getLong(5) === 5500000L) // winsorized mean 5.5
    assert(r.getLong(6) === 2000000L && r.getLong(7) === 9000000L)
  }

  test("ccf: a series that leads the reference by 1h peaks at lag +1") {
    // purchase alternates ±1 over hours 0..7; A(h) = purchase(h+1), so
    // corr(A(h), purchase(h+lag)) peaks at lag 1 with the acf-style
    // 7/8 (full-series denominator, one edge pair lost) and is exactly
    // −1 at lag 0 (all 8 hours pair, opposite sign); purchase against
    // itself at lag 0 is 1 — the self-row sanity anchor
    val ref = (0 until 8).map(h =>
      (h * 3600L, "purchase", if (h % 2 == 0) 1.0 else -1.0))
    val lead = (0 until 8).map(h =>
      (h * 3600L, "A", if ((h + 1) % 2 == 0) 1.0 else -1.0))
    val out = Analytics.ccf(ev(ref ++ lead), maxLag = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(6)).toMap
    assert(math.abs(out(("A", 1)) - 7.0 / 8.0) < 1e-9)
    assert(math.abs(out(("A", 0)) - (-1.0)) < 1e-9)
    assert(math.abs(out(("purchase", 0)) - 1.0) < 1e-9)
    assert(math.abs(out(("purchase", 1)) - (-7.0 / 8.0)) < 1e-9)
  }

  test("olsTrend fits an exact line: slope 3/h, intercept 2, r2 = 1") {
    // x = 2 + 3h over hours 0..4 — by hand: u = 5h−10, d = 15e6(h−2),
    // cov_sum = 3e6·Σ(h−2)² = 30e6, varh_sum = Σ(h−2)² = 10,
    // varv_sum = 9e6·Σ(h−2)² = 90e6
    val rows = (0 to 4).map(h => (h * 3600L, "L", 2.0 + 3.0 * h))
    val out = Analytics.olsTrend(ev(rows)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(3) === 30000000L) // cov_sum
    assert(r.getLong(4) === 10L) // varh_sum
    assert(r.getLong(5) === 90000000L) // varv_sum
    assert(r.getDouble(6) === 3000000.0) // slope: 3 units/hour in micro
    assert(r.getDouble(7) === 2000000.0) // intercept at h0 in micro
    assert(r.getDouble(8) === 1.0) // a perfect line explains everything
  }

  test("olsTrend: a series with no hour spread yields NULL fit, not 0/0") {
    val out = Analytics.olsTrend(ev(Seq((10L, "S", 5.0), (20L, "S", 7.0))))
      .collect()
    val r = out.head
    assert(r.getLong(1) === 1L) // both rows share hour 0 → one bucket
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("acf pairs require both endpoints observed (gaps pair across)") {
    // hours 0,1,3 observed: lag-1 pairs are (0,1) only; lag-2 is (1,3)
    val df = ev(Seq((0L, "A", 1.0), (3600L, "A", 2.0), (3 * 3600L, "A", 3.0)))
    val out = Analytics.acf(df, maxLag = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(out === Map(1 -> 1L, 2 -> 1L))
  }

  test("motifs: symbols by deadband, windows never span gaps or tails") {
    // ramp: hours 0..9 doubling each hour → symbols all U → 6 'UUUU'
    // windows (starts 0..5; the tail bucket has no step symbol).
    // gap: hours 0..4 then 7..11, flat values → 'FFFF' only within each
    // contiguous segment → starts {0} and {7}, never across the gap.
    val ramp = (0 to 9).map(h => (3600L * h, "ramp", math.pow(2.0, h)))
    val gap = (Seq(0, 1, 2, 3, 4) ++ Seq(7, 8, 9, 10, 11))
      .map(h => (3600L * h, "gap", 5.0))
    val out = Analytics.motifs(ev(ramp ++ gap)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("UUUU", 6L, 1L, "ramp", 0L),
      ("FFFF", 2L, 1L, "gap", 0L)))
  }

  test("changepoint finds a planted level shift at the exact split") {
    // series A: 6 hours at 10.0 then 6 hours at 20.0 — the max CUSUM
    // deviation sits exactly at t=6 (the last low bucket)
    val rows = (0 until 12).map(h =>
      (h * 3600L, "A", if (h < 6) 10.0 else 20.0))
    val out = Analytics.changepoint(ev(rows)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 12L)         // n buckets
    assert(r.getLong(2) === 6L)          // split position
    assert(r.getLong(3) === 5L)          // split hour (0-based id of bucket 6)
    assert(r.getLong(5) === 10000000L)   // mean_l_micro
    assert(r.getLong(6) === 20000000L)   // mean_r_micro
    // d_num = |S_t·n − S·t| = |60e6·12 − 180e6·6| = 360e6
    assert(r.getLong(4) === 360000000L)
  }

  test("changepoint tie-breaks to the earliest split on a flat series") {
    // constant series: every split has d_num = 0 → earliest split wins
    val rows = (0 until 5).map(h => (h * 3600L, "A", 7.0))
    val r = Analytics.changepoint(ev(rows)).collect().head
    assert(r.getLong(2) === 1L && r.getLong(4) === 0L)
    // a single-bucket series has no valid split and emits nothing
    assert(Analytics.changepoint(ev(Seq((0L, "B", 1.0)))).count() === 0L)
  }

  test("cusum closed form equals the textbook recurrence by hand") {
    // baseline = first 2 buckets (mean 15), slack 0; then the recurrence
    // s = max(0, s + x − 15) over x = 5, 8, 100 clamps at zero twice
    val rows = Seq(0, 1, 2, 3, 4).zip(Seq(10.0, 20.0, 5.0, 8.0, 100.0))
      .map { case (h, v) => (h * 3600L, "A", v) }
    val out = Analytics.cusum(ev(rows), refBuckets = 2, slackPermille = 0L)
      .collect().map(r => (r.getLong(1), r.getLong(4)))
    assert(out.toSeq === Seq((2L, 0L), (3L, 0L), (4L, 85000000L)))
    // a positive run accumulates without clamping
    val up = Seq(0, 1, 2, 3).zip(Seq(10.0, 20.0, 30.0, 40.0))
      .map { case (h, v) => (h * 3600L, "A", v) }
    val s2 = Analytics.cusum(ev(up), refBuckets = 2, slackPermille = 0L)
      .collect().map(_.getLong(4))
    assert(s2.toSeq === Seq(15000000L, 40000000L))
    // series shorter than the baseline emits nothing
    assert(Analytics.cusum(ev(rows.take(1)), refBuckets = 2).count() === 0L)
  }

  test("seasonal profile recovers a planted square wave exactly") {
    // period 2: even hours at 10, odd hours at 30 → series mean 20,
    // seasonal index −10e6 / +10e6
    val rows = (0 until 8).map(h =>
      (h * 3600L, "A", if (h % 2 == 0) 10.0 else 30.0))
    val out = Analytics.seasonalProfile(ev(rows), periodBuckets = 2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(0L) === ((4L, 10000000L, 20000000L, -10000000L)))
    assert(out(1L) === ((4L, 30000000L, 20000000L, 10000000L)))
  }

  test("char gini: 0 for repeated junk, exact rational for mixed text") {
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "aab"), (4L, ""), (5L, "漢漢字"),
      (6L, "𝄞𝄞a")) // 𝄞𝄞a — astral chars are ONE code point
      .toDF("doc_id", "text")
    val out = TextAnalysis.charGini(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L) === ((4L, 0L)))                 // single char → impurity 0
    assert(out(2L) === ((2L, 500000L)))            // 1 − 2/4 = 0.5
    assert(out(3L) === ((3L, (9L - 5L) * 1000000L / 9L))) // 1 − 5/9
    assert(!out.contains(4L))                      // empty doc emits nothing
    assert(out(5L) === ((3L, (9L - 5L) * 1000000L / 9L))) // CJK chars count singly
    assert(out(6L) === ((3L, (9L - 5L) * 1000000L / 9L))) // surrogate pairs not split
  }

  test("interval union counts overlaps once, bridges nothing over gaps") {
    // key A: [0,10] ∪ [5,20] ∪ [30,40] → 20 + 10 = 30; containment
    // [32,35] adds 0; degenerate [50,45] adds 0 but counts
    val iv = Seq(
      ("A", 0L, 10L), ("A", 5L, 20L), ("A", 30L, 40L), ("A", 32L, 35L),
      ("A", 50L, 45L), ("B", 1L, 2L))
      .toDF("key", "start_sec", "end_sec")
    val out = Analytics.intervalUnionLength(iv).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("A") === ((5L, 30L)))
    assert(out("B") === ((1L, 1L)))
  }

  test("rrfFusion: integer RRF, rank-0 for list absence, top-k order") {
    val lex = Seq((10L, 500L), (20L, 400L), (30L, 300L))
      .toDF("doc_id", "score_micro")
    val dense = Seq((20L, 1), (40L, 2)).toDF("neighbor_id", "rank")
    val out = TextAnalysis.rrfFusion(lex, dense, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    def c(r: Int) = 1000000000L / (60L + r)
    // doc 20: lex rank 2 + dense rank 1 — the only doc on both lists wins
    assert(out.head === ((20L, 2, 1, c(2) + c(1))))
    assert(out.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
    // absent list ⇒ rank 0 and zero contribution, never NULL
    val d40 = out.find(_._1 == 40L).get
    assert(d40._2 === 0 && d40._4 === c(2))
  }

  test("holt replays the dyadic level/trend recurrence by hand") {
    // hours 0..3, values 2,4,6,8 (micro ×1e6): linear ramp
    val rows = (0 until 4).map(h => (h * 3600L, "A", 2.0 * (h + 1)))
    val out = Analytics.holt(ev(rows)).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    // l1=v1, b1=0; l=(v+l'+b')>>1; b=(l-l'+3b')>>2 — all exact integers
    assert(out.toSeq === Seq(
      (0L, 2000000L, 0L),
      (1L, 3000000L, 250000L),
      (2L, 4625000L, 593750L),
      (3L, 6609375L, 941406L))) // 3765625 >> 2 floors the .25
  }

  test("holtWinters replays the three-recurrence fixture by hand") {
    // alternating 10/20 micro over 6 hourly buckets, period 2: the wave
    // migrates from trend into the seasonal slots (reference fixture
    // computed by hand; same values pin the DuckDB list-state oracle)
    val rows = (0 until 6).map(h =>
      (h * 3600L, "A", if (h % 2 == 0) 0.00001 else 0.00002))
    val out = Analytics.holtWinters(ev(rows), period = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq === Seq(
      (0L, 10L, 10L, 0L, 0L),
      (1L, 20L, 15L, 1L, 1L),
      (2L, 10L, 13L, 0L, -1L),
      (3L, 20L, 16L, 0L, 1L),
      (4L, 10L, 13L, -1L, -2L),
      (5L, 20L, 15L, -1L, 2L)))
  }

  test("holtWintersForecast projects the fixture's final state by hand") {
    // same alternating fixture as the smoother test: final l=15, b=-1,
    // season slot0=-2 (set at h=4), slot1=2 (set at h=5)
    val rows = (0 until 6).map(h =>
      (h * 3600L, "A", if (h % 2 == 0) 0.00001 else 0.00002))
    val hw = Analytics.holtWinters(ev(rows), period = 2)
    val out = Analytics.holtWintersForecastFrom(hw, horizon = 4, period = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // f_k = l + k*b + season[(5+k) % 2]
    assert(out.toSeq === Seq(
      (6L, 15L - 1L - 2L), (7L, 15L - 2L + 2L),
      (8L, 15L - 3L - 2L), (9L, 15L - 4L + 2L)))
  }

  test("topPaths counts rank-pruned first-k journeys with a total order") {
    import spark.implicits._
    val ev2 = Seq(
      (1L, "a", 0L, 10L), (1L, "b", 1L, 11L), (1L, "c", 2L, 12L),
      (2L, "a", 0L, 20L), (2L, "b", 1L, 21L),
      (4L, "a", 0L, 40L), (4L, "b", 1L, 41L),
      // 6 events: only the first 5 enter the path
      (3L, "a", 5L, 30L), (3L, "b", 6L, 31L), (3L, "c", 7L, 32L),
      (3L, "d", 8L, 33L), (3L, "e", 9L, 34L), (3L, "f", 10L, 35L))
      .toDF("user_id", "event_type", "t", "event_id")
    val out = Analytics.topPathsFrom(ev2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(
      ("a>b", 2L), ("a>b>c", 1L), ("a>b>c>d>e", 1L)))
  }

  test("deseasonal anomaly flags the planted spike, not the daily wave") {
    // 6 days of a clean square diurnal wave (20 by day, 10 by night) with
    // one +500 spike: raw-value MAD would flag every day bucket (the wave
    // IS the spread); the residual scorer must flag the spike alone once
    // the seasonal slots have warmed up
    val rows = (0 until 144).map { h =>
      val base = if (h % 24 < 12) 20.0 else 10.0
      (h * 3600L, "A", if (h == 100) base + 500.0 else base)
    }
    val flagged = Analytics.anomalyDeseasonalFrom(ev(rows)).collect()
      .map(_.getLong(1))
    assert(flagged.contains(100L), s"spike must be flagged, got ${flagged.toSeq}")
    // what MAY flag besides the spike: the two slot-transition buckets of
    // each day (h%24 ∈ {0,12} — the smoother's known lag at a square
    // edge) and the spike's recovery tail while the poisoned level/trend
    // decay. The wave BODY (steady day/night hours before the spike)
    // must never flag — that's the point of deseasonalizing.
    assert(flagged.forall(h =>
      h % 24 == 0L || h % 24 == 12L || (h >= 100L && h <= 135L)),
      s"wave body flagged: ${flagged.toSeq}")
  }

  test("holtBacktest scores the ramp fixture's one-step errors by hand") {
    val rows = (0 until 4).map(h => (h * 3600L, "A", 2.0 * (h + 1)))
    val out = Analytics.holtBacktest(ev(rows)).collect()
    // forecasts l+b: 2e6, 3.25e6, 5.21875e6 vs realized 4e6, 6e6, 8e6
    // errors 2e6, 2.75e6, 2.78125e6 -> mae = 7531250 div 3 = 2510416
    // smape terms 666, 594, 420 -> 1680 div 3 = 560
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L)
    assert(out.head.getLong(2) === 2510416L)
    assert(out.head.getLong(3) === 560L)
  }

  test("holt shifts floor on negatives (arithmetic, not truncating)") {
    val df = ev(Seq((0L, "A", 8.0), (3600L, "A", 1.999999)))
    val out = Analytics.holt(df).collect()
    // l2 = (1999999 + 8000000) >> 1 = 4999999
    // b2 = (4999999 - 8000000) >> 2 = floor(-750000.25) = -750001
    assert(out(1).getLong(3) === 4999999L)
    assert(out(1).getLong(4) === -750001L)
  }

  test("skipgramPairs: ±2 window, both orientations, exact counts") {
    val docs = Seq((1L, "a b c"), (2L, "a a")).toDF("doc_id", "text")
    val out = TextAnalysis.skipgramPairs(docs, col("text"))
      .orderBy("center", "context")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("a", "a", 2L), // doc 2's one forward pair, emitted both ways
      ("a", "b", 1L), ("a", "c", 1L),
      ("b", "a", 1L), ("b", "c", 1L),
      ("c", "a", 1L), ("c", "b", 1L)))
  }

  test("coocWeighted: GloVe 1/d weights in exact micro, both orientations") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.coocWeighted(docs, col("text"))
      .orderBy("center", "context").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // d=1 pairs weigh 1e6, the d=2 pair 5e5; every pair in both directions
    assert(out.toSeq === Seq(
      ("a", "b", 1L, 1000000L), ("a", "c", 1L, 500000L),
      ("b", "a", 1L, 1000000L), ("b", "c", 1L, 1000000L),
      ("c", "a", 1L, 500000L), ("c", "b", 1L, 1000000L)))
  }

  test("negSamplingTable: c^(3/4) in exact micro, inverse-CDF prefix") {
    // a:16 -> 16^0.75 = 8 exactly; b:1 -> 1
    val docs = Seq((1L, ("a " * 16) + "b")).toDF("doc_id", "text")
    val out = TextAnalysis.negSamplingTable(docs, col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("a", 16L, 8000000L, 8000000L),
      ("b", 1L, 1000000L, 9000000L)))
  }

  test("corpus_pack_bpe conserves the real tokenizer budget") {
    val packed = SparkEntry.queries("corpus_pack_bpe")(spark, sf)
    val counts = TextAnalysis.bpeEncode(Tables.documents(spark, sf),
      col("doc_id"), col("text"), TextAnalysis.ShippedBpeMerges)
    val packedSum = packed.agg(sum("seq_tokens")).collect()(0).getLong(0)
    val encSum = counts.agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(packedSum === encSum) // every doc lands in exactly one sequence
    assert(packed.count() === counts.count())
    // the real budget differs from the chars/4 estimate (the point)
    val est = SparkEntry.queries("corpus_pack_sequences")(spark, sf)
      .agg(sum("seq_tokens")).collect()(0).getLong(0)
    assert(packedSum !== est)
  }

  test("shipped BPE merges encode in merge order with greedy runs") {
    val docs = Seq((1L, "merge stream window")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, col("doc_id"), col("text"),
      TextAnalysis.ShippedBpeMerges).collect()
    // merge  -> m,er,g,e -> mer,g,e        (e+r then m+er chain) = 3
    // stream -> st,r,e,a,m                 (s+t only)            = 5
    // window -> w,in,d,ow                  (i+n, o+w)            = 4
    assert(out.head.getLong(1) === 12L)
    assert(out.head.getLong(2) === 3L)
  }

  test("attribution: four credit models by hand, window binding") {
    import spark.implicits._
    // W = 1000 µs. Conversion @250 credits view@100 (w=851) and click@200
    // (w=951): linear 500000 each; decay ⌊1e6·851/1802⌋=472253 /
    // ⌊1e6·951/1802⌋=527746; click is last, view is first. Conversion
    // @1300 reaches ONLY signup@400 (view/click are 1200/1100 µs back —
    // outside the window, which is the binding check): full credit.
    val ev = Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "click", 200L),
      (3L, 1L, "purchase", 250L), (4L, 1L, "signup", 400L),
      (5L, 1L, "purchase", 1300L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.attribution(ev, windowUs = 1000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("click", 1L, 1L, 0L, 500000L, 527746L),
      ("signup", 1L, 1L, 1L, 1000000L, 1000000L),
      ("view", 1L, 0L, 1L, 500000L, 472253L)))
  }

  test("attribution: same-instant touch never credits, strict-before rule") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "purchase", 100L),
      (3L, 2L, "view", 100L), (4L, 2L, "purchase", 101L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.attribution(ev, windowUs = 1000L).collect()
    assert(out.length === 1) // only user 2's pair survives
    assert(out.head.getString(0) === "view" && out.head.getLong(1) === 1L)
  }

  test("kaplan-meier: textbook curve by hand, censors hold the level") {
    import spark.implicits._
    // cohort A, n=4: deaths at t=2 (two), censor at t=3, death at t=5.
    // S(2)=1·(1−2/4)=0.5; the censor at 3 leaves S but shrinks risk to
    // 1; S(5)=0.5·(1−1/1)=0. A naive mean-of-durations has no way to
    // say "half survive past 3" here — that's the censoring point.
    val dur = Seq(
      ("A", 2L, true), ("A", 2L, true), ("A", 3L, false), ("A", 5L, true),
      ("B", 1L, false))
      .toDF("cohort", "dur_h", "observed")
    val out = Analytics.survivalCurve(dur).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("A", 2L, 4L, 2L, 0L, 500000L),
      ("A", 3L, 2L, 0L, 1L, 500000L),
      ("A", 5L, 1L, 1L, 0L, 0L),
      ("B", 1L, 1L, 0L, 1L, 1000000L)))
  }

  test("ab lift cells match an independent JDK-MD5 assignment") {
    import spark.implicits._
    // converter iff even user id (one purchase at 200 vs 100); the spec
    // recomputes the variant split with java.security MD5 — verifying
    // Spark's md5(cast(user_id)) nibble rule against an independent impl
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val users = (1L to 40L)
    val ev = users.map(u =>
        (u, u, "purchase", if (u % 2 == 0) 200.0 else 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = Analytics.abLift(ev, convValue = 150.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val exp = users.groupBy(variant).view.mapValues { us =>
      val conv = us.count(_ % 2 == 0)
      val cents = us.map(u => if (u % 2 == 0) 20000L else 10000L).sum
      (us.size.toLong, conv.toLong, 1000L * conv / us.size, cents)
    }.toMap
    assert(out === exp)
    assert(out.keySet === Set("A", "B"), "both variants populated")
  }

  test("ab chi-square: fixed double tree by hand, null on empty margin") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val users = (1L to 40L)
    val ev = users.map(u =>
        (u, u, "purchase", if (u % 2 == 0) 200.0 else 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Analytics.abChiSquare(ev, convValue = 150.0).collect()(0)
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val byV = users.groupBy(variant)
    assert(a === byV("A").count(_ % 2 == 0) && b === byV("A").count(_ % 2 == 1))
    assert(c === byV("B").count(_ % 2 == 0) && d === byV("B").count(_ % 2 == 1))
    val expected = math.round(
      (a + b + c + d).toDouble * (a * d - b * c).toDouble * (a * d - b * c).toDouble /
        (a + b).toDouble / (c + d).toDouble / (a + c).toDouble / (b + d).toDouble *
        1000000.0)
    assert(r.getLong(4) === expected)
    // every user converts → the converted=0 margin is empty → NULL, not
    // a division-by-zero cast that differs across engines
    val allConv = users.map(u => (u, u, "purchase", 200.0))
      .toDF("event_id", "user_id", "event_type", "value")
    assert(Analytics.abChiSquare(allConv, convValue = 150.0).collect()(0).isNullAt(4))
  }

  test("markov attribution: hand-solved chain, removal effects and " +
      "truncating shares") {
    import spark.implicits._
    // journeys: (A,B)->CONV, (A)->NULLS, (B)->CONV
    // p(B)=1, p(A)=1/2, p(START)=2/3; removing A: 1/3; removing B: 0
    val tr = Seq(
      ("START", "A", 2L), ("START", "B", 1L),
      ("A", "B", 1L), ("A", "NULLS", 1L), ("B", "CONV", 2L))
      .toDF("src", "dst", "n")
    val out = Analytics.markovAttribution(tr).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out("A") === ((666666L, 333333L, 333333L, 333L)))
    assert(out("B") === ((666666L, 0L, 666666L, 666L)))
    // a closed clique that never reaches absorption is singular -> NULLs
    val sing = Seq(("START", "A", 1L), ("A", "A", 1L)).toDF("src", "dst", "n")
    val sr = Analytics.markovAttribution(sing).collect()(0)
    assert(sr.getString(0) === "A")
    // full-chain pconv is undefined (singular), so effect/share are too;
    // the knockout itself still solves (empty chain -> 0), mirroring the
    // oracle's per-column CASE independence
    assert(sr.isNullAt(1) && sr.getLong(2) === 0L
      && sr.isNullAt(3) && sr.isNullAt(4))
    // no journeys at all -> empty result, not a crash
    assert(Analytics.markovAttribution(
      Seq.empty[(String, String, Long)].toDF("src", "dst", "n")).count() === 0L)
  }

  test("markov transitions: window bound, ordering, and the " +
      "non-converter absorber; pconv anchors to the journey rate") {
    import spark.implicits._
    val us = 1000000L
    // user 1 converts (touches B then A inside the window; an old touch
    // C sits beyond the 7-day lookback); user 2 never converts
    val week = 7L * 24 * 3600 * us
    val ev = Seq(
      (1L, 1L, "view", 0.0, 0L),                 // outside window
      (2L, 1L, "click", 0.0, week + 10 * us),
      (3L, 1L, "signup", 0.0, week + 20 * us),
      (4L, 1L, "purchase", 200.0, week + 30 * us),
      (5L, 2L, "view", 0.0, 10 * us),
      (6L, 2L, "click", 0.0, 20 * us),
      (7L, 2L, "purchase", 100.0, 30 * us))      // below conv value
      .toDF("event_id", "user_id", "event_type", "value", "ts_us")
    val tr = Analytics.markovTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tr === Map(
      ("START", "click") -> 1L, ("click", "signup") -> 1L,
      ("signup", "CONV") -> 1L,
      ("START", "view") -> 1L, ("view", "click") -> 1L,
      ("click", "NULLS") -> 1L))
    // the full-chain conversion probability is EXACTLY the converting-
    // journey share (1 of 2) — the MLE chain's built-in anchor
    val at = Analytics.markovAttribution(ev.transform(
      Analytics.markovTransitions(_))).collect()
    assert(at.forall(_.getLong(1) === 500000L))
  }

  private def md5Variant(u: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
  }

  test("ab welch t: exact replay of the fixed tree, null under n<2 or " +
      "zero variance") {
    import spark.implicits._
    val users = (1L to 40L)
    val ev = users.map(u =>
        (u, u, "purchase", if (u % 3 == 0) 300.0 else 100.0 + u))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Analytics.abTTest(ev).collect()(0)
    val byV = users.groupBy(md5Variant).view.mapValues(
      _.map(u => if (u % 3 == 0) 30000L else 10000L + 100 * u)).toMap
    def stats(xs: Seq[Long]) = {
      val n = xs.size.toLong; val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val g = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble /
        (BigInt(n) * n * (n - 1)).toDouble
      (n, sx, g)
    }
    val (na, sxa, ga) = stats(byV("A")); val (nb, sxb, gb) = stats(byV("B"))
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(r.getAs[Long]("mean_a_microcents") === 1000000L * sxa / na)
    assert(r.getAs[Long]("mean_b_microcents") === 1000000L * sxb / nb)
    assert(r.getAs[Long]("t_micro") === math.round(1000000.0 *
      (sxa.toDouble / na.toDouble - sxb.toDouble / nb.toDouble) /
      math.sqrt(ga + gb)))
    assert(r.getAs[Long]("df_milli") === math.round(1000.0 * (ga + gb) * (ga + gb)
      / (ga * ga / (na - 1).toDouble + gb * gb / (nb - 1).toDouble)))
    // all-equal revenue → zero variance → NULL stat, never a NaN cast
    val flat = users.map(u => (u, u, "purchase", 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val fr = Analytics.abTTest(flat).collect()(0)
    assert(fr.isNullAt(4) && fr.isNullAt(5))
    // a single user (md5("1") starts 'c' → arm B): empty arm A reads
    // NULL mean, undersized arms read NULL stats — no ANSI /0 anywhere
    val one = Seq((1L, 1L, "purchase", 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val or = Analytics.abTTest(one).collect()(0)
    assert((or.getLong(0), or.getLong(1)) === ((0L, 1L)))
    assert(or.isNullAt(2) && or.getLong(3) === 10000L * 1000000L
      && or.isNullAt(4) && or.isNullAt(5))
  }

  test("ab mann-whitney: doubled U by brute ranks, all-ties goes null") {
    import spark.implicits._
    val users = (1L to 40L)
    val ev = users.map(u =>
        (u, u, "purchase", if (u % 3 == 0) 300.0 else 100.0 + (u % 5)))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Analytics.abMannWhitney(ev).collect()(0)
    val cents = users.map(u =>
      (md5Variant(u), if (u % 3 == 0) 30000L else 10000L + 100 * (u % 5)))
    val as = cents.filter(_._1 == "A").map(_._2)
    val bs = cents.filter(_._1 == "B").map(_._2)
    // brute doubled U: 2 per strict win, 1 per tie
    val u2 = (for (a <- as; b <- bs)
      yield (if (a > b) 2L else if (a == b) 1L else 0L)).sum
    assert(r.getLong(0) === as.size.toLong && r.getLong(1) === bs.size.toLong)
    assert(r.getString(2) === u2.toString)
    val n = as.size + bs.size
    val ties3 = cents.map(_._2).groupBy(identity).values
      .map(g => { val t = g.size.toLong; BigInt(t) * t * t - t }).sum
    val sig2num = (BigInt(n) * (n - 1) * (n + 1) - ties3).toDouble
    val z = 1000000.0 * ((u2 - as.size.toLong * bs.size).toDouble / 2.0) /
      math.sqrt((as.size.toLong * bs.size).toDouble * sig2num /
        (12L * n * (n - 1)).toDouble)
    assert(r.getAs[Long]("z_micro") === math.round(z))
    // every user ties → sigma = 0 → NULL
    val flat = users.map(u => (u, u, "purchase", 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    assert(Analytics.abMannWhitney(flat).collect()(0).isNullAt(3))
  }

  test("ab cuped: theta and adjusted means replay exactly; " +
      "zero pre-period variance disables the adjustment") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val users = (1L to 40L)
    // pre-revenue grows with u, post correlated with pre plus arm noise
    val ev = users.flatMap(u => Seq(
        (2 * u, u, "purchase", 100.0 + u, t0),
        (2 * u + 1, u, "purchase", 50.0 + 2 * u + (u % 7), t1)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Analytics.abCuped(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val cells = users.map(u => (md5Variant(u),
      10000L + 100 * u, 5000L + 200 * u + 100 * (u % 7)))
    val n = cells.size.toLong
    val sx = cells.map(_._2).sum; val sy = cells.map(_._3).sum
    val sxy = cells.map(c => BigInt(c._2) * c._3).sum
    val sxx = cells.map(c => BigInt(c._2) * c._2).sum
    val syy = cells.map(c => BigInt(c._3) * c._3).sum
    val covN = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
    val varxN = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val varyN = (BigInt(n) * syy - BigInt(sy) * sy).toDouble
    for (vt <- Seq("A", "B")) {
      val vs = cells.filter(_._1 == vt)
      val nv = vs.size.toLong
      val sxv = vs.map(_._2).sum; val syv = vs.map(_._3).sum
      val row = out(vt)
      assert(row.getLong(1) === nv)
      assert(row.getLong(2) === 1000000L * syv / nv)
      assert(row.getAs[Long]("adj_mean_microcents") === math.round(1000000.0 *
        (syv.toDouble / nv.toDouble - (covN / varxN) *
          (sxv.toDouble / nv.toDouble - sx.toDouble / n.toDouble))))
      assert(row.getAs[Long]("theta_micro") ===
        math.round(1000000.0 * covN / varxN))
      assert(row.getAs[Long]("var_reduction_permille") ===
        math.round(1000.0 * (covN * covN) / (varxN * varyN)))
    }
    // constant pre-period → var(x)=0 → adjustment NULL, raw mean kept
    val ev0 = users.flatMap(u => Seq(
        (2 * u, u, "purchase", 100.0, t0),
        (2 * u + 1, u, "purchase", 50.0 + u, t1)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val z = Analytics.abCuped(ev0).collect()(0)
    assert(z.isNullAt(3) && z.isNullAt(4) && z.isNullAt(5))
  }

  test("ab power: MDE closed form, powered verdict, degenerate pools null") {
    import spark.implicits._
    val users = (1L to 40L)
    val ev = users.map(u =>
        (u, u, "purchase", if (u % 4 == 0) 200.0 else 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Analytics.abPower(ev).collect()(0)
    val byV = users.groupBy(md5Variant)
    val (na, nb) = (byV("A").size.toLong, byV("B").size.toLong)
    val (ca, cb) = (byV("A").count(_ % 4 == 0).toLong,
      byV("B").count(_ % 4 == 0).toLong)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((na, nb, ca, cb)))
    val pbar = (ca + cb).toDouble / (na + nb).toDouble
    val lift = math.round(1000000.0 *
      (ca.toDouble / na.toDouble - cb.toDouble / nb.toDouble))
    val mde = math.round(1000000.0 * (1.959963984540054 + 0.8416212335729143) *
      math.sqrt(pbar * (1.0 - pbar) * (1.0 / na.toDouble + 1.0 / nb.toDouble)))
    assert(r.getAs[Long]("observed_lift_micro") === lift)
    assert(r.getAs[Long]("mde_micro") === mde)
    assert(r.getAs[Long]("powered") === (if (math.abs(lift) >= mde) 1L else 0L))
    // nobody converts → pbar = 0 → MDE undefined → NULL mde and verdict
    val none = users.map(u => (u, u, "purchase", 100.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val nr = Analytics.abPower(none).collect()(0)
    assert(nr.isNullAt(5) && nr.isNullAt(6))
  }
}
