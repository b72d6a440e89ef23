package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{Convert, DocumentStore}

/** End-to-end lifecycle: stream capture → parquet store → query surface →
  * incremental migration → monitoring — the full reference workflow
  * (collect, store, query, convert) through the real engine.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("capture -> store -> query -> migrate -> monitor round trip") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 1. capture a live stream into session-partitioned parquet
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val evs = (0 until 200).map { i =>
      Ev(i.toLong, new Timestamp(base + i * 30000L), (i % 4).toLong,
        if (i % 3 == 0) "scan" else "imu", s"""{"seq": $i}""")
    }
    val input = MemoryStream[Ev]
    input.addData(evs: _*)
    val store = Files.createTempDirectory("graft_e2e").toString + "/store"
    val chk = Files.createTempDirectory("graft_e2e_chk").toString
    val q = graft.streaming.Monitor.capture(
      input.toDF(), col("event_id"), col("user_id"), col("ts"), store, chk)
    try q.processAllAvailable() finally q.stop()

    // 2. query the store through the document surface
    val docs = graft.api.Graft.load(spark, store)
    assert(DocumentStore.countDocuments(docs).collect()(0).getLong(0) === 200)
    assert(DocumentStore.findById(docs, "_id", 7L).count() === 1)
    assert(DocumentStore.findBySession(docs, "session", 2L).count() === 50)
    val latest = DocumentStore.latestSnapshot(
      docs, col("event_type"), col("sys_time_sec"), col("_id"))
    assert(latest.count() === 2) // one row per topic

    // 3. incremental migration copies everything once, then nothing
    val dst = Files.createTempDirectory("graft_e2e_dst").toString + "/mirror"
    assert(Convert.migrate(spark, docs, dst, "_id") === 200)
    assert(Convert.migrate(spark, docs, dst, "_id") === 0)

    // 4. monitor rates over the captured store equal raw counts
    val rates = DocumentStore.monitorRates(
      docs.withColumn("ts", col("ts")), col("event_type"), col("ts"), col("props"), "hour")
    assert(rates.agg(sum("n_msgs")).collect()(0).getLong(0) === 200)
  }

  test("training-data pipeline: dedup -> cluster -> quality -> split -> budget") {
    import graft.ops.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. exact dedup: one survivor (min id) per content hash
    val keepExact = TextAnalysis.exactDedup(docs, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    val afterExact = docs.join(keepExact, "doc_id")
    assert(afterExact.count() <= total && afterExact.count() > 0)

    // 2. near-dup clustering: keep each cluster's canonical (min) id
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(afterExact, col("doc_id"), col("text"), 0.5))
    val dropIds = clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val afterNear = afterExact.join(dropIds, Seq("doc_id"), "left_anti")

    // the defining invariant: the kept set contains NO near-dup pair —
    // any surviving pair would have been one cluster with one survivor
    assert(Dedup.ngramJaccardPairs(afterNear, col("doc_id"), col("text"), 0.5).count() === 0)

    // 3. quality gate
    val good = TextAnalysis.qualityScore(afterNear, col("doc_id"), col("text"))
      .filter(col("score") > 0.3).select("doc_id")
    val kept = afterNear.join(good, "doc_id")
    assert(kept.count() > 0 && kept.count() <= afterNear.count())

    // 4. reproducible split covers every kept doc exactly once
    val split = TextAnalysis.assignSplit(kept.select("doc_id"), "doc_id")
    assert(split.count() === kept.count())
    assert(split.groupBy("split").count().count() >= 2, "train and at least one holdout")

    // 5. token budget of the final corpus is positive and consistent
    val budget = TextAnalysis.tokenCount(kept, col("doc_id"), col("text"))
      .agg(sum("n_ws_tokens")).collect()(0).getLong(0)
    assert(budget > 0)

    // 6. tokenizer trained ON the kept corpus meters the real budget:
    // BPE token counts are bounded by characters (0 merges) and never
    // below the word count (merges stop at whole words)
    val merges = TextAnalysis.bpeTrain(kept, col("text"), rounds = 4)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty, "a real corpus must yield merges")
    val enc = TextAnalysis.bpeEncode(kept, col("doc_id"), col("text"), merges)
    val (bpeTok, words) = {
      val r = enc.agg(sum("n_bpe_tokens"), sum("n_words")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(enc.count() === kept.count(), "every kept doc tokenizes")
    assert(bpeTok >= words, "BPE tokens can never undercut whole words")
    assert(words === budget, "word metering must agree with tokenCount")
  }

  test("curation pipeline: span dedup -> decontaminate -> mix -> pack") {
    import graft.ops.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sf)

    // 1. sub-document span dedup rewrites each doc with shared chunks
    // removed; docs reduced to nothing drop out
    val spanned = TextAnalysis.paragraphDedup(docs, col("doc_id"), col("text"))
    assert(spanned.filter(col("n_kept") === col("n_chunks")).count() > 0,
      "some documents must survive untouched")
    val corpus = spanned.filter(col("n_kept") > 0)
      .select(col("doc_id"), col("new_text").as("text"))
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")), "doc_id")

    // 2. decontaminate against an eval set drawn from untouched docs —
    // each must be flagged against itself (13-gram overlap) and removed
    val evalSet = spanned.filter(col("n_kept") === col("n_chunks"))
      .join(docs.select("doc_id", "text"), "doc_id")
      .filter(size(split(col("text"), " ")) >= 13)
      .select("doc_id", "text").limit(5).cache()
    val evalIds = evalSet.collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty)
    val flagged = Dedup.contamination(corpus, col("doc_id"), col("text"),
      evalSet, col("doc_id"), col("text"), nGram = 13)
    val flaggedIds = flagged.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.subsetOf(flaggedIds),
      s"eval members not flagged: ${evalIds -- flaggedIds}")
    val clean = corpus.join(flagged.select("doc_id"), Seq("doc_id"), "left_anti")

    // 3. deterministic mixture re-weighting: halve src0; the nested-hash
    // rule keeps a subset, never resamples
    val src0Before = clean.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mixed = TextAnalysis.mixSources(clean, "doc_id", col("source"),
      Map("src0" -> 0.5))
    val src0After = mixed.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(src0After.subsetOf(src0Before) && src0After.size < src0Before.size)

    // 4. sequence packing: every curated doc lands in exactly one
    // fixed-budget training row
    val packed = TextAnalysis.packSequences(mixed, "doc_id",
      ceil(col("n_chars") / 4.0), 512L)
    assert(packed.count() === mixed.count())
    assert(packed.select("doc_id").distinct().count() === mixed.count())
    Dedup.unpersistShared()
  }

  test("describeTree walks nested schemas like the reference repr") {
    val df = Tables.events(spark, sf).select(
      col("event_id"),
      struct(struct(col("user_id").as("session")).as("meta"), col("props")).as("doc"))
    val tree = graft.model.Documents.describeTree(df)
    assert(tree.contains(("event_id", "bigint", 1)))
    assert(tree.contains(("doc.meta.session", "bigint", 3)))
    assert(tree.contains(("doc.props", "string", 2)))
  }
}
