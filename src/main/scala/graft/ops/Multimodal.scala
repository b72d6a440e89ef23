package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode/feature-extract plumbing.
  *
  * The actual media decoding (JPEG decode, resample, frame sample) is
  * STUBBED — the container ships no image/audio libraries — with a
  * deterministic fake that consumes the real bytes. Everything Spark-side
  * is real: schema, batch iteration (`mapPartitions`, the Scala analog of
  * `mapInPandas` batch shape), partitioning, and the metadata column flow.
  */
object Multimodal {

  /** Wrap a payload column as a typed asset: binary payload + metadata
    * struct (byte length + md5 fingerprint + declared kind).
    */
  def toAsset(df: DataFrame, idCol: Column, kindCol: Column, payloadCol: Column): DataFrame =
    df.select(
      idCol.as("asset_id"),
      kindCol.as("kind"),
      payloadCol.cast("binary").as("payload"),
      struct(
        octet_length(payloadCol.cast("binary")).as("n_bytes"),
        md5(payloadCol.cast("binary")).as("digest")).as("meta"))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract over asset batches.
    *
    * STUB: a real deployment decodes `payload` with an image/audio codec
    * and runs a feature extractor; here the "features" are a deterministic
    * fold of the payload bytes (so tests exercise the full data path).
    * The `mapPartitions` shape — iterator in, iterator out, one JVM-side
    * batch per partition — is exactly the contract a Pandas-UDF
    * (`mapInPandas`) or JNI decoder would slot into, and partitioning is
    * preserved (no shuffle).
    */
  def decodeFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val kind = row.getString(1)
        val payload = row.getAs[Array[Byte]](2)
        // deterministic fake "decode": byte-histogram folded into dim floats
        val feats = new Array[Float](dim)
        var i = 0
        while (i < payload.length) {
          feats(i % dim) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
        Row(id, kind, payload.length, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** Resize/resample over asset payloads.
    *
    * STUB: a real deployment decodes, resamples to the target resolution,
    * and re-encodes; here a deterministic stride-resample maps the payload
    * to exactly `targetBytes` bytes (consuming every source byte region).
    * The Spark-side contract is real: partition-local map (no shuffle),
    * asset schema preserved, metadata recomputed for the new payload —
    * exactly where a codec call slots in.
    */
  def resizeStub(assets: DataFrame, targetBytes: Int = 1024): DataFrame = {
    val spark = assets.sparkSession
    val schema = assets.select("asset_id", "kind", "payload").schema
    val rdd = assets.select("asset_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](2)
        val out = new Array[Byte](targetBytes)
        if (payload.nonEmpty) {
          var i = 0
          while (i < targetBytes) {
            out(i) = payload((i.toLong * payload.length / targetBytes).toInt)
            i += 1
          }
        }
        Row(row.getLong(0), row.getString(1), out)
      }
    }
    val resized = spark.createDataFrame(rdd, schema)
    resized.select(col("asset_id"), col("kind"), col("payload"),
      struct(
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest")).as("meta"))
  }

  val FrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame sampling over video payloads: one row per kept frame.
    *
    * STUB: "frames" are fixed-size byte windows of the payload; a real
    * deployment swaps the window cutter for a container demuxer. The
    * Spark-side contract is real: partition-local flatMap row
    * amplification (1 video → ⌈frames/everyN⌉ rows, no shuffle, bounded
    * fan-out), the exact shape a `mapInPandas` frame extractor has.
    */
  def frameSample(assets: DataFrame, frameBytes: Int = 256, everyN: Int = 2): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val nFrames = math.max(1, (payload.length + frameBytes - 1) / frameBytes)
        (0 until nFrames by everyN).iterator.map { f =>
          val from = math.min(f * frameBytes, payload.length)
          val until = math.min(payload.length, from + frameBytes)
          Row(id, f, java.util.Arrays.copyOfRange(payload, from, until))
        }
      }
    }
    spark.createDataFrame(rdd, FrameSchema)
  }

  /** Byte-level stats per kind — the metadata aggregation a lakehouse
    * media table needs for layout planning (all expression-level, no UDF).
    */
  def byteStats(assets: DataFrame): DataFrame =
    assets.groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        min(col("meta.n_bytes")).as("min_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
}
