package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Document model: meta stamping, nested-struct flattening, type coercion.
  *
  * The reference's `TopicStore` (reference src/topic_store/data.py:21-114) is
  * a nested dict auto-stamped with `_id` and `_ts_meta={session, sys_time,
  * ros_time}`; `flatten_ros_msg_dict` (data.py:100-114) flattens the message
  * tree to dotted keys. Here a document is a row whose payload is a nested
  * `struct` column; both operations are pure plan transforms (no UDFs), so
  * Catalyst prunes unused leaves all the way to the parquet scan.
  */
object Documents {

  /** Epoch seconds from a timestamp column (floor). Spark's
    * `cast(ts as long)` floors microseconds; matches DuckDB
    * `floor(epoch(ts))::BIGINT` for the oracle.
    */
  def tsSec(c: Column): Column = c.cast("long")

  /** Epoch milliseconds — the reference's canonical time unit
    * (`time_as_ms`, reference src/topic_store/utils.py:43-47).
    */
  def tsMs(c: Column): Column = (c.cast("decimal(20,6)") * 1000).cast("long")

  /** Human-readable byte size — the Spark twin of
    * `size_to_human_readable` (reference src/topic_store/utils.py:150-156),
    * for presenting [[byteSizes]] output.
    */
  def humanReadableSize(bytes: Long): String = {
    val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB")
    var v = bytes.toDouble
    var i = 0
    while (math.abs(v) >= 1024.0 && i < units.size - 1) { v /= 1024.0; i += 1 }
    if (i == 0) s"$bytes ${units(0)}"
    else String.format(java.util.Locale.ROOT, "%.1f %s", Double.box(v), units(i))
  }

  /** Stamp reference-style meta columns (data.py:28-34): `_id`, `session`,
    * `sys_time`. A 100 TB layout partitions storage by `session` so
    * session-scoped queries partition-prune.
    */
  def stampMeta(df: DataFrame, idCol: Column, sessionCol: Column, tsCol: Column): DataFrame =
    df.withColumn("_id", idCol)
      .withColumn("session", sessionCol)
      .withColumn("sys_time_sec", tsSec(tsCol))

  /** Flatten every nested struct column to top-level columns joined by
    * `sep` — the Spark twin of `flatten_ros_msg_dict` (data.py:100-114).
    * Pure projection: column pruning still reaches the scan.
    */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def walk(schema: StructType, path: Seq[String], name: Seq[String]): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        val n = name :+ f.name
        f.dataType match {
          case st: StructType => walk(st, p, n)
          case _ => Seq(col(p.map(s => s"`$s`").mkString(".")).as(n.mkString(sep)))
        }
      }
    df.select(walk(df.schema, Nil, Nil): _*)
  }

  /** Schema-tree introspection — the Spark twin of `TopicStore.__repr__`'s
    * recursive type walk (reference src/topic_store/data.py:66-95): one
    * row per leaf with its dotted path, type, and nesting depth. Pure
    * driver-side schema walk (no data scan).
    */
  def describeTree(df: DataFrame): Seq[(String, String, Int)] = {
    def walk(schema: StructType, prefix: Seq[String]): Seq[(String, String, Int)] =
      schema.fields.toSeq.flatMap { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case st: StructType => walk(st, p)
          case dt => Seq((p.mkString("."), dt.simpleString, p.length))
        }
      }
    walk(df.schema, Nil)
  }

  /** Recursive byte-size introspection — the Spark twin of `get_size`
    * (reference src/topic_store/utils.py:119-148), which walks a document
    * tree accumulating per-node byte sizes. Here: ONE distributed
    * aggregation over all leaves (no per-document driver walk), returning
    * a row per leaf path with its total payload bytes across the corpus.
    * Variable-width leaves (string/binary) measure `octet_length`;
    * fixed-width leaves contribute their storage width per non-null row;
    * nested containers (array/map) measure their JSON serialization as a
    * defined, engine-checkable proxy.
    */
  def byteSizes(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def leaves(schema: StructType, path: Seq[String]): Seq[(String, DataType)] =
      schema.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case st: StructType => leaves(st, p)
          case dt => Seq((p.mkString("."), dt))
        }
      }
    def sizeExpr(path: String, dt: DataType): Column = {
      val c = col(path.split('.').map(s => s"`$s`").mkString("."))
      dt match {
        case StringType | BinaryType => coalesce(call_function("octet_length", c), lit(0))
        case _: ArrayType | _: MapType => coalesce(call_function("octet_length", to_json(c)), lit(0))
        case other => when(c.isNotNull, lit(other.defaultSize)).otherwise(lit(0))
      }
    }
    val ls = leaves(df.schema, Nil)
    val sums = ls.map { case (p, dt) => sum(sizeExpr(p, dt)).cast("long").as(p) }
    df.agg(sums.head, sums.tail: _*)
      .select(expr(s"stack(${ls.size}, " +
        ls.map { case (p, _) => s"'$p', `$p`" }.mkString(", ") +
        ") AS (leaf, total_bytes)"))
  }

  /** Generic nested-leaf transform — the Spark twin of `DictConverter`
    * (reference src/topic_store/sanitation.py:170-263), which applies a
    * visit function to every leaf of a nested document. Rebuilds the
    * struct tree with `fn` applied to each leaf column; a pure projection,
    * so Catalyst still prunes and pushes down through it.
    */
  def mapLeaves(df: DataFrame, fn: Column => Column): DataFrame = {
    def rebuild(schema: StructType, path: Seq[String]): Seq[Column] =
      schema.fields.toSeq.map { f =>
        val p = path :+ f.name
        val c = col(p.map(s => s"`$s`").mkString("."))
        (f.dataType match {
          case st: StructType => struct(rebuild(st, p): _*)
          case _ => fn(c)
        }).as(f.name)
      }
    df.select(rebuild(df.schema, Nil): _*)
  }

  /** Type-coercion transform set — the Spark twin of `DefaultTypeParser`
    * (reference src/topic_store/sanitation.py:47-115): apply named
    * column-level coercions, keep all other columns untouched.
    */
  def coerce(df: DataFrame, coercions: Map[String, Column => Column]): DataFrame =
    coercions.foldLeft(df) { case (d, (name, fn)) => d.withColumn(name, fn(col(name))) }

  /** Content-sniffing text/binary split for one binary column — the Spark
    * twin of `bytes_to_bson_if_not_unicode` (reference
    * src/topic_store/sanitation.py:119-133): bytes that are valid UTF-8
    * become text; anything else stays opaque binary. A column must have ONE
    * type, so the union lands as a struct `{text: string, raw: binary}`
    * with exactly one side non-null. Pure codegen'd expressions
    * (`is_valid_utf8` + cast) — no UDF in the scan path.
    */
  def utf8OrBinary(c: Column): Column = {
    val valid = call_function("is_valid_utf8", c)
    struct(
      when(valid, c.cast("string")).as("text"),
      when(!valid, c).as("raw"))
  }

  /** `mapLeaves` variant whose visitor also sees the leaf's type — needed
    * for type-directed rules like [[coerceBinary]].
    */
  def mapLeavesTyped(df: DataFrame, fn: (Column, org.apache.spark.sql.types.DataType) => Column): DataFrame = {
    def rebuild(schema: StructType, path: Seq[String]): Seq[Column] =
      schema.fields.toSeq.map { f =>
        val p = path :+ f.name
        val c = col(p.map(s => s"`$s`").mkString("."))
        (f.dataType match {
          case st: StructType => struct(rebuild(st, p): _*)
          case dt => fn(c, dt)
        }).as(f.name)
      }
    df.select(rebuild(df.schema, Nil): _*)
  }

  /** Apply [[utf8OrBinary]] to every binary leaf of the document tree
    * (nested structs included); non-binary leaves pass through.
    */
  def coerceBinary(df: DataFrame): DataFrame =
    mapLeavesTyped(df, (c, dt) => dt match {
      case org.apache.spark.sql.types.BinaryType => utf8OrBinary(c)
      case _ => c
    })

  /** SCHEMA-DRIFT CONTRACT (SURVEY §3): the reference's documents are
    * schemaless — a new field simply appears on new documents and reads
    * as None/missing on old ones, and pymongo stores Python ints and
    * floats interchangeably — while graft's store rows are parquet
    * structs. The pinned rule for a batch whose schema drifted from the
    * store's:
    *
    *  - NEW fields (top-level or nested) merge in with NULL backfill on
    *    the side that lacks them — exactly the schemaless read semantics;
    *  - NUMERIC drift widens within its family: integrals to the wider
    *    integral, anything fractional to double (the int→float drift a
    *    Python writer produces), never the narrowing direction;
    *  - structs and array elements merge recursively;
    *  - anything else (string↔long, binary↔struct, decimal drift …)
    *    REJECTS LOUDLY, naming the field path — a silent cast is how a
    *    schemaless store corrupts. Text-vs-binary drift is not an
    *    exception: pass batches through [[coerceBinary]] FIRST, so every
    *    binary leaf is already the `{text, raw}` union and the merged
    *    leaf stays the union.
    *
    * Returned field order: store fields first (readers keep their
    * positions), then batch-only fields in batch order. Fields missing
    * on either side come back nullable.
    */
  def mergedSchema(a: StructType, b: StructType, path: String = ""): StructType = {
    import org.apache.spark.sql.types._
    def widened(x: DataType, y: DataType, p: String): DataType = {
      val integralRank: Map[DataType, Int] =
        Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
      (x, y) match {
        case _ if x == y => x
        case _ if integralRank.contains(x) && integralRank.contains(y) =>
          if (integralRank(x) >= integralRank(y)) x else y
        // fractional widening is float/double-vs-(integral|float|double)
        // ONLY — a DecimalType on either side falls through to the loud
        // rejection below (decimal→double silently loses precision past
        // 2^53, the exact corruption the contract above forbids)
        case (FloatType | DoubleType, FloatType | DoubleType) => DoubleType
        case (FloatType | DoubleType, yi) if integralRank.contains(yi) => DoubleType
        case (xi, FloatType | DoubleType) if integralRank.contains(xi) => DoubleType
        case (xs: StructType, ys: StructType) => mergedSchema(xs, ys, p)
        case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
          ArrayType(widened(xe, ye, s"$p[]"), xn || yn)
        case _ => throw new IllegalArgumentException(
          s"schema drift rejected at '${p.stripPrefix(".")}': " +
            s"${x.simpleString} vs ${y.simpleString} (only new fields and " +
            "numeric widening merge; coerceBinary first for binary leaves)")
      }
    }
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { af =>
      bByName.get(af.name) match {
        case Some(bf) =>
          StructField(af.name, widened(af.dataType, bf.dataType, s"$path.${af.name}"),
            af.nullable || bf.nullable)
        case None => af.copy(nullable = true) // NULL backfill on batch rows
      }
    }
    val aNames = a.fieldNames.toSet
    val extra = b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ extra)
  }

  /** Project `df` onto `target` (a [[mergedSchema]] result): missing
    * fields — at any nesting depth — come back NULL, numeric leaves cast
    * wider, array elements convert through `transform`, struct identity
    * is preserved (a NULL struct stays NULL instead of becoming a struct
    * of NULLs). Pure codegen'd expressions; no data is rewritten that
    * already matches.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    import org.apache.spark.sql.types._
    def conv(c: Column, from: DataType, to: DataType): Column = (from, to) match {
      case (f, t) if f == t => c
      case (fs: StructType, ts: StructType) =>
        val byName = fs.fields.map(f => f.name -> f).toMap
        val inner = ts.fields.toSeq.map { tf =>
          (byName.get(tf.name) match {
            case Some(sf) => conv(c.getField(tf.name), sf.dataType, tf.dataType)
            case None => lit(null).cast(tf.dataType)
          }).as(tf.name)
        }
        when(c.isNull, lit(null).cast(ts)).otherwise(struct(inner: _*))
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        transform(c, x => conv(x, fe, te))
      case (_, t) => c.cast(t)
    }
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    df.select(target.fields.toSeq.map { tf =>
      (byName.get(tf.name) match {
        case Some(sf) => conv(col(s"`${tf.name}`"), sf.dataType, tf.dataType)
        case None => lit(null).cast(tf.dataType)
      }).as(tf.name)
    }: _*)
  }

  /** Reverse type coercion — the READ-BACK direction (the Spark twin of
    * `MongoDBReverseParser`, reference src/topic_store/sanitation.py:
    * 138-163, which restores stored leaf types on the way out of the
    * database): every `{text: string, raw: binary}` union leaf written
    * by [[coerceBinary]] folds back to its original single binary
    * column. The text side re-encodes as UTF-8 — lossless, because the
    * forward split only admitted byte sequences that decode as valid
    * UTF-8 — and the raw side passes through, so
    * `coerceReverse(coerceBinary(df))` is the identity on any document
    * frame, bit-for-bit. Recurses through nested structs; leaves that
    * are not the union shape pass through untouched. Pure codegen'd
    * expressions (coalesce + encode), no UDF.
    */
  def coerceReverse(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    def isUnion(st: StructType): Boolean =
      st.fields.length == 2 &&
        st.fields(0).name == "text" && st.fields(0).dataType == StringType &&
        st.fields(1).name == "raw" && st.fields(1).dataType == BinaryType
    def rebuild(schema: StructType, path: Seq[String]): Seq[Column] =
      schema.fields.toSeq.map { f =>
        val p = path :+ f.name
        val c = col(p.map(s => s"`$s`").mkString("."))
        (f.dataType match {
          case st: StructType if isUnion(st) =>
            coalesce(c.getField("raw"), encode(c.getField("text"), "UTF-8"))
          case st: StructType => struct(rebuild(st, p): _*)
          case _ => c
        }).as(f.name)
      }
    df.select(rebuild(df.schema, Nil): _*)
  }
}
