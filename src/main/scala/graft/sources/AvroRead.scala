package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileStream, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro object-container reader over the `binaryFile` source —
  * closes the K1 AVRO load path (reference
  * `hive_bq_load_utils.py:201-227`) without the `spark-avro` connector,
  * which is absent from this build's offline classpath; Avro CORE
  * (`avro-1.12.1`) does ship, and the container format + generic datum
  * reader live there.
  *
  * Shape: the driver reads container HEADERS only (a few KB via the
  * Hadoop filesystem — never a full file) to pick the reader schema
  * from the lexicographically-first file, maps it to a Spark
  * `StructType`, and executors stream-decode whole files from the
  * binaryFile rows with a per-file `DataFileReader` (the schema travels
  * as its canonical JSON string — `org.apache.avro.Schema` is not
  * serializable). Parallelism is per FILE — the same unit as the
  * reference's per-file load jobs. Block-level splitting of a single
  * huge container needs the connector (sync-marker seeks); files beyond
  * the binaryFile 2 GB row limit fail loudly upstream rather than
  * decoding partially.
  *
  * Schema evolution follows Avro resolution against the first file's
  * schema: older files missing an optional reader field yield null;
  * fields that exist ONLY in later files are dropped by resolution, so
  * the driver scans up to [[HeaderScanCap]] headers and logs a warning
  * naming any file whose writer schema differs — pass a wider explicit
  * reader schema (or re-order files) when the first file is the stale
  * one.
  *
  * Type mapping (fail-loudly beyond it): Avro primitives, enum/fixed,
  * [null, T] unions, arrays, string-keyed maps, nested records, and the
  * date / timestamp-millis / timestamp-micros / decimal / uuid logical
  * types. Any OTHER logical type (time-millis, local-timestamp, custom)
  * throws rather than silently degrading to its base primitive — a
  * NUMERIC column quietly loading as raw unscaled bytes is how data
  * corruption ships.
  */
object AvroRead {

  /** Max file headers the driver inspects for the schema-drift warning. */
  val HeaderScanCap = 100

  private def logical(s: Schema): Option[LogicalType] = Option(s.getLogicalType)

  /** Spark type for an Avro schema; throws on shapes outside the
    * supported matrix (multi-branch unions, unknown logical types …). */
  def sparkType(s: Schema): DataType = {
    def unsupported(lt: LogicalType): Nothing =
      throw new IllegalArgumentException(
        s"avro: unsupported logical type '${lt.getName}' on ${s.getType} — " +
          "supported: date, timestamp-millis, timestamp-micros, decimal, uuid")
    s.getType match {
      case Schema.Type.STRING => logical(s) match {
        case Some(lt) if lt.getName != "uuid" => unsupported(lt)
        case _ => StringType
      }
      case Schema.Type.ENUM => StringType
      case Schema.Type.INT => logical(s) match {
        case Some(lt) if lt.getName == "date" => DateType
        case Some(lt) => unsupported(lt)
        case None => IntegerType
      }
      case Schema.Type.LONG => logical(s) match {
        case Some(lt) if lt.getName == "timestamp-millis" => TimestampType
        case Some(lt) if lt.getName == "timestamp-micros" => TimestampType
        case Some(lt) => unsupported(lt)
        case None => LongType
      }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES | Schema.Type.FIXED => logical(s) match {
        case Some(d: LogicalTypes.Decimal) => DecimalType(d.getPrecision, d.getScale)
        case Some(lt) => unsupported(lt)
        case None => BinaryType
      }
      case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
      case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
      case Schema.Type.RECORD =>
        StructType(s.getFields.asScala.toSeq.map(f =>
          StructField(f.name, sparkType(f.schema), nullable = true)))
      case Schema.Type.NULL => NullType
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (branches.size != 1)
          throw new IllegalArgumentException(
            s"avro: unsupported union ${s} — only [null, T] unions map to a Spark type")
        sparkType(branches.head)
    }
  }

  private def decimalOf(bytes: Array[Byte], s: Schema): java.math.BigDecimal = {
    val d = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
    new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
  }

  /** Avro generic datum → Spark external row value. */
  private def convert(v: Any, avro: Schema): Any = v match {
    case null => null
    case r: GenericRecord =>
      val rec = resolve(avro, Schema.Type.RECORD)
      Row.fromSeq(rec.getFields.asScala.toSeq.map(f => convert(r.get(f.pos), f.schema)))
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: String => s
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      val sch = resolve(avro, Schema.Type.BYTES)
      if (logical(sch).exists(_.getName == "decimal")) decimalOf(a, sch) else a
    case f: GenericFixed =>
      val sch = resolve(avro, Schema.Type.FIXED)
      if (logical(sch).exists(_.getName == "decimal")) decimalOf(f.bytes(), sch)
      else f.bytes().clone()
    case i: java.lang.Integer =>
      val sch = resolve(avro, Schema.Type.INT)
      if (logical(sch).exists(_.getName == "date"))
        java.time.LocalDate.ofEpochDay(i.longValue) else i
    case l: java.lang.Long =>
      val sch = resolve(avro, Schema.Type.LONG)
      logical(sch).map(_.getName) match {
        case Some("timestamp-millis") => java.time.Instant.ofEpochMilli(l)
        case Some("timestamp-micros") => java.time.Instant.ofEpochSecond(
          Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
        case _ => l
      }
    case a: java.util.Collection[_] =>
      val el = resolve(avro, Schema.Type.ARRAY).getElementType
      a.asScala.toSeq.map(convert(_, el))
    case m: java.util.Map[_, _] =>
      val vt = resolve(avro, Schema.Type.MAP).getValueType
      m.asScala.map { case (k, mv) => k.toString -> convert(mv, vt) }.toMap
    case other => other // float, double, boolean pass through
  }

  /** Unwrap a [null, T] union down to the branch of the wanted type. */
  private def resolve(s: Schema, t: Schema.Type): Schema =
    if (s.getType == t) s
    else s.getTypes.asScala.find(_.getType == t).getOrElse(
      throw new IllegalArgumentException(s"avro: no $t branch in $s"))

  /** Data files under `path` (glob or directory), lexicographic order.
    * Directories recurse (hive-partitioned layouts) and
    * metadata/hidden entries (`_SUCCESS`, `.…crc` — the same `_`/`.`
    * prefixes Spark's own file index skips) are filtered, so the
    * driver-side enumeration matches what binaryFile will read. */
  private def listFiles(spark: SparkSession, path: String): Seq[FileStatus] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def visible(h: HPath): Boolean =
      !h.getName.startsWith("_") && !h.getName.startsWith(".")
    def walk(s: FileStatus): Seq[FileStatus] =
      if (!visible(s.getPath)) Nil
      else if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
      else Seq(s)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .flatMap(walk).sortBy(_.getPath.toString)
  }

  /** Header of one container file — a few KB read, never the payload. */
  private def headerSchema(spark: SparkSession, f: FileStatus): Schema = {
    val fs = f.getPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(f.getPath)
    try new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      .getSchema
    finally in.close()
  }

  /** Writer schema of the lexicographically-first container file, read
    * header-only driver-side; warns (up to [[HeaderScanCap]] headers)
    * when other files declare a different schema, since Avro resolution
    * silently drops fields absent from the reader schema. */
  def schemaOf(spark: SparkSession, path: String): Schema = {
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"avro: no files under $path")
    val reader = headerSchema(spark, files.head)
    val drifted = files.tail.take(HeaderScanCap - 1)
      .filter(f => headerSchema(spark, f) != reader)
    if (drifted.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"avro: ${drifted.size} of the first ${math.min(files.size, HeaderScanCap)} " +
          s"files declare a schema different from reader file ${files.head.getPath} " +
          s"(e.g. ${drifted.head.getPath}); fields missing from the reader schema " +
          "are DROPPED by Avro resolution — supply a wider reader file first if " +
          "newer files added columns")
    reader
  }

  /** All records under `path` (container files, any layout `binaryFile`
    * globs) as a DataFrame with the mapped schema. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = schemaOf(spark, path)
    require(avroSchema.getType == Schema.Type.RECORD,
      s"avro: top-level schema must be a record, got ${avroSchema.getType}")
    val sparkSchema = sparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString // Schema itself is not Serializable
    // recursiveFileLookup matches listFiles' walk exactly: nested
    // (hive-partitioned or arbitrary) layouts read in full, and the
    // file index skips the same _/. metadata entries
    val rows = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(path)
      .select("content").rdd.mapPartitions { parts =>
        val schema = new Schema.Parser().parse(schemaJson)
        parts.flatMap { fileRow =>
          val in = new SeekableByteArrayInput(fileRow.getAs[Array[Byte]](0))
          // reader schema = file 1's, so heterogeneous containers resolve
          // (or fail loudly) per Avro schema-resolution rules; records
          // stream one at a time — a Vector of a whole decoded file on
          // top of the raw bytes would double-buffer large containers
          val rd = new DataFileReader[GenericRecord](
            in, new GenericDatumReader[GenericRecord](schema))
          new Iterator[Row] {
            private var open = true
            def hasNext: Boolean = open && {
              val h = rd.hasNext
              if (!h) { rd.close(); open = false }
              h
            }
            def next(): Row = convert(rd.next(), schema).asInstanceOf[Row]
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
