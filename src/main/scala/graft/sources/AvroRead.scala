package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro object-container reader over the `binaryFile` source —
  * closes the K1 AVRO load path (reference
  * `hive_bq_load_utils.py:201-227`) without the `spark-avro` connector,
  * which is absent from this build's offline classpath; Avro CORE
  * (`avro-1.12.1`) does ship, and the container format + generic datum
  * reader live there.
  *
  * Shape: the driver sniffs the writer schema from the header of the
  * first file (lexicographic path order — container headers are
  * self-describing), maps it to a Spark `StructType`, and executors
  * decode whole files from the binaryFile rows with a per-partition
  * `GenericDatumReader` (the schema travels as its canonical JSON
  * string — `org.apache.avro.Schema` is not serializable). Parallelism
  * is per FILE — the same unit as the reference's per-file load jobs.
  * Block-level splitting of a single huge container needs the connector
  * (sync-marker seeks); files beyond the binaryFile 2 GB row limit fail
  * loudly upstream rather than decoding partially.
  *
  * Type mapping (fail-loudly beyond it): Avro primitives, enum/fixed,
  * nullable unions, arrays, maps (string keys), nested records, and the
  * date / timestamp-millis / timestamp-micros logical types.
  */
object AvroRead {

  /** Spark type for an Avro schema; throws on shapes outside the
    * supported matrix (multi-branch unions, union-of-collections …). */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case lt if lt != null && lt.getName == "timestamp-millis" => TimestampType
      case lt if lt != null && lt.getName == "timestamp-micros" => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
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
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: GenericFixed => f.bytes().clone()
    case i: java.lang.Integer =>
      val sch = resolve(avro, Schema.Type.INT)
      if (sch.getLogicalType != null && sch.getLogicalType.getName == "date")
        java.time.LocalDate.ofEpochDay(i.longValue) else i
    case l: java.lang.Long =>
      val sch = resolve(avro, Schema.Type.LONG)
      sch.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-millis" =>
          java.time.Instant.ofEpochMilli(l)
        case lt if lt != null && lt.getName == "timestamp-micros" =>
          java.time.Instant.ofEpochSecond(
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

  /** Writer schema sniffed from the first container file under `path`
    * (driver-side, header bytes only — containers are self-describing). */
  def schemaOf(spark: SparkSession, path: String): Schema = {
    val first = spark.read.format("binaryFile").load(path)
      .select("path", "content").orderBy("path").limit(1).collect()
    require(first.nonEmpty, s"avro: no files under $path")
    val in = new SeekableByteArrayInput(first(0).getAs[Array[Byte]]("content"))
    val rd = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try rd.getSchema finally rd.close()
  }

  /** All records under `path` (container files, any layout `binaryFile`
    * globs) as a DataFrame with the mapped schema. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = schemaOf(spark, path)
    require(avroSchema.getType == Schema.Type.RECORD,
      s"avro: top-level schema must be a record, got ${avroSchema.getType}")
    val sparkSchema = sparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString // Schema itself is not Serializable
    val rows = spark.read.format("binaryFile").load(path)
      .select("content").rdd.mapPartitions { parts =>
        val schema = new Schema.Parser().parse(schemaJson)
        parts.flatMap { fileRow =>
          val in = new SeekableByteArrayInput(fileRow.getAs[Array[Byte]](0))
          // one reader per file; reader schema = writer schema of file 1,
          // so heterogeneous containers resolve (or fail loudly) per Avro
          // schema-resolution rules
          val rd = new DataFileReader[GenericRecord](
            in, new GenericDatumReader[GenericRecord](schema))
          try rd.iterator().asScala
            .map(rec => convert(rec, schema).asInstanceOf[Row]).toVector
          finally rd.close()
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
