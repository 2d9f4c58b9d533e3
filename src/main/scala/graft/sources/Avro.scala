package graft.sources

import java.nio.ByteBuffer
import java.time.Instant
import java.time.temporal.ChronoUnit

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built on avro-core + avro-mapred — the
  * Spark distribution here ships the Avro LIBRARIES but not the external
  * `spark-avro` datasource module, so the engine provides the format
  * itself (round-12 verdict: Avro was the format matrix's last gap next
  * to parquet/ORC/CSV/JSON).
  *
  * Scale shape:
  *  - WRITE is one file per partition, written BY the executors (the
  *    driver never sees a row); container files carry the writer schema
  *    in their header, so the layout is self-describing.
  *  - READ goes through Hadoop's [[AvroKeyInputFormat]], which splits on
  *    Avro SYNC BLOCKS — a 10 GB file fans out across tasks exactly like
  *    parquet row groups, so one giant file is not one giant task.
  *  - COLUMN PRUNING uses Avro's own schema-resolution rule: pass a
  *    projected READER schema and the decoder skips (not materializes)
  *    every unrequested field — the row-major format's analog of parquet
  *    column pruning, applied per record at decode time. [[read]] takes
  *    the projected columns and builds that reader schema.
  *
  * Types cover the lake tables' surface (boolean/int/long/float/double/
  * string/binary + timestamp-micros and date logical types, each
  * nullable via the standard `union(null, T)`); anything else is
  * rejected loudly rather than silently corrupted.
  *
  * Task retries rewrite their partition file in place (`overwrite=true`
  * to an idempotent name) — same-bytes idempotence; a production deploy
  * would stage through an output committer like every other sink here.
  */
object Avro {

  // ------------------------------------------------ schema: Spark ⇄ Avro

  def toAvroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(
            Schema.create(Schema.Type.LONG))
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(
          s"avro sink does not map Spark type $other (column ${f.name})")
      }
      val sch =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  def toSparkType(avro: Schema): StructType = StructType(
    avro.getFields.asScala.map { f =>
      val (s, nullable) = unwrapNullable(f.schema())
      StructField(f.name(), fieldType(s, f.name()), nullable)
    }.toSeq)

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only union(null, T) is supported, got $s")
      (nonNull.head, branches.size > nonNull.size)
    } else (s, false)

  private def fieldType(s: Schema, name: String): DataType =
    (s.getType, Option(s.getLogicalType).map(_.getName)) match {
      case (Schema.Type.LONG, Some("timestamp-micros")) => TimestampType
      case (Schema.Type.INT, Some("date")) => DateType
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, _) => BinaryType
      case other => throw new IllegalArgumentException(
        s"avro source does not map Avro type $other (field $name)")
    }

  // -------------------------------------------------------------- values

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other // primitives + String pass through
  }

  private def toSparkValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (micros: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(
        Instant.EPOCH.plus(micros.longValue(), ChronoUnit.MICROS))
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (s: CharSequence, StringType) => s.toString // Utf8 is reused: copy
    case (bb: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (other, _) => other
  }

  // --------------------------------------------------------------- write

  /** Write `df` as one Avro container file per partition under `dir`.
    * Executors write in parallel; the driver only writes the empty-frame
    * marker file (schema-only) when there are no rows at all, so [[read]]
    * can always recover the schema from a file header. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val schemaJson = toAvroSchema(df.schema).toString
    val confKv = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(hconf)
    fs.mkdirs(new Path(dir))
    val written = df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        val out = new Path(f"$dir/part-$i%05d.avro")
        val os = out.getFileSystem(conf).create(out, true)
        val w = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](schema)).create(schema, os)
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var c = 0
          while (c < row.length) {
            rec.put(c, toAvroValue(row.get(c))); c += 1
          }
          w.append(rec)
        } finally w.close()
        Iterator.single(1)
      }
    }.count()
    if (written == 0) { // empty frame: schema-only file so reads self-describe
      val schema = new Schema.Parser().parse(schemaJson)
      val os = fs.create(new Path(s"$dir/part-00000.avro"), true)
      new DataFileWriter(
        new GenericDatumWriter[GenericRecord](schema)).create(schema, os)
        .close()
    }
  }

  /** The writer schema recovered from the first container file's header —
    * a driver-side, file-count-bounded metadata read. */
  def writerSchema(spark: SparkSession, dir: String): Schema = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(hconf)
    val first = fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no .avro files under $dir"))
    val in = fs.open(first.getPath)
    try new DataFileStream(in,
      new GenericDatumReader[GenericRecord]()).getSchema
    finally in.close()
  }

  // ---------------------------------------------------------------- read

  /** Read the container files under `dir`. `columns = Some(...)` installs
    * a PROJECTED reader schema: Avro's schema resolution then skips every
    * other field at decode time — per-record pruning, the row-major
    * equivalent of parquet's column pruning. Split-capable via the Hadoop
    * input format (sync-block splits). */
  def read(spark: SparkSession, dir: String,
           columns: Option[Seq[String]] = None): DataFrame = {
    val writer = writerSchema(spark, dir)
    val reader = columns.fold(writer) { cols =>
      val byName = writer.getFields.asScala.map(f => f.name() -> f).toMap
      val picked = cols.map(c => byName.getOrElse(c,
        throw new IllegalArgumentException(
          s"projected column '$c' not in writer schema " +
            s"${writer.getFields.asScala.map(_.name()).mkString(",")}")))
      Schema.createRecord(writer.getName, null, writer.getNamespace, false,
        picked.map(f => new Schema.Field(f.name(), f.schema(), null, null))
          .toList.asJava)
    }
    // Row-major by design: Avro is this engine's INGEST format (format
    // breadth), not its analytic path — reads materialize through
    // RDD[Row] (no vectorization, no predicate pushdown; column pruning
    // happens via the projected reader schema above). Sync-block splits
    // keep the read executor-parallel at any size; land into parquet
    // (the analytic path) for anything queried repeatedly.
    val st = toSparkType(reader)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, reader)
    val rows = spark.sparkContext.newAPIHadoopFile(
        s"$dir/*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val rec = k.datum()
        // the input format REUSES the record: materialize every value
        // into the Row before the next record is decoded
        Row.fromSeq(st.fields.toIndexedSeq.map(f =>
          toSparkValue(rec.get(f.name), f.dataType)))
      }
    spark.createDataFrame(rows, st)
  }
}
