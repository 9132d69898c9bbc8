package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Minimal Avro → DataFrame source (S1/S3 of the survey).
  *
  * The runtime ships no spark-avro connector, so this reads files through
  * avro-mapred's AvroKeyInputFormat and converts records to Rows with a
  * schema inferred the way the reference does it
  * (photon-client/.../data/avro/AvroDataReader.scala:354-358 infers from a
  * sampled record; avroTypeToSql mapping :386-433):
  *   - primitives map 1:1; [null, T] unions unwrap to nullable T
  *   - numeric unions resolve by precedence DOUBLE>FLOAT>LONG>INT (:265)
  *   - unions containing STRING resolve to string (:417-418)
  *   - map<primitive> maps to MapType(string, T) (:391-397)
  *   - arrays of records are kept as array<struct> (feature bags — the
  *     reference consumes them separately; we vectorize downstream)
  *   - anything else is dropped (:425-432)
  */
object AvroIO {

  import Schema.Type._

  /** photon's numeric-union precedence. */
  private def dominant(types: Seq[Schema.Type]): Schema.Type =
    Seq(DOUBLE, FLOAT, LONG, INT).find(types.contains).get

  def avroTypeToSql(s: Schema): Option[DataType] = s.getType match {
    case INT => Some(IntegerType)
    case LONG => Some(LongType)
    case FLOAT => Some(FloatType)
    case DOUBLE => Some(DoubleType)
    case STRING | ENUM => Some(StringType)
    case BOOLEAN => Some(BooleanType)
    case MAP => avroTypeToSql(s.getValueType)
      .map(v => MapType(StringType, v, valueContainsNull = false))
    case RECORD =>
      val fields = s.getFields.asScala.toSeq.flatMap { f =>
        avroTypeToSql(f.schema()).map(t =>
          StructField(f.name(), t, nullable = true))
      }
      if (fields.isEmpty) None else Some(StructType(fields))
    case ARRAY => avroTypeToSql(s.getElementType)
      .map(e => ArrayType(e, containsNull = false))
    case UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != NULL)
      if (nonNull.isEmpty) None
      else if (nonNull.size == 1) avroTypeToSql(nonNull.head)
      else {
        val ts = nonNull.map(_.getType)
        if (ts.contains(STRING)) Some(StringType)
        else if (ts.forall(Seq(INT, LONG, FLOAT, DOUBLE).contains))
          avroTypeToSql(Schema.create(dominant(ts)))
        else None
      }
    case _ => None
  }

  def inferStructType(schema: Schema): StructType =
    StructType(schema.getFields.asScala.toSeq.flatMap { f =>
      avroTypeToSql(f.schema()).map(t =>
        StructField(f.name(), t, nullable = true))
    })

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x, IntegerType) => x.asInstanceOf[Number].intValue()
    case (x, LongType) => x.asInstanceOf[Number].longValue()
    case (x, FloatType) => x.asInstanceOf[Number].floatValue()
    case (x, DoubleType) => x.asInstanceOf[Number].doubleValue()
    case (x, StringType) => x.toString
    case (x, BooleanType) => x.asInstanceOf[Boolean]
    case (x, MapType(_, vt, _)) =>
      x.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
        k.toString -> convert(mv, vt)
      }.toMap
    case (x, ArrayType(et, _)) =>
      x.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
        .map(convert(_, et))
    case (x: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => convert(x.get(f.name), f.dataType)))
    case (x, _) => x
  }

  /** Read one or more Avro paths into a DataFrame. Schema is inferred from
    * the file header of the first path (the reference samples one record
    * the same way). Files are the unit of parallelism (avro container
    * files ship as many part files — same layout the reference reads);
    * `minPartitions` gives the reference's explicit reader parallelism
    * control (X2). */
  def read(spark: SparkSession, paths: Seq[String],
           minPartitions: Int = 0): DataFrame = {
    val sc = spark.sparkContext
    // driver: open the first file's header for the writer schema
    val hadoopPath = new org.apache.hadoop.fs.Path(paths.head)
    val fsys = hadoopPath.getFileSystem(sc.hadoopConfiguration)
    val firstFile =
      if (fsys.getFileStatus(hadoopPath).isDirectory)
        fsys.listStatus(hadoopPath).map(_.getPath)
          .filter(_.getName.endsWith(".avro")).minBy(_.getName)
      else hadoopPath
    val headStream = new DataFileStream[GenericRecord](
      fsys.open(firstFile), new GenericDatumReader[GenericRecord]())
    val struct = inferStructType(headStream.getSchema)
    headStream.close()

    val fieldNames = struct.fields.map(_.name)
    val types = struct.fields.map(_.dataType)
    val binary = sc.binaryFiles(paths.mkString(","),
      math.max(minPartitions, 1))
    val rows = binary.flatMap { case (name, pds) =>
      if (!name.endsWith(".avro")) Iterator.empty
      else {
        val stream = new DataFileStream[GenericRecord](pds.open(),
          new GenericDatumReader[GenericRecord]())
        // close on task completion, not iterator exhaustion: consumers
        // that stop early (limit/take/show) never drain the iterator and
        // would otherwise leak the input stream until GC
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => stream.close()))
        new Iterator[Row] {
          def hasNext: Boolean = stream.hasNext
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(fieldNames.toSeq.zip(types).map { case (n, t) =>
              convert(rec.get(n), t)
            })
          }
        }
      }
    }
    spark.createDataFrame(rows, struct)
  }

  // ------------------------------------------------------------ S9: write

  /** StructType → Avro schema over the subset the reader produces
    * (inverse of [[avroTypeToSql]]). Every top-level and struct field is
    * written as a [null, T] union so nullable DataFrame columns
    * round-trip; nested record names are derived from the field path
    * (Avro requires unique record names). */
  def sqlTypeToAvro(dt: DataType, path: String): Schema = dt match {
    case IntegerType => Schema.create(INT)
    case LongType => Schema.create(LONG)
    case FloatType => Schema.create(FLOAT)
    case DoubleType => Schema.create(DOUBLE)
    case StringType => Schema.create(STRING)
    case BooleanType => Schema.create(BOOLEAN)
    case BinaryType => Schema.create(BYTES)
    case MapType(StringType, vt, _) =>
      Schema.createMap(sqlTypeToAvro(vt, path + "_v"))
    case ArrayType(et, _) => Schema.createArray(sqlTypeToAvro(et, path + "_e"))
    case st: StructType =>
      val rec = Schema.createRecord(path, null, "graft", false)
      rec.setFields(st.fields.toSeq.map { f =>
        new Schema.Field(f.name,
          Schema.createUnion(Schema.create(NULL),
            sqlTypeToAvro(f.dataType, path + "_" + f.name)),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      }.asJava)
      rec
    case other =>
      throw new IllegalArgumentException(s"unsupported avro write type: $other")
  }

  private def toAvro(v: Any, s: Schema): Any = {
    val schema =
      if (s.getType == UNION)
        s.getTypes.asScala.find(_.getType != NULL).getOrElse(s)
      else s
    (v, schema.getType) match {
      case (null, _) => null
      case (x: Row, RECORD) =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        schema.getFields.asScala.foreach { f =>
          rec.put(f.name(), toAvro(x.getAs[Any](f.name()), f.schema()))
        }
        rec
      case (x: scala.collection.Seq[_], ARRAY) =>
        x.map(toAvro(_, schema.getElementType)).asJava
      case (x: scala.collection.Map[_, _], MAP) =>
        x.map { case (k, mv) =>
          k.toString -> toAvro(mv, schema.getValueType)
        }.asJava
      case (x: Array[Byte], BYTES) => java.nio.ByteBuffer.wrap(x)
      case (x, _) => x
    }
  }

  /** True distributed Avro write (S9, reference AvroDataWriter.scala:
    * 32-98): each task streams its partition through a DataFileWriter
    * into its own `part-NNNNN.avro` container file — the same layout
    * [[read]] consumes and the reference's writers produce. No driver
    * funnel: rows never leave their executor, so the write scales with
    * the cluster. The avro Schema ships as its JSON string (Schema is
    * not serializable) and the Hadoop conf as key-value pairs. */
  def write(df: DataFrame, path: String, recordName: String = "Record",
            maxFiles: Int = 0): Unit = {
    val schema = sqlTypeToAvro(df.schema, recordName)
    val schemaJson = schema.toString
    val sc = df.sparkSession.sparkContext
    val confEntries = sc.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toSeq
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(sc.hadoopConfiguration)
    // minimal commit protocol: tasks stream into an attempt-unique TEMP
    // file in a staging dir and promote it to the final part name only
    // after their writer closes cleanly — so a task killed mid-write
    // leaves a temp file that is never eligible for commit (it dies with
    // the staging dir), and whichever complete attempt promotes is
    // correct because retries of a partition write identical content.
    // A mid-job failure leaves the old dataset untouched.
    val staging = new org.apache.hadoop.fs.Path(path +
      "_staging_" + java.util.UUID.randomUUID().toString.take(8))
    fs.mkdirs(staging)
    val stagingStr = staging.toString
    val prepared = if (maxFiles > 0) df.coalesce(maxFiles) else df
    val sparkSchema = prepared.schema
    try {
    prepared.rdd.foreachPartition { rows =>
      if (rows.nonEmpty) {
        val tc = org.apache.spark.TaskContext.get()
        val part = tc.partitionId()
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val s = new Schema.Parser().parse(schemaJson)
        val taskFs = staging.getFileSystem(conf)
        val tmp = new org.apache.hadoop.fs.Path(stagingStr,
          f"_tmp-part-$part%05d-a${tc.attemptNumber()}.avro")
        val fin = new org.apache.hadoop.fs.Path(stagingStr,
          f"part-$part%05d.avro")
        val stream = taskFs.create(tmp, true)
        val writer = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[GenericRecord](s))
        writer.create(s, stream)
        try {
          val fields = sparkSchema.fields
          rows.foreach { r =>
            val rec = new org.apache.avro.generic.GenericData.Record(s)
            var i = 0
            while (i < fields.length) {
              rec.put(fields(i).name,
                toAvro(r.get(i), s.getField(fields(i).name).schema()))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
        // promote only after a clean close; if a concurrent complete
        // attempt got there first, discard this one
        if (!taskFs.rename(tmp, fin) && taskFs.exists(tmp))
          taskFs.delete(tmp, false)
      }
    }
    // commit: every final-named file is a completely-written partition
    // (promotion happens strictly after writer.close()); temps from
    // killed attempts are never promoted. Purge any lingering temps,
    // then promote the WHOLE staging dir with one rename — the old
    // dataset stays readable until the very last metadata operation,
    // instead of across an N-file rename loop.
    fs.listStatus(staging).map(_.getPath)
      .filterNot(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".avro"))
      .foreach(p => fs.delete(p, false))
    if (fs.exists(out)) fs.delete(out, true)
    if (!fs.rename(staging, out))
      throw new java.io.IOException(
        s"AvroIO.write: failed to promote $staging to $out")
    } finally if (fs.exists(staging)) fs.delete(staging, true)
  }

  /** Write feature-bag training examples back to Avro container files —
    * the reference's TrainingExampleAvro write-back path. */
  def writeTrainingExamples(df: DataFrame, path: String,
                            maxFiles: Int = 0): Unit =
    write(df, path, "TrainingExampleAvro", maxFiles)
}
