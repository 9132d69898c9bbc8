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
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = stream.hasNext
            if (!h) stream.close()
            h
          }
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

  /** Write a DataFrame of (name, term, value) feature-bag rows back to an
    * Avro-shaped parquet training-example layout (S9 stand-in: without the
    * avro connector we persist the identical logical schema as parquet). */
  def writeTrainingExamples(df: DataFrame, path: String,
                            maxFiles: Int = 0): Unit = {
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    out.write.mode("overwrite").parquet(path)
  }
}
