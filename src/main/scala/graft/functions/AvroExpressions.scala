package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro ⇄ Catalyst envelope codec over the public avro-core library (the
  * reference enables DataFusion's `avro` feature, /root/reference/Cargo.toml:7,
  * without ever exercising it; here the decode path is real and oracle-checked).
  * The spark-avro *connector* is not on this classpath — only its API stubs in
  * spark-sql-api (calling `from_avro` throws `AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE`)
  * — so the codec is built directly on `org.apache.avro`: flat records of
  * primitives (boolean/int/long/float/double/string/bytes), each optionally
  * nullable via the standard `["null", T]` union. That covers the Kafka
  * envelope-payload shape; nested records/arrays/maps throw a clear error.
  */
object AvroCatalyst {
  /** Catalyst field type + nullability for one Avro field schema. */
  def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val ts = s.getTypes.asScala
      require(ts.size == 2 && ts.head.getType == Schema.Type.NULL,
        s"unsupported avro union ${s}: only [\"null\", T] is supported")
      (primitive(ts(1)), true)
    case _ => (primitive(s), false)
  }

  private def primitive(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case t => throw new IllegalArgumentException(
      s"unsupported avro type $t (flat primitive records only)")
  }

  def toStruct(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD, s"not an avro record: $record")
    StructType(record.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  /** avro runtime value → Catalyst internal value. The Utf8 branch must COPY:
    * the datum reader reuses the record AND its Utf8 backing buffer row to
    * row, so an aliasing UTF8String would be silently overwritten by the next
    * decode (spark-avro's AvroDeserializer copies for the same reason). */
  def toInternal(v: AnyRef): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 =>
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(u.getBytes, 0, u.getByteLength))
    case s: java.lang.String => UTF8String.fromString(s)
    case b: ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case x => x // Long / Integer / Double / Float / Boolean box as-is
  }

  /** Catalyst internal value → avro runtime value. */
  def toAvro(v: Any): AnyRef = v match {
    case null => null
    case u: UTF8String => u.toString
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case x => x.asInstanceOf[AnyRef]
  }
}

/** `avro_decode(value, schemaJson)`: binary Avro record → struct. The
  * deserializer state (schema, datum reader, decoder) is per-task-instance
  * and reused row to row; codegen emits one call through a referenced
  * instance — the same shape spark-avro's own AvroDataToCatalyst uses, which
  * keeps the surrounding stage inside whole-stage codegen. */
case class AvroDecode(child: Expression, schemaJson: String)
    extends UnaryExpression {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  @transient private var decoder: BinaryDecoder = _
  @transient private var record: GenericRecord = _

  override lazy val dataType: DataType = AvroCatalyst.toStruct(
    new Schema.Parser().parse(schemaJson))
  override def prettyName: String = "avro_decode"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
    record = reader.read(record, decoder)
    val n = schema.getFields.size()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = AvroCatalyst.toInternal(record.get(i)); i += 1 }
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("avroDecode", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${CodeGenerator.boxedType(dataType)}) $self.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `avro_encode(struct, schemaJson)`: struct → binary Avro record, the
  * symmetric producer half (what a Kafka producer would publish). Field
  * ORDER and types of the input struct must match the schema. */
case class AvroEncode(child: Expression, schemaJson: String)
    extends UnaryExpression {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val struct = AvroCatalyst.toStruct(
    new Schema.Parser().parse(schemaJson))
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val bos = new ByteArrayOutputStream()
  @transient private var encoder: BinaryEncoder = _

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < struct.length) {
      val value = if (row.isNullAt(i)) null
        else AvroCatalyst.toAvro(row.get(i, struct(i).dataType))
      rec.put(i, value)
      i += 1
    }
    bos.reset()
    encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
    writer.write(rec, encoder)
    encoder.flush()
    bos.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("avroEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (byte[]) $self.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
