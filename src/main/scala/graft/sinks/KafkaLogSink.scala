package graft.sinks

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Executable stand-in for the Kafka sink connector (`format("kafka")`).
  *
  * The real connector (`spark-sql-kafka-0-10`, not shippable in this
  * offline build — see build.sbt) accepts a DataFrame in the documented
  * message shape and produces each row to a broker. This DataSource V2
  * sink enforces the SAME contract — schema rules and required options
  * mirroring the connector's analysis-time `KafkaWriter.validateQuery`
  * checks — and then appends each message as one JSON line per row to
  * `path/<topic>-part-<partition>-<task>.jsonl`, so the full pipeline
  * (source → transforms → [[KafkaSink.toMessages]] → `write.format(...)`)
  * EXECUTES end to end in tests and local runs.
  *
  * Semantics match the reference producer's at-least-once, keyless-capable
  * publish (`/root/reference/src/sql_to_kafka.py:198-226`): writers append
  * directly (no commit coordination), task retries may duplicate — exactly
  * the delivery contract of the reference's non-idempotent producer.
  */
class KafkaLogSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaLogSink.fullMessageSchema

  // Adopt the incoming frame's schema as the table schema (the connector
  // accepts string OR binary key/value; V2's default cast check would pin
  // one) — [[KafkaLogSink.validateMessageSchema]] enforces the contract.
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaLogTable(schema)
}

object KafkaLogSink {
  /** The Kafka sink message shape (connector docs: required `value`,
    * optional `key`/`topic`/`partition`/`headers`).
    */
  val fullMessageSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", BinaryType)))),
      nullable = true)))

  /** The connector's analysis-time schema validation
    * (`KafkaWriter.validateQuery` in the public spark-sql-kafka source):
    * `value` required as STRING or BINARY; `key`/`topic`/`partition`
    * optional with fixed types; `topic` must come from either the option
    * or the column.
    */
  def validateMessageSchema(schema: StructType, topicOption: Boolean): Unit = {
    def typeOf(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    typeOf("value") match {
      case Some(StringType) | Some(BinaryType) => ()
      case Some(t) => throw new IllegalArgumentException(
        s"value attribute type must be a String or BinaryType, got $t")
      case None => throw new IllegalArgumentException(
        "required attribute 'value' not found")
    }
    typeOf("key").foreach {
      case StringType | BinaryType => ()
      case t => throw new IllegalArgumentException(
        s"key attribute type must be a String or BinaryType, got $t")
    }
    typeOf("partition").foreach {
      case IntegerType => ()
      case t => throw new IllegalArgumentException(
        s"partition attribute type must be an IntegerType, got $t")
    }
    typeOf("topic") match {
      case Some(StringType) => ()
      case Some(t) => throw new IllegalArgumentException(
        s"topic attribute type must be a String, got $t")
      case None if !topicOption => throw new IllegalArgumentException(
        "topic option required when no 'topic' attribute is present")
      case None => ()
    }
    val known = Set("key", "value", "topic", "partition", "headers")
    val extra = schema.fieldNames.filterNot(known)
    if (extra.nonEmpty) throw new IllegalArgumentException(
      s"unsupported attributes in Kafka message schema: ${extra.mkString(", ")}")
  }
}

private[sinks] class KafkaLogTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft-kafka-log"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = info.options()
    val topicOpt = Option(opts.get("topic"))
    // Same required-option rule as the connector: bootstrap servers must
    // be present (kafka-prefixed producer configs are accepted untyped).
    if (!opts.containsKey("kafka.bootstrap.servers"))
      throw new IllegalArgumentException(
        "Option 'kafka.bootstrap.servers' must be specified for configuring Kafka consumer")
    KafkaLogSink.validateMessageSchema(info.schema(), topicOpt.isDefined)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-kafka-log: 'path' option required (log directory)"))
    val writeSchema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new KafkaLogBatchWrite(path, topicOpt, writeSchema)
        // Streaming parity with the connector: writeStream.format(...)
        // works with the same contract; each epoch appends its own part
        // files (at-least-once on retry, like the connector's streaming
        // sink — Kafka publish is not idempotent across epoch replays).
        override def toStreaming: StreamingWrite =
          new KafkaLogStreamingWrite(path, topicOpt, writeSchema)
      }
    }
  }
}

private class KafkaLogBatchWrite(path: String, topicOpt: Option[String],
                                 schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KafkaLogWriterFactory(path, topicOpt, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class KafkaLogStreamingWrite(path: String, topicOpt: Option[String],
                                     schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new KafkaLogStreamingWriterFactory(path, topicOpt, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private class KafkaLogWriterFactory(path: String, topicOpt: Option[String],
                                    schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KafkaLogDataWriter(path, topicOpt, schema, f"$partitionId%05d-$taskId")
}

private class KafkaLogStreamingWriterFactory(path: String, topicOpt: Option[String],
                                             schema: StructType)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new KafkaLogDataWriter(path, topicOpt, schema,
      s"epoch-$epochId-$partitionId-$taskId")
}

/** One appender per task, like one producer per task in the connector.
  * Messages frame as JSON lines; binary key/value decode as UTF-8 (the
  * shape [[KafkaSink.toMessages]] produces).
  */
private class KafkaLogDataWriter(path: String, topicOpt: Option[String],
                                 schema: StructType, fileTag: String)
  extends DataWriter[InternalRow] {

  private val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap
  private val dir = new java.io.File(path)
  dir.mkdirs()
  private val out = new java.io.PrintWriter(new java.io.BufferedWriter(
    new java.io.FileWriter(new java.io.File(dir, s"part-$fileTag.jsonl"))))

  private def str(row: InternalRow, field: String): Option[String] =
    idx.get(field).filterNot(row.isNullAt).map { i =>
      schema(field).dataType match {
        case BinaryType => new String(row.getBinary(i), "UTF-8")
        case StringType => row.getUTF8String(i).toString
        case _ => row.get(i, schema(field).dataType).toString
      }
    }

  override def write(row: InternalRow): Unit = {
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val topic = str(row, "topic").orElse(topicOpt).getOrElse("")
    val fields = Seq("topic" -> Some(topic), "key" -> str(row, "key"),
      "value" -> str(row, "value"))
      .collect { case (n, Some(v)) => s"${q(n)}:${q(v)}" }
    out.println(fields.mkString("{", ",", "}"))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    // PrintWriter swallows IOExceptions into an internal flag — without
    // this check a disk-full partial write would COMMIT as success and
    // silently drop messages, breaking even at-least-once
    if (out.checkError())
      throw new java.io.IOException(s"write failed for part-$fileTag.jsonl")
    new WriterCommitMessage {}
  }
  override def abort(): Unit = out.close()
  override def close(): Unit = out.close()
}
