package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Native DataSource V2 SINK exemplar — the write half of the storage-
  * handler tier (SURVEY §2.A; [[SyntheticDocsSource]] is the read
  * half). What it demonstrates is the COMMIT PROTOCOL, the part of a
  * sink that decides whether 100 TB jobs are restartable:
  *
  *  - every task attempt writes to a private staging file
  *    (`_staging/attempt-<partition>-<taskId>`; taskId is unique per
  *    attempt, so speculative/retried attempts can never collide);
  *  - the task's commit message carries the staged path + row count;
  *  - ONLY the driver publishes: `commit(messages)` atomically renames
  *    exactly the files named by the WINNING attempts into the target
  *    and then writes a `_SUCCESS` manifest (file → row count); a
  *    reader that honors the manifest never sees a partial job;
  *  - `abort` deletes the staging area — a failed job leaves the
  *    target untouched.
  *
  * This is the Hadoop FileOutputCommitter v1 semantics in miniature,
  * expressed through the V2 `BatchWrite`/`DataWriter` contract. Rows
  * serialize as TSV (long/int/double/string columns; strings must not
  * contain tabs/newlines — a codec concern, not a protocol one).
  */
class AtomicTextSink extends TableProvider {
  // the sink takes its schema from the query being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "AtomicTextSink is write-only; read the committed TSV via the " +
        "_SUCCESS manifest")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AtomicSinkTable(schema, properties.get("path"))
}

private class AtomicSinkTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "AtomicTextSink requires .option(\"path\", ...)")
  override def name(): String = s"atomic_text_sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AtomicBatchWrite(info.schema(), path, info.queryId())
      }
    }
}

private case class StagedFile(stagedPath: String, rows: Long)
    extends WriterCommitMessage

private class AtomicBatchWrite(schema: StructType, path: String,
    queryId: String) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    AtomicWriterFactory(schema, path, queryId)

  /** Driver-side publish: rename the winning attempts' files in, then
    * manifest. The rename is within one directory tree → atomic on a
    * POSIX filesystem; on an object store this step would be the
    * manifest-only commit (the files already live at their final
    * keys), which is why the manifest, not the directory listing, is
    * the source of truth. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val committed = messages.map { case StagedFile(staged, rows) =>
      val src = Paths.get(staged)
      val dst = dir.resolve(src.getFileName.toString
        .replaceFirst("^attempt-", "part-"))
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      s"${dst.getFileName}\t$rows"
    }
    Files.write(dir.resolve("_SUCCESS"),
      String.join("\n", committed: _*).getBytes("UTF-8"))
    deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteStaging()

  /** Delete only THIS job's staging subtree (`_staging/<queryId>/`), so
    * two concurrent jobs writing the same target path cannot delete
    * each other's in-flight attempts (ADVICE r9 — the old code cleared
    * the whole `_staging` dir). The shared `_staging` parent is removed
    * only if empty (a no-op when a sibling job is still staging). */
  private def deleteStaging(): Unit = {
    val staging = new File(s"$path/_staging/$queryId")
    Option(staging.listFiles()).foreach(_.foreach(_.delete()))
    staging.delete()
    new File(s"$path/_staging").delete() // succeeds only when empty
  }
}

private case class AtomicWriterFactory(schema: StructType, path: String,
    queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new AtomicTsvWriter(schema, path, queryId, partitionId, taskId)
}

private class AtomicTsvWriter(schema: StructType, path: String,
    queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // taskId is unique per ATTEMPT — retries/speculation stage separately;
  // the queryId level scopes staging per job (concurrent-writer safety)
  private val staged =
    new File(s"$path/_staging/$queryId/attempt-$partitionId-$taskId.tsv")
  staged.getParentFile.mkdirs()
  // explicit UTF-8: the manifest and round-trip reader are UTF-8, and
  // FileWriter's platform-default charset would mis-encode non-ASCII
  // strings on a non-UTF-8 JVM (ADVICE r9)
  private val out = Files.newBufferedWriter(staged.toPath,
    java.nio.charset.StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val cells = schema.fields.indices.map { i =>
      if (record.isNullAt(i)) ""
      else schema.fields(i).dataType match {
        case LongType => record.getLong(i).toString
        case IntegerType => record.getInt(i).toString
        case DoubleType => record.getDouble(i).toString
        case StringType => record.getUTF8String(i).toString
        case dt => throw new UnsupportedOperationException(
          s"AtomicTextSink: unsupported column type $dt")
      }
    }
    out.write(cells.mkString("\t"))
    out.write("\n")
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(staged.getAbsolutePath, rows)
  }

  override def abort(): Unit = {
    out.close()
    staged.delete()
  }

  override def close(): Unit = ()
}
