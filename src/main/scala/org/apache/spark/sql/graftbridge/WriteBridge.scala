package org.apache.spark.sql.graftbridge

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType, JobID}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet writing over `private[sql]` machinery — the write
  * twin of [[ScanBridge]].
  *
  * DSv2 [[org.apache.spark.sql.connector.write.DataWriter]]s run on
  * executors and must emit parquet files directly (no DataFrame writer is
  * reachable from a task). Spark's own write support —
  * `ParquetFileFormat.prepareWrite` → [[OutputWriterFactory]] — is exactly
  * that per-file writer (same compression, schema conversion and
  * timestamp/decimal encodings as every other file the engine writes, so the
  * read path cannot tell who wrote a file), but it is `private[sql]`. This
  * bridge captures the prepared factory plus the job's Hadoop conf in a
  * serializable handle tasks can open writers from.
  */
object WriteBridge {

  /** Serializable per-task handle: `open(path, …)` returns an
    * [[OutputWriter]] writing `schema`-shaped [[org.apache.spark.sql.catalyst.InternalRow]]s
    * to `path`. One writer per output file; close() finalizes the footer.
    */
  final class TaskWriterFactory(
      factory: OutputWriterFactory,
      conf: SerializableConfiguration,
      schema: StructType) extends Serializable {
    def open(path: String, partitionId: Int, taskId: Long): OutputWriter = {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt)
      factory.newInstance(path, schema, new TaskAttemptContextImpl(conf.value, attempt))
    }
  }

  /** Prepare a parquet writer factory for `schema` under the session's SQL
    * conf (driver-side; the result ships to tasks).
    */
  def parquetWriterFactory(spark: SparkSession, schema: StructType): TaskWriterFactory = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = Job.getInstance(classic.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(classic, job, Map.empty, schema)
    new TaskWriterFactory(factory, new SerializableConfiguration(job.getConfiguration), schema)
  }
}
