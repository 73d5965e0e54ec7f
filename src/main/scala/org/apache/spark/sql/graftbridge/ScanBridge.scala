package org.apache.spark.sql.graftbridge

import org.apache.spark.{Partition, SparkContext, TaskContext}
import org.apache.spark.paths.SparkPath
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Bucket-aligned parquet scan over `private[sql]` machinery — the
  * "bucket-aware target read" of the COW MERGE path.
  *
  * Spark's DataFrame parquet scan cannot express "partition i holds exactly
  * bucket i's files", so merging a shuffled batch with an already-bucketed
  * table forces a second exchange over the (much larger) table side. This
  * bridge builds an RDD[InternalRow] with ONE partition per table bucket,
  * each partition reading that bucket's data files through Spark's own
  * ParquetFileFormat reader function (schema clipping → additive evolution
  * nulls, predicate-free, row-returning). zipPartitions with the batch's
  * single key-shuffle (whose murmur3 partition ids equal the table's bucket
  * function by construction) then gives a co-partitioned merge with ZERO
  * table-side shuffle — the DSv2 `reportPartitioning`/storage-partitioned-
  * join outcome, without standing up a full DSv2 connector.
  */
object ScanBridge {
  private def classic(s: SparkSession): org.apache.spark.sql.classic.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Serializable per-file reader (schema clipping handles files written
    * before additive columns existed). OPTION_RETURNING_BATCH=false keeps the
    * contract Iterator[InternalRow] even when the vectorized reader runs
    * underneath.
    */
  private def parquetReaderFunc(spark: SparkSession, schema: StructType)
      : PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      classic(spark),
      dataSchema = schema,
      partitionSchema = new StructType(),
      requiredSchema = schema,
      filters = Nil,
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = classic(spark).sessionState.newHadoopConf())

  /** The serializable per-file parquet reader function, exposed for
    * executor-side use outside an RDD — the DSv2 change-feed source's
    * [[org.apache.spark.sql.connector.read.PartitionReader]]s read their
    * bucket's files through exactly the reader the bucket-aligned merge
    * scan uses (schema clipping → additive-evolution nulls).
    */
  def parquetReader(spark: SparkSession, schema: StructType)
      : PartitionedFile => Iterator[InternalRow] =
    parquetReaderFunc(spark, schema)

  /** One RDD partition per bucket; `filesByBucket(i)` = bucket i's
    * (path, fileSize) list. Partitions are lazy: a consumer that never pulls
    * from the iterator (an untouched bucket in the merge) opens no file.
    */
  def bucketFilesRdd(spark: SparkSession, schema: StructType,
      filesByBucket: Array[Array[(String, Long)]]): RDD[InternalRow] =
    new BucketFilesRDD(classic(spark).sparkContext,
      parquetReaderFunc(spark, schema), filesByBucket)

  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.toRdd

  def internalDf(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    classic(spark).internalCreateDataFrame(rdd, schema)

  /** Free the storage blocks behind a locally-checkpointed Dataset NOW.
    * `Dataset.unpersist()` only touches CacheManager entries, so
    * localCheckpoint blocks otherwise linger until the ContextCleaner
    * notices the RDD is unreferenced — unbounded executor storage for an
    * iterative algorithm that checkpoints every round. Only call on
    * generations nothing will read again: a truncated-lineage RDD cannot be
    * recomputed after its blocks are dropped.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed.collectLeaves().foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
}

private class BucketPartition(override val index: Int,
    val files: Array[(String, Long)]) extends Partition

private class BucketFilesRDD(
    sc: SparkContext,
    reader: PartitionedFile => Iterator[InternalRow],
    filesByBucket: Array[Array[(String, Long)]])
  extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[Partition] =
    filesByBucket.indices.map(i => new BucketPartition(i, filesByBucket(i))).toArray

  override def compute(split: Partition, context: TaskContext): Iterator[InternalRow] =
    split.asInstanceOf[BucketPartition].files.iterator.flatMap { case (path, size) =>
      reader(PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path), 0L, size))
    }
}
