package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Connector shim — the one file of this project that lives under
  * `org.apache.spark.sql`, solely to reach two `private[sql]` seams
  * every V1 streaming source needs (the same technique the open-source
  * Delta/Iceberg/Hudi Spark connectors use for their shims). Nothing
  * here adds behavior; it only re-exposes Spark plumbing to
  * `graft.sources`.
  */
object GraftSqlShims {

  /** Re-tag a (lazily planned) batch DataFrame as a STREAMING frame —
    * the contract of `Source.getBatch`, whose returned frame must carry
    * `isStreaming = true` for MicroBatchExecution to splice it into the
    * micro-batch plan. This is exactly what Spark's own V1
    * `FileStreamSource` does per batch; the underlying RDD plans and
    * executes only when the micro-batch runs.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch`: the incoming micro-batch
    * frame is streaming-tagged and refuses the batch writer; re-wrap its
    * physical plan as a batch frame so the sink can hand it to ordinary
    * `DataFrameWriter` machinery. Valid only within the `addBatch` call,
    * per the V1 sink contract.
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
