package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Bridge into Spark's private[sql] Dataset.ofRows, so an iterative
  * operator can run its loop inside an ISOLATED child session (narrow
  * shuffle width scoped to the loop) without mutating the caller's
  * session conf — and hand the result back rebound to the caller's
  * session. Companion to [[ColumnBridge]]; lives under
  * org.apache.spark.sql by necessity.
  *
  * Only rebind plans whose lineage is session-independent (LogicalRDD
  * from localCheckpoint, local relations, file scans): plans referencing
  * session-specific state (temp views, UDFs) would resolve differently.
  */
object SessionBridge {
  def rebind(df: org.apache.spark.sql.DataFrame,
             to: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(to.asInstanceOf[SparkSession],
      df.asInstanceOf[Dataset[org.apache.spark.sql.Row]].queryExecution.logical)
}
