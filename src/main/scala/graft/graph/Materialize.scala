package graft.graph

import org.apache.spark.sql.DataFrame

/** Lineage-truncation point for iterative loops, cluster-aware.
  *
  * `localCheckpoint` stores blocks on executors — fast, but lost with an
  * executor, which is fine single-process and NOT fine on 1000 nodes. When
  * the session has a reliable checkpoint dir configured
  * (`sc.setCheckpointDir`), iterative loops automatically upgrade to
  * fault-tolerant checkpoints; otherwise they use local ones. This keeps the
  * same library code correct in both deployments (SCALE.md).
  */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
