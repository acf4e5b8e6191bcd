package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into Spark's `private[sql]` Dataset construction, used
  * by graft.Bench to re-plan a registered query minus its top-level
  * presentation Sort (so operator cost and oracle-determinism cost can
  * be reported separately). Lives in this package solely for access;
  * no Spark behavior is modified.
  */
object GraftSqlAccess {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Force-create the driver's StateStoreCoordinator RPC endpoint.
    * Streaming queries do this on start; BATCH-mode stateful operators
    * (`transformWithState` on a batch Dataset) skip that path, and the
    * first state-store load then dies with RpcEndpointNotFoundException.
    * Touching the (lazily created, public-on-classic) coordinator ref
    * before executing registers the endpoint.
    */
  def ensureStateStoreCoordinator(session: SparkSession): Unit = {
    session.asInstanceOf[classic.SparkSession].streams.stateStoreCoordinator
    ()
  }
}
