package org.apache.spark.sql

import org.apache.spark.sql.execution.streaming.operators.stateful.flatmapgroupswithstate.GroupStateImpl
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Test-scope accessor for the private[sql] GroupStateImpl factory, so unit
  * tests can drive a flatMapGroupsWithState function without a streaming
  * harness.
  */
object GraftTestState {
  def forStreaming[S](batchTimeMs: Long): GroupState[S] =
    GroupStateImpl.createForStreaming[S](
      None, batchTimeMs, 0L,
      GroupStateTimeout.EventTimeTimeout, false, true)
}
