package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to the `private[sql]` streaming state-store singleton.
  *
  * `StateStore` is a JVM-global object caching the driver's coordinator
  * RPC ref and the executor-side loaded providers. Stopping a
  * SparkContext does NOT reset it, so a second context in the same JVM
  * (the bench's session recycle) inherits a coordinator ref pointing at
  * the dead context's RPC endpoint and every subsequent stateful
  * streaming query fails with RpcEndpointNotFoundException. Explicitly
  * stopping the singleton between sessions clears the providers, the
  * maintenance thread, and the stale ref; the next streaming query
  * re-creates all three against the live context.
  */
object StateStoreBridge {
  def reset(): Unit = StateStore.stop()
}
