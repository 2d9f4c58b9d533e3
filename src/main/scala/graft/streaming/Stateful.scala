package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY §2.10 [N]) via
  * `flatMapGroupsWithState` — per-key state the built-in windowed
  * aggregations can't express. The example operator emits a running
  * per-user event count + first-seen flag on every micro-batch, with
  * processing-time timeout so idle users' state is evicted (bounded state —
  * the property that keeps a stateful stream viable at scale).
  */
object Stateful {

  final case class UserEvent(user_id: Long, event_type: String)
  final case class UserStats(user_id: Long, total_events: Long, first_batch: Boolean)
  final case class CountState(total: Long)

  /** `idleTimeoutMs > 0` enables processing-time state eviction. Note that
    * with a timeout registered, an untriggered (as-fast-as-possible) query
    * runs continuous empty micro-batches to evaluate timeouts — pair it
    * with a real `Trigger.ProcessingTime` interval in production; pass 0
    * (no timeout) for replay/testing. */
  def runningUserStats(events: Dataset[UserEvent],
                       idleTimeoutMs: Long = 0L): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CountState, UserStats](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[CountState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.map(_.total).getOrElse(0L)
            val n = batch.size
            val first = state.getOption.isEmpty
            state.update(CountState(prev + n))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            Iterator.single(UserStats(userId, prev + n, first))
          }
      }
  }

  /** Batch-mode twin (flatMapGroupsWithState also runs on batch Datasets —
    * every group is a "first batch"): used by specs and as the oracle shape. */
  def userStatsBatch(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserStats] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroups((id, it) => UserStats(id, it.size.toLong, first_batch = true))
  }
}
