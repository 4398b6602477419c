package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues,
  Trigger, TTLConfig, ValueState}

/** The [[UserState]] per-user profile on `transformWithState` — the
  * arbitrary-state API that supersedes `mapGroupsWithState` (typed
  * named state primitives, timers, TTL, RocksDB-backed changelog
  * checkpointing). Same fold, same output; what changes is the state
  * contract:
  *
  *  - state lives in named handles (`ValueState[UserProfile]`)
  *    instead of one opaque blob per key — evolvable independently;
  *  - the store is RocksDB with changelog checkpointing (required by
  *    the operator) — incremental state snapshots at 100 TB key
  *    cardinality instead of full-file HDFS store uploads;
  *  - TTL (unused here; `TTLConfig.NONE`) and per-key timers are
  *    declared capabilities, not hand-rolled timestamp bookkeeping.
  *
  * Batch parity with the `mapGroupsWithState` twin is pinned in
  * StreamingSpec (identical profiles on the driver corpus).
  */
object UserStateTws {

  import UserState.{UserEvent, UserProfile}

  /** Same per-user fold as [[UserState.updateProfile]], expressed as
    * a StatefulProcessor over a named ValueState. */
  class ProfileProcessor extends StatefulProcessor[Long, UserEvent, UserProfile] {
    @transient private var profile: ValueState[UserProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[UserProfile](
        "profile", Encoders.product[UserProfile], TTLConfig.NONE)

    override def handleInputRows(userId: Long, events: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserProfile] = {
      val prior =
        if (profile.exists()) profile.get() else UserState.emptyProfile(userId)
      val next = UserState.foldProfile(prior, events)
      profile.update(next)
      Iterator.single(next)
    }
  }

  /** [[UserState.runProfiles]] on the transformWithState operator.
    * The operator requires the RocksDB state store provider; the conf
    * is scoped to this run and restored after. */
  def runProfiles(spark: SparkSession, dir: String): Dataset[UserProfile] = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt-").toString
      val events = ScoringStream.scoredStream(spark, dir)
        .select($"user_id", $"ts", $"value").as[UserEvent]
      val profiles = events
        .groupByKey(_.user_id)
        .transformWithState(new ProfileProcessor, TimeMode.None(), OutputMode.Update())
      val q = profiles.writeStream
        .outputMode(OutputMode.Update())
        .format("memory").queryName("graft_user_profiles_tws")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      UserState.finalProfiles(spark, "graft_user_profiles_tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
