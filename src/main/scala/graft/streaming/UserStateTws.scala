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
        if (profile.exists()) profile.get()
        else UserProfile(userId, 0L, 0.0, new java.sql.Timestamp(0L), spike_seen = false)
      var n = prior.n_events
      var total = prior.total_value
      var last = prior.last_ts
      var spike = prior.spike_seen
      events.foreach { e =>
        val mean = if (n > 0) total / n else Double.MaxValue
        if (n > 0 && e.value > 3.0 * mean) spike = true
        n += 1; total += e.value
        if (e.ts.after(last)) last = e.ts
      }
      val next = UserProfile(userId, n, total, last, spike)
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
      // Same final-state-per-user selection as the mapGroupsWithState
      // twin (update-mode memory sink emits one row per touched batch).
      val rows = spark.table("graft_user_profiles_tws").as[UserProfile]
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      rows.withColumn("_rn",
          row_number().over(Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)))
        .filter(col("_rn") === 1).drop("_rn")
        .as[UserProfile]
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
