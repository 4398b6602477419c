package graft

import java.nio.file.Files

import graft.queries.FraudAnalytics
import graft.sources.{PredictionsStore, Tables}
import org.apache.spark.sql.functions._

/** Day-partitioned predictions store: partition pruning + idempotent
  * partition upsert (the index/upsert analog, init.sql:19-21 + A2). */
class PredictionsStoreSpec extends SparkSpec {

  test("day filter prunes partitions at planning time") {
    val path = Files.createTempDirectory("graft-store-").toString + "/predictions"
    val scored = FraudAnalytics.scored(Tables.events(spark, sf))
      .select("event_id", "ts", "value", "proba", "prediction")
    PredictionsStore.write(scored, path)
    val q = PredictionsStore.read(spark, path)
      .filter(col("day") === lit(java.sql.Date.valueOf("2024-01-05")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("2024-01-05"), plan)
    // pruned scan reads only the one day
    val expected = scored.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(q.count() == expected && expected > 0)
  }

  test("dynamic partition overwrite upserts exactly the touched day") {
    val path = Files.createTempDirectory("graft-store-").toString + "/predictions"
    val scored = FraudAnalytics.scored(Tables.events(spark, sf))
      .select("event_id", "ts", "value", "proba", "prediction")
    PredictionsStore.write(scored, path)
    // recompute one day with a filtered subset → only that partition replaced
    val oneDay = scored.filter(to_date(col("ts")) === "2024-01-05").limit(3)
    PredictionsStore.write(oneDay, path)
    val after = PredictionsStore.read(spark, path)
    assert(after.filter(col("day") === "2024-01-05").count() == 3)
    // every other partition is untouched
    val expectedOthers = scored.filter(to_date(col("ts")) =!= "2024-01-05").count()
    assert(after.filter(col("day") =!= "2024-01-05").count() == expectedOthers)
  }
}
