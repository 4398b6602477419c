package graft.streaming

/** Shared fixed pool for overlapping INDEPENDENT per-micro-batch
  * actions (guide §2.6: actions are only sequential because the
  * driver calls them sequentially) — the [[StreamingMmEmit]] FacePool
  * discipline extracted for the curation stream's decision writes,
  * index appends, and window-cut faces. Each submitted action is
  * latency-bound at micro-batch sizes (a handful of small jobs plus
  * store fs ops), so overlapping them compresses the per-batch wall
  * without changing any action's lineage or output. Six threads: the
  * widest concurrent action set (2 decision faces + 4 index appends). */
private[graft] object StreamPools {
  lazy val pool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(6, (r: Runnable) => {
        val t = new Thread(r, "graft-batch-act"); t.setDaemon(true); t
      }))

  /** Run the given independent actions concurrently on [[pool]] and
    * block until ALL have settled; the first failure then rethrows
    * (the batch must fail loudly, exactly as the sequential
    * composition did). Settling EVERY future before rethrowing keeps
    * the sequential contract that no action outlives its batch — a
    * failed batch must not leave a store append racing a replay. */
  def runAll(acts: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val settled = acts.map(a => Future(a())(pool))
      .map(f => Await.ready(f, Duration.Inf).value.get)
    settled.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
  }
}
