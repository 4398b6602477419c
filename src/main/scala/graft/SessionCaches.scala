package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Central registry for the engine's memoized session caches (the
  * `appId#dir`-keyed TrieMaps holding persisted frames, trained
  * centroids, promoted artifact stores, …).
  *
  * Each memo registers itself at class-init; the registry adds the
  * BOUNDED-SESSION hook the per-query memos deliberately lack: a
  * long-lived session that walks many datasets calls
  * [[evict]] after finishing one, releasing every persisted block
  * and memo entry for that (application, dataset) pair instead of
  * accumulating cached state without bound. The gate/bench harness
  * never needs this (one dataset per JVM); a multi-tenant deployment
  * calls it from its dataset-lifecycle hook.
  */
object SessionCaches {

  private val registered =
    scala.collection.mutable.ArrayBuffer.empty[TrieMap[String, _]]

  /** Register a memo at definition site: `SessionCaches.register(
    * TrieMap.empty[String, DataFrame])`. Returns the map unchanged. */
  def register[V](m: TrieMap[String, V]): TrieMap[String, V] = synchronized {
    registered += m
    m
  }

  // Release whatever resources a memo value pins: persisted frames
  // unpersist (tuples carry frames alongside their counts); plain
  // values (arrays, stores over temp dirs, literal seqs) just drop.
  private def release(v: Any): Unit = v match {
    case df: DataFrame => df.unpersist(); ()
    case (a, b) => release(a); release(b)
    case (a, b, c) => release(a); release(b); release(c)
    case _ => ()
  }

  /** Evict every registered memo entry for this session × dataset;
    * returns the number of entries dropped. Safe to call while other
    * datasets' entries stay warm. */
  def evict(spark: SparkSession, dir: String): Int = synchronized {
    val key = spark.sparkContext.applicationId + "#" + dir
    registered.map(m => m.remove(key).map { v => release(v); 1 }.getOrElse(0)).sum
  }

  /** Evict everything — the end-of-session hook. */
  def evictAll(): Int = synchronized {
    registered.map { m =>
      val n = m.size
      m.values.foreach(release)
      m.clear()
      n
    }.sum
  }
}
