package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-artifact mechanics shared by every persisted store in
  * the engine (model registry pattern; reference lifecycle:
  * `services/fraud_service/app/main.py:73-97` resolves a Production
  * artifact by pointer and hot-reloads it):
  *
  *  - immutable version directories `<root>/<name>/v<N>/`,
  *  - an atomically-replaced `PRODUCTION` pointer file — readers see
  *    either the complete old version or the complete new one,
  *  - hardlink staging for appends: a new version references the
  *    previous version's immutable files at O(#files) metadata cost
  *    (the local-FS analog of a manifest over immutable segments —
  *    at 100 TB an append must never re-copy the corpus).
  */
abstract class VersionedStore(val root: String) extends Serializable {

  protected def nameDir(name: String): Path = Paths.get(root, name)

  /** Build a version in a dot-prefixed staging dir and RENAME it into
    * place as `v<next>` before returning. `versions()` therefore never
    * observes a half-written version: a crash mid-write leaves only an
    * ignorable `.staging-*` name (swept by [[gc]]), and two concurrent
    * writers cannot collide on a version number — the rename loser
    * retries at the next free number. `batchId`, when given, is
    * recorded inside the version (see [[appliedBatch]]) so streaming
    * replays of an already-applied micro-batch can be skipped;
    * `streamId` (the appender's checkpoint identity) is recorded
    * beside it so the skip applies only to replays from the SAME
    * stream — batchIds are monotonic within one checkpoint, not
    * across checkpoints. */
  protected def stageVersion(name: String, batchId: Option[Long] = None,
                             streamId: Option[String] = None)
                            (write: Path => Unit): Int = {
    val d = nameDir(name)
    Files.createDirectories(d)
    val staging = Files.createTempDirectory(d, ".staging-")
    write(staging)
    batchId.foreach { id =>
      // the callback may have HARDLINKED the previous version's BATCH
      // marker into staging (linkTree of a batch-stamped version);
      // writing through that link would corrupt the source version's
      // marker, so unlink first and write a fresh file
      Files.deleteIfExists(staging.resolve("BATCH"))
      Files.writeString(staging.resolve("BATCH"),
        id.toString + streamId.map("\n" + _).getOrElse(""))
    }
    var v = latestVersion(name).getOrElse(0) + 1
    var done = false
    while (!done) {
      try { Files.move(staging, d.resolve(s"v$v")); done = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => v += 1 }
    }
    v
  }

  /** The foreachBatch batchId recorded when `version` was published,
    * if it came from a batch-stamped append. */
  def appliedBatch(name: String, version: Int): Option[Long] = {
    val p = nameDir(name).resolve(s"v$version").resolve("BATCH")
    if (Files.exists(p))
      Some(Files.readString(p).linesIterator.next().trim.toLong)
    else None
  }

  /** The stream (checkpoint) identity recorded beside the batchId,
    * when the publishing append carried one. */
  def appliedStream(name: String, version: Int): Option[String] = {
    val p = nameDir(name).resolve(s"v$version").resolve("BATCH")
    if (Files.exists(p)) Files.readString(p).linesIterator.drop(1).nextOption()
    else None
  }

  /** The batchId the PRODUCTION version was published under. Streaming
    * appenders use this to make at-least-once foreachBatch replays
    * idempotent: batchIds from ONE checkpoint are monotonic, so a
    * production marker ≥ the arriving batchId means this batch's
    * append already committed (the crash landed between the append
    * and the checkpoint commit) and must not run again.
    *
    * When `streamId` is given, the watermark counts ONLY if the
    * marker's recorded stream identity matches: a FRESH checkpoint
    * (batchIds restarting at 0) pointed at an existing batch-stamped
    * store would otherwise silently skip every early batch. An
    * identity-less marker (a pre-identity append, or a non-streaming
    * caller) never matches an identity-bearing probe — the safe
    * direction, since re-running an append that did NOT commit from
    * this stream is exactly what at-least-once demands. */
  def lastAppliedBatch(name: String, streamId: Option[String] = None): Option[Long] =
    productionVersion(name).flatMap { v =>
      appliedBatch(name, v)
        .filter(_ => streamId.isEmpty || appliedStream(name, v) == streamId)
    }

  def versions(name: String): Seq[Int] = {
    val d = nameDir(name)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(d)) { stream =>
        stream.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("v") && s.drop(1).forall(_.isDigit) => s.drop(1).toInt }
          .toSeq.sorted
      }
    }
  }

  def latestVersion(name: String): Option[Int] = versions(name).lastOption

  /** Atomic stage promotion: write-then-move pointer replace. */
  def promote(name: String, version: Int): Unit = {
    require(versions(name).contains(version), s"unknown version v$version of $name")
    val d = nameDir(name)
    val tmp = Files.createTempFile(d, ".PRODUCTION", ".tmp")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, d.resolve("PRODUCTION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def productionVersion(name: String): Option[Int] = {
    val p = nameDir(name).resolve("PRODUCTION")
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  /** Hardlink every data file under `src` into the same relative
    * layout under `dst` (parquet part files are immutable once
    * written, so sharing inodes is safe). Writer-metadata files
    * (`_SUCCESS`, `.crc`) are skipped rather than linked: the staged
    * append rewrites them, and a link would write through to the
    * source version's copy. */
  protected def linkTree(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(src)) { stream =>
      stream.iterator().asScala.foreach { p =>
        val rel = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(rel)
        else {
          val fn = p.getFileName.toString
          if (!fn.startsWith("_") && !fn.startsWith(".")) Files.createLink(rel, p)
        }
      }
    }
  }

  /** Retention: delete version directories SUPERSEDED by production —
    * everything below the pointer except the `keep` most recent of
    * them (production itself and any published version above it are
    * never touched). Also sweeps crash debris: `.staging-*` dirs left
    * by a writer that died before its rename (every writer stages
    * through [[stageVersion]], so an interrupted build never becomes
    * a `v<N>` dir — it stays a staging name and is reclaimed here).
    * gc must not run concurrently with an in-flight writer on the
    * same artifact (the engine runs it at stream drain time).
    * Deleting a version only unlinks ITS hardlinks; inodes shared
    * with newer versions live on — this is the manifest-expiry half
    * of the append lifecycle (append = new manifest over immutable
    * segments; gc = dropping old manifests, segments reclaimed when
    * the last reference goes). Returns the deleted versions. */
  def gc(name: String, keep: Int = 1): Seq[Int] = {
    val prod = productionVersion(name)
      .getOrElse(sys.error(s"no production version of $name to gc against"))
    import scala.jdk.CollectionConverters._
    def rmTree(d: Path): Unit =
      scala.util.Using.resource(Files.walk(d)) { stream =>
        stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    val doomed = versions(name).filter(_ < prod).sorted.dropRight(keep)
    doomed.foreach(v => rmTree(nameDir(name).resolve(s"v$v")))
    // age-gate the staging sweep: a .staging-* tree touched within the
    // last 10 minutes may belong to a LIVE writer mid-stageVersion —
    // deleting it would fail that writer's write() or rename. The gate
    // reads the NEWEST mtime anywhere in the tree, not the root dir's
    // (a root's mtime only refreshes on top-level child creation, so a
    // long build writing under staging/data/ would look stale at the
    // root while its leaves are seconds old). Only genuine crash
    // debris — no file touched for longer than any real version
    // build — is reclaimed, so gc is safe even if the drain-time
    // discipline slips and it races a writer.
    val staleBefore = System.currentTimeMillis() - 10 * 60 * 1000L
    def newestMtime(d: Path): Long =
      scala.util.Using.resource(Files.walk(d)) { stream =>
        stream.iterator().asScala
          .map(Files.getLastModifiedTime(_).toMillis).max
      }
    scala.util.Using.resource(Files.list(nameDir(name))) { stream =>
      stream.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith(".staging-"))
        .filter(p => newestMtime(p) < staleBefore)
        .foreach(rmTree)
    }
    doomed
  }
}

/** A versioned store of ONE parquet frame per artifact — the shape
  * the dedup shingle index and the decontamination gram index need:
  * corpus-scale postings that grow by append and must survive
  * restarts as a promoted artifact (a restarted dedup stream resumes
  * from the promoted index, not from a session cache).
  */
final class FrameStore(root: String) extends VersionedStore(root) {

  private def dataDir(name: String, v: Int): Path =
    nameDir(name).resolve(s"v$v").resolve("data")

  /** Persist `df` as the next version of `name`; returns the version
    * (NOT yet promoted — callers decide when to flip the pointer).
    * Staged: a crash mid-write never publishes a half-written
    * version. */
  def register(spark: SparkSession, name: String, df: DataFrame,
               partitionCols: Seq[String] = Nil): Int =
    stageVersion(name) { staging =>
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(staging.resolve("data").toString)
    }

  def load(spark: SparkSession, name: String, version: Int): DataFrame =
    spark.read.parquet(dataDir(name, version).toString)

  def loadProduction(spark: SparkSession, name: String): Option[DataFrame] =
    productionVersion(name).map(load(spark, name, _))

  /** Append `batch` to the production frame and publish atomically:
    * hardlink the production version's files into a staged next
    * version, append the batch there, rename the staging dir into
    * place, flip the pointer. A concurrent reader sees the complete
    * old frame until the flip; a crash leaves only an ignorable
    * `.staging-*` dir (reclaimed by [[gc]]). When `batchId` is given
    * (streaming foreachBatch callers), the append is IDEMPOTENT
    * under at-least-once replay: batchIds from one checkpoint are
    * monotonic, so a production watermark ≥ the arriving id means
    * this batch's append already committed (the crash landed between
    * the append and the checkpoint commit) and is skipped.
    *
    * Pass `streamId` (the stream's checkpoint location) with
    * `batchId`: the watermark skip is ENFORCED to the stream identity
    * recorded in the marker, so a FRESH checkpoint (batchIds
    * restarting at 0) pointed at an existing batch-stamped store
    * appends normally instead of silently dropping every early batch
    * — the store↔checkpoint lifetime coupling is checked, not just
    * documented. Returns the promoted version. */
  def appendBatch(spark: SparkSession, name: String, batch: DataFrame,
                  partitionCols: Seq[String] = Nil,
                  batchId: Option[Long] = None,
                  streamId: Option[String] = None): Int = {
    val v = productionVersion(name)
      .getOrElse(sys.error(s"no production frame $name to append to"))
    if (batchId.exists(id => lastAppliedBatch(name, streamId).exists(_ >= id))) v
    else {
      val next = stageVersion(name, batchId, streamId) { staging =>
        linkTree(nameDir(name).resolve(s"v$v"), staging)
        val w = batch.write.mode("append")
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(staging.resolve("data").toString)
      }
      promote(name, next)
      next
    }
  }

  /** DELETE rows from the production frame — the
    * right-to-be-forgotten half of the artifact lifecycle: a corpus
    * doc withdrawn from training must leave every derived artifact
    * (postings, fingerprints, gram indexes), not just the corpus
    * table. Publishes the filtered frame as a new version and flips
    * the pointer atomically; superseded versions still hold the rows
    * until [[gc]] retires them (an auditable grace window — run gc
    * to make the forget durable on disk). A full rewrite is the
    * parquet baseline; at 100 TB the store would partition and
    * rewrite only predicate-touched partitions, which is this same
    * operation under a partition pruning filter. Returns the
    * promoted version. */
  /** REWRITE the production frame through `f` and publish
    * atomically — the general maintenance primitive behind
    * [[deleteWhere]] and state-snapshot pruning (e.g. the SCD2
    * twin's open-row set, which appends per-batch deltas and
    * periodically collapses to the current row per key). Preserves
    * the applied-batch watermark (same as compact): if a streaming
    * appender also feeds this store, a rewrite that dropped the
    * marker would reset lastAppliedBatch to None and an
    * at-least-once replay would re-append an already-committed
    * batch. */
  def rewrite(spark: SparkSession, name: String)(f: DataFrame => DataFrame): Int = {
    val v = productionVersion(name)
      .getOrElse(sys.error(s"no production frame $name to rewrite"))
    val df = load(spark, name, v)
    val next = stageVersion(name) { staging =>
      f(df).write.mode("overwrite")
        .parquet(staging.resolve("data").toString)
      val marker = nameDir(name).resolve(s"v$v").resolve("BATCH")
      if (Files.exists(marker))
        Files.copy(marker, staging.resolve("BATCH"))
    }
    promote(name, next)
    next
  }

  def deleteWhere(spark: SparkSession, name: String,
                  predicate: org.apache.spark.sql.Column): Int =
    rewrite(spark, name)(_.filter(!predicate))

  /** COMPACT the production frame: every [[appendBatch]] adds part
    * files, and after N micro-batches a scan opens N× the files it
    * needs (the classic streaming small-files problem — at 100 TB
    * the file-listing alone dominates). Rewrites production into a
    * new version — `targetFiles` part files (per partition dir when
    * partitioned, via repartition on the partition columns) — and
    * flips the pointer atomically; readers see either the fragmented
    * or the compacted version, both with identical rows. Old
    * versions stay until [[gc]]. Returns the promoted version. */
  def compact(spark: SparkSession, name: String,
              partitionCols: Seq[String] = Nil, targetFiles: Int = 1): Int = {
    val v = productionVersion(name)
      .getOrElse(sys.error(s"no production frame $name to compact"))
    val df = load(spark, name, v)
    import org.apache.spark.sql.functions.col
    val out =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.coalesce(targetFiles)
    val next = stageVersion(name) { staging =>
      val w = out.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(staging.resolve("data").toString)
      // maintenance preserves the applied-batch watermark: a replayed
      // micro-batch must still be recognized after a compaction ran
      val marker = nameDir(name).resolve(s"v$v").resolve("BATCH")
      if (Files.exists(marker))
        Files.copy(marker, staging.resolve("BATCH"))
    }
    promote(name, next)
    next
  }
}
