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
abstract class VersionedStore(root: String) extends Serializable {

  protected def nameDir(name: String): Path = Paths.get(root, name)

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
    * them (production itself and any staged version above it are
    * never touched, so an in-flight append survives a concurrent gc).
    * Deleting a version only unlinks ITS hardlinks; inodes shared
    * with newer versions live on — this is the manifest-expiry half
    * of the append lifecycle (append = new manifest over immutable
    * segments; gc = dropping old manifests, segments reclaimed when
    * the last reference goes). Returns the deleted versions. */
  def gc(name: String, keep: Int = 1): Seq[Int] = {
    val prod = productionVersion(name)
      .getOrElse(sys.error(s"no production version of $name to gc against"))
    val doomed = versions(name).filter(_ < prod).sorted.dropRight(keep)
    doomed.foreach { v =>
      val d = nameDir(name).resolve(s"v$v")
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(d)) { stream =>
        stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
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
    * (NOT yet promoted — callers decide when to flip the pointer). */
  def register(spark: SparkSession, name: String, df: DataFrame,
               partitionCols: Seq[String] = Nil): Int = {
    val v = latestVersion(name).getOrElse(0) + 1
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir(name, v).toString)
    v
  }

  def load(spark: SparkSession, name: String, version: Int): DataFrame =
    spark.read.parquet(dataDir(name, version).toString)

  def loadProduction(spark: SparkSession, name: String): Option[DataFrame] =
    productionVersion(name).map(load(spark, name, _))

  /** Append `batch` to the production frame and publish atomically:
    * hardlink the production version's files into a staged next
    * version, append the batch there, flip the pointer. A concurrent
    * reader sees the complete old frame until the flip; a crash
    * leaves only an unpromoted staging dir. Returns the promoted
    * version. */
  def appendBatch(spark: SparkSession, name: String, batch: DataFrame,
                  partitionCols: Seq[String] = Nil): Int = {
    val v = productionVersion(name)
      .getOrElse(sys.error(s"no production frame $name to append to"))
    val next = latestVersion(name).getOrElse(0) + 1
    linkTree(nameDir(name).resolve(s"v$v"), nameDir(name).resolve(s"v$next"))
    val w = batch.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir(name, next).toString)
    promote(name, next)
    next
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
  def deleteWhere(spark: SparkSession, name: String,
                  predicate: org.apache.spark.sql.Column): Int = {
    val v = productionVersion(name)
      .getOrElse(sys.error(s"no production frame $name to delete from"))
    val df = load(spark, name, v)
    val next = latestVersion(name).getOrElse(0) + 1
    df.filter(!predicate).write.mode("overwrite")
      .parquet(dataDir(name, next).toString)
    promote(name, next)
    next
  }

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
    val next = latestVersion(name).getOrElse(0) + 1
    import org.apache.spark.sql.functions.col
    val out =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.coalesce(targetFiles)
    val w = out.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir(name, next).toString)
    promote(name, next)
    next
  }
}
