package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.UpsertOps

/** The reference's RDBMS sink layer (database.py:106-212 — probe, insert,
  * rollback-per-duplicate) re-expressed as the standard Structured-Streaming
  * transactional-sink recipe: `foreachBatch` MERGEs each micro-batch into a
  * keyed table-like target, exactly-once under replay.
  *
  * The sandbox has no RDBMS, so the target is a parquet "table" + a
  * committed-batch ledger; against a real database the SAME `writeBatch`
  * body becomes `MERGE INTO ... USING batch` (or `df.write.jdbc` to a
  * staging table + server-side MERGE) with the batch id stored in the same
  * transaction. Three layers give exactly-once, crash-atomically:
  *
  *  1. **Batch-id ledger** — `foreachBatch` is at-least-once; a replayed
  *     batchId (task retry, driver restart on the same checkpoint) is
  *     skipped before any write.
  *  2. **MERGE idempotence** — even a re-delivery under a NEW id (fresh
  *     checkpoint replaying the source) converges: [[UpsertOps.upsertLatest]]
  *     keeps one row per key by (version, incoming-wins) order, so replaying
  *     rows that already won changes nothing.
  *  3. **Versioned data + atomic commit** — each merge writes a NEW
  *     `data-b<id>` directory; the commit marker (written to a temp file,
  *     then ATOMIC_MOVE'd into the ledger) records which directory is
  *     current. A crash mid-parquet-write leaves the previous committed
  *     directory untouched and unreferenced garbage behind; the replay
  *     overwrites the partial directory and commits normally. This is the
  *     file-system analog of the database transaction boundary.
  */
class JdbcShapedSink(tableDir: String, keys: Seq[String], versionCol: String) {

  private val commitsDir = Paths.get(tableDir, "_commits")

  private def committed(batchId: Long): Boolean =
    Files.exists(commitsDir.resolve(batchId.toString))

  /** Ledger markers sorted by batch id, newest last. */
  private def commitMarkers(): Seq[Path] =
    if (!Files.exists(commitsDir)) Seq.empty
    else Files.list(commitsDir).iterator.asScala.toSeq
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .sortBy(_.getFileName.toString.toLong)

  /** The data directory the newest committed marker points at, if any. */
  private def currentDataDir(): Option[Path] =
    commitMarkers().lastOption.map { marker =>
      Paths.get(tableDir, new String(Files.readAllBytes(marker), "UTF-8").trim)
    }.filter(Files.exists(_))

  /** Current table contents ("SELECT * FROM target"). */
  def table(spark: SparkSession): Option[DataFrame] =
    currentDataDir().map(p => spark.read.parquet(p.toString))

  /** The MERGE semantics of one batch against the standing table — override
    * for non-upsert targets (e.g. [[IndexDeltaSink]]'s additive postings
    * merge); the transactional machinery around it is shared. */
  protected def merge(existing: Option[DataFrame], batch: DataFrame): DataFrame =
    existing match {
      case Some(ex) => UpsertOps.upsertLatest(ex, batch, keys, versionCol)
      case None => UpsertOps.upsertLatest(
        batch.filter(org.apache.spark.sql.functions.lit(false)), batch, keys, versionCol)
    }

  /** The foreachBatch body: skip-if-committed, MERGE into a fresh versioned
    * directory, atomically commit the marker that names it.
    * Pass as `.writeStream.foreachBatch(sink.writeBatch _)`. */
  def writeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (committed(batchId)) return
    val spark = batch.sparkSession
    val previous = currentDataDir()
    val merged = merge(table(spark), batch)
    // materialize before writing — the plan still reads the previous dir
    val rows = merged.localCheckpoint()
    val newDirName = s"data-b$batchId"
    // overwrite: a crashed previous attempt at this id may have left a
    // partial directory; nothing committed references it yet
    rows.write.mode("overwrite").parquet(s"$tableDir/$newDirName")
    // commit point: temp file + atomic rename publishes data path and
    // batch id in one step
    Files.createDirectories(commitsDir)
    val tmp = Files.createTempFile(commitsDir, s".pending-$batchId-", "")
    Files.write(tmp, newDirName.getBytes("UTF-8"))
    Files.move(tmp, commitsDir.resolve(batchId.toString),
      StandardCopyOption.ATOMIC_MOVE)
    // the superseded directory is now unreferenced; reclaim best-effort
    previous.filter(_.getFileName.toString != newDirName).foreach(deleteQuietly)
  }

  private def deleteQuietly(dir: Path): Unit =
    try {
      if (Files.exists(dir))
        Files.walk(dir).iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } catch { case _: Throwable => }
}
