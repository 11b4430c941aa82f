package graft.streaming

import java.nio.file.{Files, Paths}

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
  * transaction. Two independent layers give exactly-once:
  *
  *  1. **Batch-id ledger** — `foreachBatch` is at-least-once; a replayed
  *     batchId (task retry, driver restart on the same checkpoint) is
  *     skipped before any write.
  *  2. **MERGE idempotence** — even a re-delivery under a NEW id (fresh
  *     checkpoint replaying the source) converges: [[UpsertOps.upsertLatest]]
  *     keeps one row per key by (version, incoming-wins) order, so replaying
  *     rows that already won changes nothing.
  */
class JdbcShapedSink(tableDir: String, keys: Seq[String], versionCol: String) {

  private val commitsDir = Paths.get(tableDir, "_commits")
  private val dataDir = s"$tableDir/data"

  private def committed(batchId: Long): Boolean =
    Files.exists(commitsDir.resolve(batchId.toString))

  /** Current table contents ("SELECT * FROM target"). */
  def table(spark: SparkSession): Option[DataFrame] =
    if (Files.exists(Paths.get(dataDir))) Some(spark.read.parquet(dataDir))
    else None

  /** The foreachBatch body: skip-if-committed, MERGE, commit the batch id.
    * Pass as `.writeStream.foreachBatch(sink.writeBatch _)`. */
  def writeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (committed(batchId)) return
    val spark = batch.sparkSession
    val merged = table(spark) match {
      case Some(existing) => UpsertOps.upsertLatest(existing, batch, keys, versionCol)
      case None => UpsertOps.upsertLatest(
        batch.filter(org.apache.spark.sql.functions.lit(false)), batch, keys, versionCol)
    }
    // materialize before overwriting the path the plan reads from — the
    // stand-in for the database's transaction boundary
    val rows = merged.localCheckpoint()
    rows.write.mode("overwrite").parquet(dataDir)
    Files.createDirectories(commitsDir)
    Files.createFile(commitsDir.resolve(batchId.toString))
  }
}
