package graft.streaming

import java.sql.{Connection, DriverManager, SQLException}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's RDBMS persistence path (database.py:30-212) against a
  * REAL JDBC endpoint — where [[JdbcShapedSink]] reproduces the MERGE/ledger
  * shape on the filesystem (no-RDBMS sandbox), this sink speaks actual SQL
  * over JDBC and is spec-proven against in-JVM embedded Derby (ships with
  * the Spark distribution, zero network). The three reference behaviors:
  *
  *  - **Idempotent DDL** (database.py:39-104, `create_tables_if_not_exist`):
  *    [[ensureTables]] issues `CREATE TABLE` and swallows Derby/standard
  *    "object already exists" — the target carries a PRIMARY KEY on the
  *    business key exactly like the reference's unique constraints.
  *  - **Keyed upsert** (database.py:106-158 probe+insert): per micro-batch,
  *    within-batch dedup to one row per key (Spark window, distributed),
  *    executor-parallel `INSERT` into a staging table
  *    (`df.write.jdbc(append)` — the only part that touches data volume,
  *    and it scales out), then ONE server-side `MERGE INTO target USING
  *    staging` on the driver. Incoming wins version ties, matching
  *    [[graft.ops.UpsertOps.upsertLatest]].
  *  - **Dup-tolerant append** (database.py:160-212, per-row rollback on
  *    duplicates): [[appendIgnoreDupes]] inserts staging rows whose UNIQUE
  *    tuple is absent (NOT EXISTS on the declared constraint subset) in one
  *    set-based statement — the semantics of the reference's row-at-a-time
  *    try/except, without paying a round-trip per row.
  *
  * Exactly-once under foreachBatch's at-least-once replay: a `_ledger`
  * table keyed by batch id is written IN THE SAME TRANSACTION as the MERGE.
  * A replayed id short-circuits before staging; staging rows are tagged
  * with a per-ATTEMPT id and the MERGE reads only its own attempt's rows
  * (r10 — a shared-truncate staging let a concurrent committer of the same
  * id wipe the other's staged rows OUTSIDE the commit transaction, so the
  * ledger could record a batch whose MERGE had seen an empty staging:
  * silent loss). A crash after staging but before commit leaves target and
  * ledger untouched; the orphaned attempt rows are swept inside LATER
  * commit transactions (`__batch IN (ledger)` — committed batches' leftovers
  * die the moment their id is ledgered). A concurrent committer of the same
  * id loses the ledger PK race and rolls back ITS OWN merge; the winner's
  * merge only ever read the winner's complete attempt. This is the pattern
  * the JdbcShapedSink scaladoc promises "against a real database" — here it
  * is, runnable.
  *
  * Scale note: embedded Derby is the test double; against a networked
  * RDBMS the identical SQL runs with executors streaming partitions into
  * staging concurrently — the driver never holds rows, only statements.
  */
class JdbcUpsertSink(url: String, table: String, keys: Seq[String],
    versionCol: String, stringWidth: Int = 32672) {

  private val staging = s"${table}_staging"
  private val ledger = s"${table}_ledger"
  private val props = new Properties()

  /** Every generated statement quotes identifiers (exact case) — unusual
    * table/column names (reserved words, mixed case, spaces) must not break
    * the SQL we synthesize. Spark's own JDBC reader/writer gets the quoted
    * name too, so both sides agree on the stored exact-case identifier. */
  private def q(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement()
    try st.execute(sql) finally st.close()
  }

  /** Best-effort CREATE: swallow "already exists" (Derby X0Y32 / standard
    * 42S01-family) — the reference's CREATE IF NOT EXISTS emulation for
    * engines without the clause (database.py:39-104). */
  private def createQuietly(c: Connection, ddl: String): Unit =
    try exec(c, ddl)
    catch {
      case e: SQLException
        if e.getSQLState == "X0Y32" || e.getSQLState == "42S01" => ()
    }

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    // width is a constructor knob (default: Derby's VARCHAR ceiling) — the
    // r08 hardcoded 500 made any longer payload fail the staging insert
    case _ => s"VARCHAR($stringWidth)"
  }

  /** Idempotent DDL for target (PK on the business key), staging (with the
    * attempt/batch tag columns — see the class doc's race note), ledger. */
  def ensureTables(schema: StructType): Unit = withConn { c =>
    val cols = schema.fields
      .map(f => s"${q(f.name)} ${sqlType(f.dataType)}").mkString(", ")
    createQuietly(c,
      s"CREATE TABLE ${q(table)} ($cols, PRIMARY KEY (${keys.map(q).mkString(", ")}))")
    createQuietly(c,
      s"CREATE TABLE ${q(staging)} ($cols, ${q("__attempt")} VARCHAR(40), ${q("__batch")} BIGINT)")
    createQuietly(c,
      s"CREATE TABLE ${q(ledger)} (batch_id BIGINT NOT NULL PRIMARY KEY)")
  }

  private def committed(c: Connection, batchId: Long): Boolean = {
    val st = c.prepareStatement(s"SELECT 1 FROM ${q(ledger)} WHERE batch_id = ?")
    try { st.setLong(1, batchId); st.executeQuery().next() }
    finally st.close()
  }

  /** One row per key within the batch (MERGE rejects duplicate source
    * matches): highest version wins — the incoming-latest contract of
    * UpsertOps.upsertLatest, computed distributed before any JDBC I/O.
    * Same-key same-version rows tie-break on a full-row content hash, so a
    * checkpoint-loss re-delivery of the identical batch under a new batch
    * id elects the SAME winner and the >=-version MERGE stays idempotent
    * (version-only ordering left the winner to partition luck). */
  private def dedupe(batch: DataFrame): DataFrame =
    graft.ops.UpsertOps.latestPerKey(batch, keys,
      Seq(col(versionCol).desc, xxhash64(batch.columns.map(col): _*).desc))

  private def mergeSql(cols: Seq[String], attempt: String): String = {
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val nonKeys = cols.filterNot(keys.contains)
    val sets = nonKeys.map(n => s"t.${q(n)} = s.${q(n)}").mkString(", ")
    val ins = cols.map(q).mkString(", ")
    val sel = cols.map(q).mkString(", ")
    val vals = cols.map(n => s"s.${q(n)}").mkString(", ")
    // only THIS attempt's rows take part: the attempt predicate sits in the
    // ON clause (so a concurrent attempt's same-key row can never MATCH a
    // target row and trip the MERGE cardinality check) and again on the
    // NOT MATCHED action (whose ON-false rows include every other
    // attempt's). Derby's MERGE source must be a base table, so the slice
    // cannot be a USING subquery.
    s"""MERGE INTO ${q(table)} t USING ${q(staging)} s
       |  ON ($on AND s.${q("__attempt")} = '$attempt')
       |WHEN MATCHED AND s.${q(versionCol)} >= t.${q(versionCol)}
       |  THEN UPDATE SET $sets
       |WHEN NOT MATCHED AND s.${q("__attempt")} = '$attempt'
       |  THEN INSERT ($ins) VALUES ($vals)""".stripMargin
  }

  /** The foreachBatch body: skip-if-committed, stage (executor-parallel,
    * attempt-tagged), MERGE + staging sweep + ledger row in one driver
    * transaction. Pass as `.writeStream.foreachBatch(sink.writeBatch _)`. */
  def writeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    ensureTables(batch.schema)
    if (withConn(committed(_, batchId))) return
    val cols = batch.schema.fieldNames.toSeq
    val attempt = java.util.UUID.randomUUID().toString
    dedupe(batch)
      .withColumn("__attempt", lit(attempt))
      .withColumn("__batch", lit(batchId))
      .write.mode("append").jdbc(url, q(staging), props)
    withConn { c =>
      c.setAutoCommit(false)
      try {
        exec(c, mergeSql(cols, attempt))
        // sweep our own attempt plus any orphan rows of already-committed
        // batches (crashed attempts of THIS batch are swept by the next
        // batch's transaction, once this id is ledgered)
        exec(c, s"""DELETE FROM ${q(staging)} WHERE ${q("__attempt")} = '$attempt'
                   |  OR ${q("__batch")} IN (SELECT batch_id FROM ${q(ledger)})""".stripMargin)
        try exec(c, s"INSERT INTO ${q(ledger)} VALUES ($batchId)")
        catch {
          case e: SQLException if e.getSQLState == "23505" =>
            // another committer won the id race — their MERGE already
            // converged the target; ours must not double-commit
            c.rollback(); return
        }
        c.commit()
      } catch { case t: Throwable => c.rollback(); throw t }
    }
  }

  /** Dup-tolerant append (database.py:160-212, the Skills fact path): add
    * rows whose unique tuple is not already present, set-based — one
    * statement instead of the reference's per-row insert + rollback.
    *
    * `uniqueCols` mirrors the reference's UNIQUE constraint column subset
    * (UC_JobSkill is UNIQUE (JobID, Source, SkillName), database.py:80-88
    * — NOT all content columns: a row differing only in SkillCategory is
    * rejected there). Defaults to the full tuple, the safe generalization
    * when no constraint subset is declared. Within-batch conflicts on the
    * unique tuple elect a deterministic winner (lowest content hash), so
    * replays insert the same row. */
  def appendIgnoreDupes(batch: DataFrame,
      uniqueCols: Seq[String] = Seq.empty): Unit = synchronized {
    val uc = if (uniqueCols.nonEmpty) uniqueCols
      else batch.schema.fieldNames.toSeq
    ensureTablesNoKey(batch.schema)
    val attempt = java.util.UUID.randomUUID().toString
    // lowest content hash wins (the documented contract — kept asc while
    // the upsert path uses desc; both now run through the ONE shared
    // latestPerKey primitive)
    val deduped = graft.ops.UpsertOps.latestPerKey(batch, uc,
      Seq(xxhash64(batch.columns.map(col): _*).asc))
    deduped.withColumn("__attempt", lit(attempt))
      .write.mode("append").jdbc(url, q(staging), props)
    val cols = batch.schema.fieldNames.toSeq.map(q).mkString(", ")
    val onUc = uc.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    withConn { c =>
      // SERIALIZABLE: the reference enforces its unique tuple with a DB
      // constraint (UC_JobSkill); this set-based emulation's NOT EXISTS is
      // a snapshot read, so two concurrent appenders under READ_COMMITTED
      // could both pass it and double-insert (r10 review). Serializable
      // makes the second transaction's check see the first's commit.
      c.setTransactionIsolation(Connection.TRANSACTION_SERIALIZABLE)
      c.setAutoCommit(false)
      try {
        exec(c, s"""INSERT INTO ${q(table)} ($cols)
                   |SELECT $cols FROM ${q(staging)} s
                   |WHERE s.${q("__attempt")} = '$attempt' AND NOT EXISTS
                   |  (SELECT 1 FROM ${q(table)} t WHERE $onUc)""".stripMargin)
        exec(c, s"DELETE FROM ${q(staging)} WHERE ${q("__attempt")} = '$attempt'")
        c.commit()
      } catch { case t: Throwable => c.rollback(); throw t }
    }
  }

  /** DDL variant without a primary key — the unique-tuple check runs in
    * [[appendIgnoreDupes]]'s INSERT itself (NOT EXISTS on the declared
    * unique subset under SERIALIZABLE isolation), so the table needs no
    * constraint of its own; staging carries the attempt tag. */
  def ensureTablesNoKey(schema: StructType): Unit = withConn { c =>
    val cols = schema.fields
      .map(f => s"${q(f.name)} ${sqlType(f.dataType)}").mkString(", ")
    createQuietly(c, s"CREATE TABLE ${q(table)} ($cols)")
    createQuietly(c, s"CREATE TABLE ${q(staging)} ($cols, ${q("__attempt")} VARCHAR(40))")
  }

  /** Current table contents ("SELECT * FROM target") — read back through
    * Spark's JDBC source, partition-parallel against a real server. */
  def table(spark: SparkSession): DataFrame =
    spark.read.jdbc(url, q(table), props)
}
