package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB table: multi-dimensional
  * clustering (Z-order) and small-file compaction. Neither changes query
  * results — they change WHICH parquet files/row groups a predicate has to
  * read, which at 100 TB is the difference between scanning a shard and
  * scanning the table.
  */
object LayoutOps {

  /** Morton (Z-curve) value: interleave the low `bits` bits of each column
    * (x₀y₀x₁y₁…). Rows close on the curve are close in EVERY dimension, so
    * sorting a file layout by z gives parquet min/max stats locality on all
    * participating columns at once — a single-column sort only skips on that
    * one column. Pure integer shifts/masks: deterministic in any engine.
    * Total bits (bits × cols) must stay ≤ 63. */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"z-value needs ${bits}x${cols.size} interleaved bits <= 63")
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * cols.size + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB-portable SQL for the same interleave (the oracle side). */
  def zvalueSql(cols: Seq[String], bits: Int): String =
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        s"((($c >> $b) & 1) << ${b * cols.size + i})"
      }
    }.mkString(" | ")

  /** Write `df` clustered on the Z-curve of `zCols`: range-partition by the
    * z-value (so each output file owns a contiguous curve segment), sort
    * within partitions (so row groups inside a file are tight too), drop the
    * helper column at the write boundary. A predicate box on ANY subset of
    * the z columns then touches the few files whose curve segment crosses
    * the box — file/row-group pruning in every dimension, not just the
    * leading sort column. */
  def zorderWrite(df: DataFrame, zCols: Seq[String], bits: Int,
      numFiles: Int, outDir: String): Unit =
    df.withColumn("__z", zvalue(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Per-file [min,max] of an INT64 parquet column, read from FOOTER
    * statistics only — no data pages touched. This is the real
    * data-skipping build path (what an Iceberg/Delta manifest stores): the
    * index costs one footer read per file, not a scan, so rebuilding it
    * after a layout write is O(files) regardless of table bytes. Returns
    * (path, min, max) per file; files whose footer lacks stats for the
    * column are returned as unbounded (Long.Min/Max) so pruning NEVER
    * drops a file it can't prove empty — skipping stays lossless. */
  def footerRangeIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      column: String): Seq[(String, Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    fs.listStatus(path).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val ranges = reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == column)
              .map { c =>
                val st = c.getStatistics
                if (st == null || !st.hasNonNullValue)
                  (Long.MinValue, Long.MaxValue)
                else (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
              }
          }
          if (ranges.isEmpty) (f.getPath.toString, Long.MinValue, Long.MaxValue)
          else (f.getPath.toString, ranges.map(_._1).min, ranges.map(_._2).max)
        } finally reader.close()
      }
  }

  /** Files whose [min,max] intersects [lo,hi] — the candidate set a range
    * predicate actually has to read. */
  def pruneByRange(index: Seq[(String, Long, Long)], lo: Long,
      hi: Long): Seq[String] =
    index.collect { case (p, mn, mx) if mx >= lo && mn <= hi => p }

  /** Compact a small-files directory to ~`targetFileBytes` files: the
    * standard nightly hygiene pass — a streaming sink or per-batch upsert
    * leaves thousands of KB-sized files whose open/footer overhead dominates
    * scans. Coalesce (no shuffle) to ceil(totalBytes / target) files and
    * rewrite. Returns (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFileBytes: Long, tmpSuffix: String = "__compact_tmp"): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(path)
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = dir + tmpSuffix
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp)
    // swap atomically-enough for a dev-tool pass (a production pass writes
    // to a versioned location and flips a manifest, JdbcShapedSink-style)
    fs.delete(path, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), path)
    (before.length, parquetFiles().length)
  }
}
