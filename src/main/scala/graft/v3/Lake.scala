package graft.v3

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The event lake: one directory per table, parquet inside, partitioned
  * by `chain_name`.
  *
  * The reference models a table as a flat glob of segment files named
  * `{idx}_{minBlock}_{maxBlock}_{table}.parquet` and rescans everything
  * on every read (reference v3/helpers/data_update.py:29–59,
  * v3/state.py:130). Spark-first redesign:
  *
  *  - `chain_name=` hive partitioning → directory-level pruning for the
  *    per-chain filters every reference query starts with (SURVEY.md §4
  *    "file skipping"), and `drop(chain)` becomes a partition delete
  *    instead of the reference's delete-whole-file-if-any-row-matches
  *    footgun (pool_helpers.py:218–231).
  *  - block-range file skipping comes free from parquet min/max column
  *    stats on `block_number`, so the filename index header (S7) is
  *    unnecessary.
  *  - appends are `mode("append")` atomic-enough part files; segment
  *    bookkeeping lives in the ingest loop, not in filenames.
  */
class Lake(spark: SparkSession, val root: String) {

  private def dir(table: String) = s"$root/$table"

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def exists(table: String): Boolean = fs.exists(new Path(dir(table)))

  /** Schema-enforced read; empty (correctly-typed) frame if the table
    * has no data yet. Filters pushed by callers reach the parquet scan
    * (predicate pushdown + partition pruning). */
  def read(table: String): DataFrame = {
    val schema = Schemas.forTable(table)
    if (!exists(table))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .option("basePath", dir(table))
        .parquet(dir(table))
  }

  /** Append one ingested segment. Data is repartitioned by chain before
    * the partitioned write so each chain gets coherent files. */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append")
      .partitionBy("chain_name")
      .parquet(dir(table))

  /** Local resume point: max block currently in the lake for this
    * chain (optionally one pool) — reference data_update.py:163–189. */
  def maxBlock(table: String, chain: String,
               pool: Option[String] = None): Option[Long] = {
    if (!exists(table)) return None
    val base = read(table).filter(col("chain_name") === chain)
    val filtered = pool.fold(base)(p => base.filter(col("address") === p))
    val row = filtered.agg(max(col("block_number"))).first()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** Drop one chain's rows from a table — a partition-directory delete,
    * fixing the reference's whole-file deletion that could take other
    * chains' rows with it (SURVEY.md §7.4 bug list). */
  def dropChain(table: String, chain: String): Boolean = {
    val p = new Path(s"${dir(table)}/chain_name=$chain")
    fs.exists(p) && fs.delete(p, true)
  }

  /** Drop a whole table. */
  def dropTable(table: String): Boolean = {
    val p = new Path(dir(table))
    fs.exists(p) && fs.delete(p, true)
  }
}
