package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format LLM corpora
  * actually ship in (one JSON object per line, sharded files, a
  * non-trivial fraction of malformed lines at web scale). The read
  * contract is AUDITED, never silent: an explicit schema (schema
  * inference would scan 100 TB twice and is banned here), PERMISSIVE
  * parsing so malformed lines surface as all-null rows instead of
  * killing the job (FAILFAST) or silently vanishing (DROPMALFORMED),
  * and a `__corrupt` marker derived from a required field so the
  * pipeline COUNTS what it could not parse. DuckDB's
  * `read_json(..., ignore_errors=true)` produces the same null row
  * per bad line, which is what makes the source oracle-gradable
  * end to end. */
object Jsonl {

  /** Deterministic sharded JSONL write (overwrite). */
  def write(df: DataFrame, dir: String, shards: Int): Unit =
    df.repartition(shards).write.mode("overwrite").json(dir)

  /** Schema-enforced audited read: `requiredField` must be non-null in
    * every well-formed row (a key/id column); rows where it is null
    * are marked `__corrupt` rather than dropped. */
  def readAudited(spark: SparkSession, dir: String, schema: StructType,
                  requiredField: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(dir)
      .withColumn("__corrupt", col(requiredField).isNull)
}
