package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing — the co-located-join lever at lake scale.
  *
  * Two fact tables bucketed (and optionally sorted) on their join key
  * with the same bucket count join with NO shuffle on either side: the
  * bucketed scan already reports the required hash partitioning, so the
  * sort-merge join's exchanges disappear (proven in BucketingSpec).
  * On a 100 TB lake this converts the recurring cost of the hottest
  * join (e.g. events ⋈ events or swaps ⋈ mint-burns on pool) into a
  * one-time write-side layout choice.
  *
  * Spark requires the metastore path (`saveAsTable`) for bucketing
  * metadata — plain `parquet(path)` writes cannot carry it.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
