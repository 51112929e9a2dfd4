package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout — Z-order (Morton) clustering, the
  * OPTIMIZE-ZORDER answer to "queries filter on BOTH x and y, but a
  * sort can only privilege one": interleaving the bits of the two
  * dimensions' quantized ranks gives a 1-D sort key whose prefix
  * ranges are 2-D tiles, so per-file min/max parquet stats stay tight
  * on EVERY interleaved dimension and scans skip files for predicates
  * on either. All arithmetic is integer (quantize by exact floor
  * division against data-derived bounds, interleave by shift/mask), so
  * the DuckDB oracle replays layout assignment bit-for-bit.
  */
object Layout {

  /** Morton interleave of two quantized values in [0, 2^bits):
    * bit i of x lands at 2i, bit i of y at 2i+1. Pure shift/mask
    * composition — codegen'd end-to-end, no UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as DuckDB SQL over columns named `x`/`y` —
    * the oracle-side contract of [[zValue]]. */
  def zValueSql(bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"(((xq >> $i) & 1) << ${2 * i})",
      s"(((yq >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Assign every row its Z-order `file_id`: quantize both dimensions
    * to `bits`-bit ranks against their EXACT data min/max
    * (vq = (v − min)·2^bits ÷ (max − min + 1), floor division — one
    * scalar aggregate broadcast back, the weightedSample shape), then
    * take the top `fileBits` bits of the interleaved z-value. Fixed
    * z-PREFIX binning on purpose: file boundaries are fixed 2-D tiles
    * independent of row order and of any sampling, so assignment is
    * deterministic (oracle-replayable) and needs NO global sort — at
    * fleet scale the write is `partitionBy(file_id)` + a LOCAL
    * per-file sort on `z`, one hash exchange total, where rank-based
    * binning (equal-size files) would need a full range sort of the
    * corpus. The tradeoff is skewed file sizes under skewed data —
    * acceptable for layout because tiles, not row counts, drive
    * min/max skipping. Output: input + (xq, yq, z, file_id). */
  def zOrderLayout(df: DataFrame, x: Column, y: Column,
                   bits: Int = 16, fileBits: Int = 6): DataFrame = {
    require(fileBits >= 1 && fileBits <= 2 * bits, "bad fileBits")
    val b = df.agg(min(x).cast("long").as("__xmin"),
      max(x).cast("long").as("__xmax"),
      min(y).cast("long").as("__ymin"), max(y).cast("long").as("__ymax"))
    val side = 1L << bits
    val quant = df.crossJoin(broadcast(b))
      .withColumn("xq", call_function("div",
        (x.cast("long") - col("__xmin")) * side,
        col("__xmax") - col("__xmin") + 1))
      .withColumn("yq", call_function("div",
        (y.cast("long") - col("__ymin")) * side,
        col("__ymax") - col("__ymin") + 1))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
    quant.withColumn("z", zValue(col("xq"), col("yq"), bits))
      .withColumn("file_id", shiftright(col("z"), 2 * bits - fileBits))
  }

  /** Equi-depth range-shard assignment WITHOUT a global sort or
    * sampling — the deterministic replacement for
    * `repartitionByRange`, whose reservoir-sampled boundaries change
    * run to run (useless for an oracle-graded layout or reproducible
    * shard manifests). Boundaries come from the mergeable histogram
    * sketch ([[Ops.histogramQuantiles]]): one (bin)-keyed count with
    * map-side combine, quantiles at k/shards for k = 1..shards−1,
    * every step exact integer arithmetic. The shards−1 bounds (one
    * human-sized row) visit the driver and come back as a literal
    * array probed by the codegen'd upper-bound binary search
    * ([[graft.functions.SearchSortedExpr]]): shard = #bounds ≤ v.
    * Shard populations are equal up to one histogram bin's population
    * per boundary (the sketch's contract); a fleet write is
    * partitionBy(shard) + local sort = a globally range-ordered table
    * with ONE hash exchange. Skewed values repeat bounds and leave
    * shards empty rather than failing. Output: input + `shard`
    * (0-based int). `valueCents` must be integer cents in
    * [loC, hiC); (hiC − loC) must divide evenly by nBins. */
  def rangeShards(df: DataFrame, valueCents: Column, loC: Long, hiC: Long,
                  nBins: Int, shards: Int, out: String = "shard"): DataFrame = {
    require(shards >= 2, "need shards >= 2")
    val qs = (1 until shards).map(i => (s"b$i", i.toLong, shards.toLong))
    val hist = Ops.histogramQuantiles(
      df.select(valueCents.as("__vc"), lit(0).as("__g")),
      Seq(col("__g")), col("__vc"), loC, hiC, nBins, qs)
    val row = hist.collect().head
    val bounds = (1 until shards)
      .map(i => row.getAs[Long](s"q_b${i}_c").toDouble).toArray
    graft.functions.SearchSortedExpr.register(df.sparkSession)
    df.withColumn(out, call_function(graft.functions.SearchSortedExpr.Name,
      lit(bounds), valueCents.cast("double")))
  }

  /** Per-file skipping stats of a [[zOrderLayout]] assignment — the
    * min/max footer ranges a parquet scan would prune against. */
  def zOrderStats(df: DataFrame, x: Column, y: Column,
                  bits: Int = 16, fileBits: Int = 6): DataFrame =
    zOrderLayout(df, x, y, bits, fileBits)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(x).as("min_x"), max(x).as("max_x"),
        min(y).as("min_y"), max(y).as("max_y"))
}
