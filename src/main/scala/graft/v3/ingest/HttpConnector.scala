package graft.v3.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.v3.Schemas

/** Driver-side HTTP warehouse [[Connector]] (S5) — the analog of the
  * reference's Allium explorer-API connector
  * (reference v3/helpers/connectors/allium.py:283–322): each templated
  * SQL query is POSTed as `{"query_text": q}` with an `X-API-Key`
  * header, the JSON response's `data` array of row objects becomes a
  * DataFrame, warehouse column names are renamed onto the lake's
  * (`tick_spacing`→`tickSpacing`, `sqrt_price_x96`→`sqrtPriceX96`,
  * allium.py:306–312), `block_timestamp` strings parse as UTC
  * timestamps (allium.py:314–318), and a response at the API's page
  * cap raises instead of silently truncating (allium.py:320–321) —
  * the ingest loop's segmenting keeps pulls under the cap.
  *
  * The fetch itself is deliberately driver-side, like the reference:
  * an explorer API is a paged JSON endpoint, not a parallel scan
  * surface. Scale comes from the surrounding loop — segment-capped
  * pulls land in the partitioned lake, where every downstream read is
  * distributed. For warehouses that speak JDBC, [[JdbcConnector]] is
  * the executor-parallel path.
  */
class HttpConnector(spark: SparkSession, endpoint: String, apiKey: String,
                    tableName: String => String = identity,
                    poolScoped: Boolean = false,
                    maxRows: Int = 200000,
                    timeout: Duration = Duration.ofSeconds(240))
    extends Connector {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def sqlLit(v: String): String = "'" + v.replace("'", "''") + "'"

  private def scopeWhere(table: String, pool: String, chain: String): String = {
    val base = s"chain_name = ${sqlLit(chain)}"
    if (poolScoped && (table == Schemas.PoolSwapEvents ||
        table == Schemas.PoolMintBurnEvents))
      s"$base AND address = ${sqlLit(pool)}"
    else base
  }

  /** POST one query, parse `data` rows, rename and return as a frame.
    * Row objects travel driver→executors as JSON lines; Spark infers
    * the transport schema and [[normalize]] pins the lake one. */
  private[ingest] def execute(q: String): DataFrame = {
    val body = mapper.createObjectNode()
    body.put("query_text", q)
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .header("X-API-Key", apiKey)
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from $endpoint: ${resp.body().take(200)}")
    val data = mapper.readTree(resp.body()).get("data")
    if (data == null || !data.isArray || data.size() == 0)
      return spark.emptyDataFrame
    if (data.size() >= maxRows)
      throw new IllegalStateException(
        s"HttpConnector: fetched ${data.size()} rows ≥ cap $maxRows — " +
          "lower the segment target (the API truncates beyond its page cap)")
    val lines = (0 until data.size()).map(i => mapper.writeValueAsString(data.get(i)))
    import spark.implicits._
    val df = spark.read.json(spark.createDataset(lines))
    Seq("tick_spacing" -> "tickSpacing", "sqrt_price_x96" -> "sqrtPriceX96")
      .foldLeft(df) { case (d, (from, to)) =>
        if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
      }
  }

  /** Cast onto the pinned lake schema; columns the JSON transport
    * dropped (all-null → omitted) come back as typed nulls. String
    * `block_timestamp` values cast to TIMESTAMP under the session's
    * UTC zone — the reference's `str.to_datetime` + UTC pin. */
  private def normalize(df: DataFrame, table: String): DataFrame = {
    val present = df.columns.toSet
    df.select(Schemas.forTable(table).fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  override def minMaxBlock(table: String, pool: String,
                           chain: String): Option[(Long, Long)] = {
    val q = s"""SELECT min(block_number) AS mn, max(block_number) AS mx
               |FROM ${tableName(table)}
               |WHERE ${scopeWhere(table, pool, chain)}""".stripMargin
    val df = execute(q)
    // empty scope: the aggregate row's nulls are dropped from the JSON
    // objects, so the columns themselves may be missing
    if (df.isEmpty || !df.columns.contains("mn")) None
    else {
      val r = df.select(col("mn").cast("long"), col("mx").cast("long")).first()
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }
  }

  override def findSegment(table: String, maxBlock: Long, minBlock: Long,
                           pool: String, chain: String,
                           tgtMaxRows: Long): Long = {
    // remote aggregates to per-block counts (tiny result set); the
    // running total + cap is computed Spark-side, same as the other
    // connectors — reference data_update.py:93–104
    val q = s"""SELECT block_number, count(*) AS n
               |FROM ${tableName(table)}
               |WHERE ${scopeWhere(table, pool, chain)}
               |  AND block_number >= $minBlock AND block_number <= $maxBlock
               |GROUP BY block_number""".stripMargin
    val counts = execute(q)
    if (counts.isEmpty) return minBlock
    val cum = counts
      .select(col("block_number").cast("long").as("block_number"),
        col("n").cast("long").as("n"))
      .withColumn("cum",
        sum(col("n")).over(Window.orderBy(col("block_number"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val r = cum.filter(col("cum") <= tgtMaxRows)
      .agg(max(col("block_number"))).first()
    if (r.isNullAt(0)) minBlock else math.max(r.getLong(0), minBlock)
  }

  override def read(table: String, maxBlock: Long, minBlock: Long,
                    pool: String, chain: String): DataFrame = {
    val q = s"""SELECT * FROM ${tableName(table)}
               |WHERE ${scopeWhere(table, pool, chain)}
               |  AND block_number >= $minBlock AND block_number <= $maxBlock""".stripMargin
    normalize(execute(q), table)
  }
}
