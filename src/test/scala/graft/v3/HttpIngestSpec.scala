package graft.v3

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.SparkSpec
import graft.v3.ingest.{HttpConnector, Ingest}

/** End-to-end ingest through the HTTP connector (S5) against an
  * in-process `com.sun.net.httpserver` stub of the explorer API: the
  * stub executes each POSTed `query_text` with Spark SQL over seeded
  * temp views and replies `{"data": [...]}` — warehouse-side names
  * (`sqrt_price_x96`) and JSON-string timestamps included, so the
  * connector's renames, UTC parsing, schema normalization, row cap and
  * the full segment-capped ingest loop are all exercised over real
  * HTTP. */
class HttpIngestSpec extends SparkSpec with BeforeAndAfterAll {

  private val Pool = "0xpool1"
  private val Chain = "ethereum"
  private val NBlocks = 12
  private val RowsPerBlock = 5

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var endpoint: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    // remote view with WAREHOUSE column names: sqrt_price_x96 must be
    // renamed by the connector, block_timestamp travels as a JSON
    // string timestamp
    val rows = for {
      b <- 1 to NBlocks; r <- 0 until RowsPerBlock
      addr <- Seq(Pool, "0xother")
    } yield (Chain, addr, new java.sql.Timestamp(1620000000000L + b * 60000L),
      1000L + b, s"0xtx$b-$r-$addr", r.toLong, (-40000 - b).toString,
      (b * 1000L + r).toString, r.toLong)
    rows.toDF("chain_name", "address", "block_timestamp", "block_number",
        "transaction_hash", "log_index", "tick", "sqrt_price_x96",
        "transaction_index")
      .createOrReplaceTempView("pool_swap_events")

    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/run", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val out =
          try {
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            if (ex.getRequestHeaders.getFirst("X-API-Key") != "test-key")
              throw new IllegalArgumentException("bad api key")
            val q = mapper.readTree(body).get("query_text").asText()
            val data = spark.sql(q).toJSON.collect()
            s"""{"data": [${data.mkString(",")}]}"""
          } catch {
            case e: Exception => s"""{"error": "${e.getMessage}"}"""
          }
        val bytes = out.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/run"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def connector(maxRows: Int = 200000) =
    new HttpConnector(spark, endpoint, apiKey = "test-key",
      poolScoped = true, maxRows = maxRows)

  test("discovery and segmenting go over HTTP") {
    val c = connector()
    assert(c.minMaxBlock(Schemas.PoolSwapEvents, Pool, Chain)
      .contains((1001L, 1012L)))
    assert(c.minMaxBlock(Schemas.PoolSwapEvents, Pool, "nochain").isEmpty)
    // 5 pool rows per block, cap 12 → exactly two blocks fit
    assert(c.findSegment(Schemas.PoolSwapEvents, 1012L, 1001L, Pool, Chain,
      tgtMaxRows = 12) == 1002L)
  }

  test("read renames warehouse columns, parses UTC timestamps, pins the schema") {
    val df = connector().read(Schemas.PoolSwapEvents, 1003L, 1001L, Pool, Chain)
    assert(df.schema == Schemas.swaps)
    assert(df.count() == 3 * RowsPerBlock)
    // sqrt_price_x96 → sqrtPriceX96 carried the values across
    assert(df.agg(max(col("sqrtPriceX96").cast("long"))).first().getLong(0)
      == 3004L)
    // the JSON string timestamp landed as the exact UTC instant
    assert(df.agg(min(col("block_timestamp").cast("long"))).first().getLong(0)
      == 1620000000L + 60L)
    // columns the transport never carried are typed nulls, not errors
    assert(df.filter(col("liquidity").isNotNull).count() == 0)
  }

  test("a response at the page cap raises instead of truncating") {
    val e = intercept[IllegalStateException] {
      connector(maxRows = 10)
        .read(Schemas.PoolSwapEvents, 1012L, 1001L, Pool, Chain)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("ingest loop runs end-to-end over HTTP, segment-capped, and resumes") {
    val lake = new Lake(spark, Files.createTempDirectory("graft-http-lake").toString)
    val c = connector()
    val reports = Ingest.updateTables(lake, c, Pool, Chain,
      tables = Seq(Schemas.PoolSwapEvents), tgtMaxRows = 12,
      poolScopedResume = Set(Schemas.PoolSwapEvents))
    val r = reports.head
    assert(r.rows == NBlocks * RowsPerBlock.toLong, r.toString)
    assert(r.segments == NBlocks / 2, r.toString)
    assert(lake.read(Schemas.PoolSwapEvents)
      .filter(col("chain_name") === Chain).count() == NBlocks * RowsPerBlock.toLong)
    // resume: nothing new upstream → no appends
    val again = Ingest.updateTables(lake, c, Pool, Chain,
      tables = Seq(Schemas.PoolSwapEvents), tgtMaxRows = 12,
      poolScopedResume = Set(Schemas.PoolSwapEvents))
    assert(again.head.rows == 0L, again.toString)
  }
}
