package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Duration, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.catalog.PipeSpec
import graft.dsl.{ChunkGrid, ParamsFilter}

/** Executor-side HTTP fetch. One lazily-built client per JVM; a failed GET
  * throws, which surfaces as a task failure and rides Spark's task retry —
  * the same recovery story as a failed JDBC partition read. */
private[graft] object HttpFetch extends Serializable {
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  def lines(url: String): Iterator[String] = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body().linesIterator.filter(_.nonEmpty)
  }

  def post(url: String, body: String): Unit = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", "application/x-ndjson")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"POST $url -> HTTP ${resp.statusCode()}")
  }
}

/** HTTP API source — the reference's `api` connector fetch
  * (meerschaum/connectors/api/_fetch.py:15, connectors/api/_pipes.py:368-489):
  * a remote instance serves pipe rows as JSON chunks bounded by
  * begin/end.
  *
  * Spark-first shape: the DRIVER only plans chunk windows (never touches
  * row data); each TASK fetches its own window over HTTP and parses it
  * against the declared schema — the API-source analogue of a partitioned
  * JDBC scan. The reference instead pulls every chunk through the driver
  * process into pandas (`_pipes.py:430-470`); at 100 TB the executor-side
  * pull is the difference between a pipeline and a bottleneck.
  *
  * The endpoint contract mirrors the reference API's data route: GET
  * `baseUrl?begin=ISO&end=ISO` returning newline-delimited JSON documents
  * (one per row, half-open bound on the datetime column). Bounds prune
  * server-side; `params` are re-applied locally after parsing so
  * correctness never depends on the server honoring them.
  */
final class ApiSource(baseUrl: String, schema: StructType,
                      chunkMinutes: Long = 1440) extends Source {

  private def fmt(d: LocalDateTime): String = d.toString

  override def fetch(spark: SparkSession, spec: PipeSpec,
                     begin: Option[Any], end: Option[Any],
                     params: Map[String, Any]): DataFrame = {
    val windows: Seq[(String, String)] = (begin, end) match {
      case (Some(b: LocalDateTime), Some(e: LocalDateTime)) =>
        ChunkGrid.bounds(b.toInstant(ZoneOffset.UTC), e.toInstant(ZoneOffset.UTC),
            Duration.ofMinutes(chunkMinutes))
          .map { case (lo, hi) =>
            (fmt(LocalDateTime.ofInstant(lo, ZoneOffset.UTC)),
             fmt(LocalDateTime.ofInstant(hi, ZoneOffset.UTC))) }
      case _ =>
        Seq((begin.collect { case d: LocalDateTime => fmt(d) }.getOrElse(""),
             end.collect { case d: LocalDateTime => fmt(d) }.getOrElse("")))
    }
    val urls = windows.map { case (b, e) => s"$baseUrl?begin=$b&end=$e" }
    import spark.implicits._
    // one task per chunk window: executors pull pages concurrently.
    // An empty window set (begin == end) is a legal no-op fetch.
    val lines: Dataset[String] = spark.createDataset(urls)
      .repartition(math.max(1, urls.size))
      .flatMap(u => HttpFetch.lines(u))(Encoders.STRING)
    var df = lines.select(from_json(col("value"), schema).as("r")).select("r.*")
    if (params.nonEmpty) df = df.where(ParamsFilter.toPredicate(params))
    // bounds RE-APPLY locally like params: correctness never rides on the
    // server honoring them, and non-LocalDateTime bounds (epoch Long axes)
    // never reached the URL at all — without this they would be silently
    // dropped and a bounded fetch would return all history
    spec.columns.datetime.filter(df.columns.contains).foreach { dt =>
      begin.foreach(b => df = df.where(col(dt) >= lit(boundLit(b))))
      end.foreach(e => df = df.where(col(dt) < lit(boundLit(e))))
    }
    df
  }

  /** Bound value in a form comparable to the parsed column (ISO text for
    * datetimes — the ND-JSON axis arrives as a string or timestamp — and
    * the raw number for epoch axes). */
  private def boundLit(b: Any): Any = b match {
    case d: LocalDateTime => java.sql.Timestamp.valueOf(d)
    case other            => other
  }
}

/** In-process ND-JSON instance server (test/demo fixture, JDK HttpServer —
  * the api-connector analogue of [[StressSource]]): serves
  * `GET /data?begin=ISO&end=ISO` with half-open filtering over
  * pre-serialized rows, and collects `POST /data` bodies. Stands in for a
  * remote reference API instance in specs and oracle queries.
  */
object NdjsonServer {
  import java.nio.charset.StandardCharsets.UTF_8

  final class Handle(server: com.sun.net.httpserver.HttpServer, val port: Int) {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def url: String = s"http://127.0.0.1:$port/data"
    def stop(): Unit = server.stop(0)
  }

  /** rows: (epochMicros of the datetime axis, serialized JSON document). */
  def serve(rows: Seq[(Long, String)]): Handle = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val handle = new Handle(server, server.getAddress.getPort)
    server.createContext("/data", (exchange: com.sun.net.httpserver.HttpExchange) =>
      try {
        if (exchange.getRequestMethod == "POST") {
          val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
          body.linesIterator.filter(_.nonEmpty).foreach(handle.received.add)
          exchange.sendResponseHeaders(200, -1)
        } else {
          val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
          val kv = q.split("&").filter(_.contains("=")).map { s =>
            val a = s.split("=", 2); (a(0), a(1)) }.toMap
          def us(key: String): Option[Long] = kv.get(key).filter(_.nonEmpty)
            .map(LocalDateTime.parse(_).toInstant(ZoneOffset.UTC))
            .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
          val lo = us("begin").getOrElse(Long.MinValue)
          val hi = us("end").getOrElse(Long.MaxValue)
          val body = rows.iterator
            .filter(r => r._1 >= lo && r._1 < hi).map(_._2)
            .mkString("\n").getBytes(UTF_8)
          exchange.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length.toLong)
          if (body.nonEmpty) exchange.getResponseBody.write(body)
        }
      } finally exchange.close())
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val t = new Thread(r, "ndjson-server"); t.setDaemon(true); t }))
    server.start()
    handle
  }
}

/** HTTP API sink — the reference's API sync target
  * (meerschaum/connectors/api/_pipes.py:189-368): rows POSTed as JSON
  * chunks. Each partition posts its own batches directly from the executor
  * (`foreachPartition`), so the driver never funnels row data.
  */
object ApiSink {
  def push(df: DataFrame, url: String, batchRows: Int = 10000): Unit =
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchRows).foreach(b => HttpFetch.post(url, b.mkString("\n")))
    }
}
