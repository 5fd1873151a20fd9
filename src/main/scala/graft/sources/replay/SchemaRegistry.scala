package graft.sources.replay

import java.io.IOException
import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper

/** Confluent-style schema registry: the fetch-by-id read path the s55
  * envelope decode dispatches on (`GET /schemas/ids/{id}` →
  * `{"schema":"<json-escaped avro schema>"}` — the public wire contract of
  * the Confluent Schema Registry REST API, the registry the frame's int32
  * id points into).
  *
  * [[SchemaRegistry.Client]] is a real HTTP client (java.net.http over a
  * real socket) with an id→schema cache: ids are immutable in the registry
  * data model, so a hit never revalidates — the production call pattern is
  * ONE driver-side fetch per distinct id per plan, after which the schema
  * text travels to executors inside the serialized decode expression
  * (never an executor→registry call, which would melt the registry at
  * 1000 executors × task granularity).
  *
  * [[SchemaRegistry.Server]] is the in-process double (the KafkaLogServer
  * pattern): a real HTTP server on an ephemeral loopback port serving a
  * fixed id→schema map, with injectable fault ids for the failure paths
  * (malformed JSON body, non-JSON 500). A real registry is env-gated the
  * same way the live-broker test is: point `GRAFT_SCHEMA_REGISTRY_URL` at
  * it and the double never starts.
  *
  * The reference declares the avro surface without exercising it
  * (`Cargo.toml:7`); the registry fetch is the missing last mile named in
  * VERDICT r11 §missing-3.
  */
object SchemaRegistry {

  private val mapper = new ObjectMapper

  /** Minimal registry double. `malformedIds` answer 200 with a non-JSON
    * body; `brokenIds` answer 500 with a non-JSON body — the two failure
    * shapes a client must surface loudly rather than misparse. */
  final class Server(schemas: Map[Int, String],
      malformedIds: Set[Int] = Set.empty,
      brokenIds: Set[Int] = Set.empty) extends AutoCloseable {

    /** Total requests served — lets specs pin the client's cache behavior
      * (second lookup of an id must not produce a second request). */
    val requests = new AtomicLong(0)

    private val http =
      com.sun.net.httpserver.HttpServer.create(
        new InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/schemas/ids/", { exchange =>
      requests.incrementAndGet()
      val id = exchange.getRequestURI.getPath
        .stripPrefix("/schemas/ids/").takeWhile(_ != '/')
      def reply(status: Int, body: String, json: Boolean = true): Unit = {
        val b = body.getBytes(UTF_8)
        exchange.getResponseHeaders.add("Content-Type",
          if (json) "application/vnd.schemaregistry.v1+json" else "text/plain")
        exchange.sendResponseHeaders(status, b.length)
        exchange.getResponseBody.write(b)
        exchange.close()
      }
      id.toIntOption match {
        case Some(i) if malformedIds(i) => reply(200, "not json {{{", json = false)
        case Some(i) if brokenIds(i) => reply(500, "registry exploded", json = false)
        case Some(i) if schemas.contains(i) =>
          val node = mapper.createObjectNode()
          node.put("schema", schemas(i))
          reply(200, mapper.writeValueAsString(node))
        case _ =>
          // the registry's public not-found shape: error_code 40403
          reply(404, """{"error_code":40403,"message":"Schema not found"}""")
      }
    })
    http.start()

    def url: String = s"http://127.0.0.1:${http.getAddress.getPort}"
    override def close(): Unit = http.stop(0)
  }

  /** Fetch-by-id client. Every failure is LOUD and named (the s55 bad-magic
    * philosophy: never a silent misparse): unknown id carries the
    * registry's error_code, a malformed body says so with a prefix of what
    * arrived. */
  final class Client(baseUrl: String) {
    private val cache = TrieMap.empty[Int, String]
    private val http = HttpClient.newHttpClient()

    /** The avro schema JSON registered under `id` (cached: registry ids are
      * immutable, so one fetch per id per process). */
    def schemaById(id: Int): String = cache.getOrElseUpdate(id, fetch(id))

    private def fetch(id: Int): String = {
      val req = HttpRequest.newBuilder(
          java.net.URI.create(s"${baseUrl.stripSuffix("/")}/schemas/ids/$id"))
        .header("Accept", "application/vnd.schemaregistry.v1+json")
        .GET().build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      val body = resp.body()
      if (resp.statusCode() != 200) {
        // surface the registry's own error envelope when it parses
        val detail = try {
          val n = mapper.readTree(body)
          s"error_code ${n.get("error_code").asInt()}: ${n.get("message").asText()}"
        } catch { case _: Exception => s"non-JSON body: ${body.take(120)}" }
        throw new IOException(
          s"schema registry: id $id -> HTTP ${resp.statusCode()} ($detail)")
      }
      val schema = try {
        val n = mapper.readTree(body).get("schema")
        if (n == null || !n.isTextual)
          throw new IOException("no textual 'schema' field")
        n.asText()
      } catch {
        case e: IOException if e.getMessage == "no textual 'schema' field" =>
          throw new IOException(s"schema registry: id $id -> 200 but the " +
            s"response has no textual 'schema' field: ${body.take(120)}")
        case _: Exception =>
          throw new IOException(s"schema registry: id $id -> 200 but the " +
            s"body is not JSON: ${body.take(120)}")
      }
      // parse-validate with Avro itself before letting the schema near a
      // decode expression — a registry serving truncated JSON fails HERE,
      // at the fetch, with the registry named, not deep in Catalyst
      try new org.apache.avro.Schema.Parser().parse(schema)
      catch {
        case e: Exception => throw new IOException(
          s"schema registry: id $id returned an invalid avro schema " +
            s"(${e.getMessage}): ${schema.take(120)}")
      }
      schema
    }
  }
}
