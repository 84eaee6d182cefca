package graft.sources

import scala.collection.concurrent.TrieMap

/** Driver-side Confluent schema-registry client with a per-id cache,
  * mirroring `/root/reference/src/kafka_source.py:153-161` (fetch-once,
  * cache for process lifetime). Resolution happens at PLAN BUILD on the
  * driver; executors only ever see the resolved schema JSON inside the
  * decode closure — at 1000 executors that is zero registry traffic from
  * the cluster (SURVEY §7.4(6)).
  *
  * The transport is pluggable so tests (and this zero-egress build env)
  * inject a map-backed registry; the HTTP transport implements the public
  * `GET /schemas/ids/{id}` contract with optional basic auth.
  */
trait SchemaRegistry {
  def schemaJson(id: Int): String
}

final class CachingSchemaRegistry(fetch: Int => String) extends SchemaRegistry {
  private val cache = TrieMap.empty[Int, String]
  override def schemaJson(id: Int): String = cache.getOrElseUpdate(id, fetch(id))
}

object SchemaRegistry {

  /** Test/offline registry backed by a fixed map. */
  def fixed(schemas: Map[Int, String]): SchemaRegistry =
    new CachingSchemaRegistry(id =>
      schemas.getOrElse(id, throw new NoSuchElementException(s"schema id $id not registered")))

  /** HTTP registry speaking the Confluent REST contract
    * (`GET {base}/schemas/ids/{id}` → `{"schema": "..."}`), basic auth via
    * userinfo in the URL like the reference
    * (`/root/reference/src/kafka_source.py:153-159`).
    */
  def http(baseUrl: String): SchemaRegistry = new CachingSchemaRegistry(id => {
    val url = new java.net.URI(s"$baseUrl/schemas/ids/$id").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    Option(url.getUserInfo).foreach { ui =>
      val token = java.util.Base64.getEncoder.encodeToString(ui.getBytes("UTF-8"))
      conn.setRequestProperty("Authorization", s"Basic $token")
    }
    conn.setRequestProperty("Accept", "application/vnd.schemaregistry.v1+json")
    val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    conn.disconnect()
    // Minimal JSON field extraction: {"schema": "<escaped>"} — avoid a JSON
    // dependency; the schema value is a JSON-escaped string.
    val m = """"schema"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalStateException(s"no schema field in registry response for id $id"))
    org.apache.commons.text.StringEscapeUtils.unescapeJson(m.group(1))
  })
}
