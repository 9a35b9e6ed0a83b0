package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Drives the web-service lifecycle end-to-end: start the HTTP server on an
  * ephemeral port, POST the LUBM fixture, assert the JSON verdict payload
  * matches the known-good counts (reference app/__init__.py:20-45). */
class ServiceSpec extends SparkTestBase {

  test("POST /validate returns per-shape verdicts as JSON") {
    val server = Service.makeServer(spark, 0)
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      val form = "schemaDir=src/test/resources/lubm/shapes" +
        "&dataPath=src/test/resources/lubm/LUBM.ttl&maxInstances=10"
      val req = HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/validate"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val body = resp.body()
      assert(body.contains(""""conforms": false"""))
      // known-good LUBM fixture counts (same as the CLI drive): Department 3/0,
      // FullProfessor 2/3, University 1/4
      assert(body.replaceAll("\\s", "").contains(
        """"http://example.org/DepartmentShape":{"targets":3,"valid":3,"violated":0"""))
      assert(body.replaceAll("\\s", "").contains(
        """"http://example.org/FullProfessorShape":{"targets":5,"valid":2,"violated":3"""))
      assert(body.replaceAll("\\s", "").contains(
        """"http://example.org/UniversityShape":{"targets":5,"valid":1,"violated":4"""))

      // bad request: missing params
      val bad = client.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/validate"))
          .POST(HttpRequest.BodyPublishers.ofString("nope=1")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 400)

      val health = client.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() == 200)
    } finally server.stop(0)
  }
}
