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

  test("HTML surface: GET serves the form, format=html renders the result table") {
    val server = Service.makeServer(spark, 0)
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      // reference GET branch: the input form
      val get = client.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/validate")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 200)
      assert(get.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      assert(get.body().contains("schemaDir") && get.body().contains("<form"))
      // reference POST result table (app/__init__.py:47-92): header columns,
      // color-coded verdict cells, the result-count header line
      val form = "schemaDir=src/test/resources/lubm/shapes" +
        "&dataPath=src/test/resources/lubm/LUBM.ttl&maxInstances=10&format=html"
      val req = HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/validate"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val body = resp.body()
      assert(resp.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      for (h <- Seq("instance", "shape", "validation result", "finished@shape"))
        assert(body.contains(s"<th>$h</th>"), s"missing column $h")
      assert(body.contains("""<td style="color: green">valid</td>"""))
      assert(body.contains("""<td style="color: red">invalid</td>"""))
      assert(body.contains("validation results in"))
      // known-good fixture: 23 targets total, all rendered under maxInstances=10/shape
      val rows = "<td style=\"color: (green|red)\">".r.findAllIn(body).size
      assert(rows == 23, s"expected 23 verdict rows, got $rows")
    } finally server.stop(0)
  }
}
