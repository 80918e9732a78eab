package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.http.HttpShim
import graft.store.Warehouse

/** End-to-end wire test: drives [[Sentinel]] through the [[HttpShim]] over
  * a real socket, exercising the documented error taxonomy the way the
  * reference's it-suite does (`PostRunsControllerSpec`,
  * `PatchRunIdRunsControllerSpec`, `DeleteRunIdRunsControllerSpec`):
  * upload → stats → patch → download → delete, plus every failure status. */
class SentinelHttpSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-http").toString
  private lazy val sentinel = new Sentinel(spark, root,
    clock = () => Timestamp.valueOf("2024-06-01 12:00:00"))
  private lazy val shim = new HttpShim(sentinel)
  private lazy val port = {
    sentinel.addUser("avg", "avg@test.id", "Abc123", "Abc123", verified = true)
    sentinel.addUser("avg2", "avg2@test.id", "Abc123", "Abc123", verified = true)
    sentinel.addUser("unv", "unv@test.id", "Abc123", "Abc123", verified = false)
    shim.start()
  }
  private lazy val client = HttpClient.newHttpClient()

  private def keyOf(id: String): String =
    sentinel.warehouse.read(Warehouse.Users).filter(col("id") === id)
      .select("activeKey").collect()(0).getString(0)

  private def fixture(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(s"/fixtures/$path").toURI))

  private def req(method: String, pathAndQuery: String, user: String = null,
      body: Array[Byte] = Array.empty,
      key: String = null): HttpResponse[String] = {
    val uri = s"http://127.0.0.1:$port$pathAndQuery" +
      (if (user == null) "" else s"${if (pathAndQuery.contains("?")) "&" else "?"}userId=$user")
    val b = HttpRequest.newBuilder(URI.create(uri))
      .method(method, HttpRequest.BodyPublishers.ofByteArray(body))
    if (user != null)
      b.header("X-Sentinel-Key", if (key == null) keyOf(user) else key)
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Request with HTTP Basic credentials (the PATCH /users route). */
  private def basicReq(method: String, path: String, userPass: String,
      body: Array[Byte] = Array.empty): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, HttpRequest.BodyPublishers.ofByteArray(body))
    if (userPass != null)
      b.header("Authorization", "Basic " +
        java.util.Base64.getEncoder.encodeToString(userPass.getBytes("UTF-8")))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** multipart/form-data body with one file part per (name, filename,
    * bytes) triple — the reference's upload framing. */
  private def multipart(boundary: String,
      parts: (String, String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach { case (name, fileName, bytes) =>
      out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        s"""name="$name"; filename="$fileName"\r\n""" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8"))
      out.write(bytes)
      out.write("\r\n".getBytes("UTF-8"))
    }
    out.write(s"--$boundary--\r\n".getBytes("UTF-8"))
    out.toByteArray
  }

  "the HTTP shim" should "run the full upload→stats→patch→download→delete round-trip" in {
    val maple = fixture("maple/maple_multi_sample_multi_rg.json")

    // auth ladder: no userId → 400; wrong key → 401; unverified → 403
    req("POST", "/runs?pipeline=maple", body = maple).statusCode() shouldBe 400
    req("POST", "/runs?pipeline=maple", "avg", maple, key = "wrong").statusCode() shouldBe 401
    req("POST", "/runs?pipeline=maple", "unv", maple).statusCode() shouldBe 403

    // ingest failures: bad schema → 422 with hints; not JSON → 400;
    // unknown pipeline → 400; no pipeline → 400
    val bad = req("POST", "/runs?pipeline=maple", "avg", fixture("invalid.json"))
    bad.statusCode() shouldBe 422
    bad.body() should include("hints")
    req("POST", "/runs?pipeline=maple", "avg", fixture("not.json")).statusCode() shouldBe 400
    req("POST", "/runs?pipeline=nope", "avg", maple).statusCode() shouldBe 400
    req("POST", "/runs", "avg", maple).statusCode() shouldBe 400

    // happy path → 201 {runId}; duplicate content → 409 {existingRunId}
    val created = req("POST", "/runs?pipeline=maple", "avg", maple)
    created.statusCode() shouldBe 201
    val runId = created.body().split("\"")(3)
    val dup = req("POST", "/runs?pipeline=maple", "avg", maple)
    dup.statusCode() shouldBe 409
    dup.body() should include(runId)

    // reads: owner 200 (hidden attrs pruned), other user 403, missing 404
    val got = req("GET", s"/runs/$runId", "avg")
    got.statusCode() shouldBe 200
    got.body() should include("Maple_04")
    got.body() should not include "sampleIds"
    req("GET", s"/runs/$runId", "avg2").statusCode() shouldBe 403
    req("GET", s"/runs/${"0" * 32}", "avg").statusCode() shouldBe 404
    // listing scoped per user
    req("GET", "/runs", "avg").body() should include(runId)
    req("GET", "/runs", "avg2").body() shouldBe "[]"

    // public stats endpoint sees the upload
    val stats = req("GET", "/stats/runs")
    stats.statusCode() shouldBe 200
    stats.body() should include("maple")

    // patch: propagating rename → counts; 422 on bad op leaves run intact;
    // non-JSON body → 400
    val patched = req("PATCH", s"/runs/$runId", "avg",
      """[{"op":"replace","path":"/labels/runName","value":"Overwire"}]""".getBytes)
    patched.statusCode() shouldBe 200
    patched.body() shouldBe
      """{"runsModified":1,"samplesModified":2,"readGroupsModified":3}"""
    req("PATCH", s"/runs/$runId", "avg",
      """[{"op":"replace","path":"/uploaderId","value":"x"}]""".getBytes)
      .statusCode() shouldBe 422
    req("PATCH", s"/runs/$runId", "avg", "not json".getBytes).statusCode() shouldBe 400
    // wire-level RFC-6902 schema gate: non-array, empty array, add-without-
    // value, malformed pointer — all 400 before any op is interpreted
    req("PATCH", s"/runs/$runId", "avg",
      """{"op":"remove","path":"/labels/notes"}""".getBytes).statusCode() shouldBe 400
    req("PATCH", s"/runs/$runId", "avg", "[]".getBytes).statusCode() shouldBe 400
    req("PATCH", s"/runs/$runId", "avg",
      """[{"op":"add","path":"/labels/notes"}]""".getBytes).statusCode() shouldBe 400
    req("PATCH", s"/runs/$runId", "avg",
      """[{"op":"add","path":"no-slash","value":1}]""".getBytes).statusCode() shouldBe 400
    req("GET", s"/runs/$runId", "avg").body() should include("Overwire")

    // download returns the stored bytes verbatim
    val dl = req("GET", s"/runs/$runId?download=true", "avg")
    dl.statusCode() shouldBe 200
    dl.body() shouldBe new String(maple, "UTF-8")

    // delete: owner 204; repeat 410; subsequent reads/patches 410
    req("DELETE", s"/runs/$runId", "avg2").statusCode() shouldBe 403
    req("DELETE", s"/runs/$runId", "avg").statusCode() shouldBe 204
    req("DELETE", s"/runs/$runId", "avg").statusCode() shouldBe 410
    req("GET", s"/runs/$runId", "avg").statusCode() shouldBe 410
    req("PATCH", s"/runs/$runId", "avg",
      """[{"op":"replace","path":"/labels/runName","value":"x"}]""".getBytes)
      .statusCode() shouldBe 410
    req("GET", "/runs", "avg").body() shouldBe "[]"
  }

  it should "accept multipart/form-data uploads via the file part named 'run'" in {
    port // force server start + users
    // reference RunsController:294-316: the upload rides in the file part
    // named "run"; a multipart body without that part is 400, like the
    // reference's fileParams halt
    def mpPost(body: Array[Byte]): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/runs?pipeline=maple&userId=avg2"))
        .header("X-Sentinel-Key", keyOf("avg2"))
        .header("Content-Type", "multipart/form-data; boundary=GraftBoundary42")
        .method("POST", HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())

    val payload = fixture("maple/maple_multi_sample_single_rg.json")
    val mpResp = mpPost(multipart("GraftBoundary42",
      ("run", "mp_upload.json", payload),
      ("notes", "notes.txt", "ignored sibling part".getBytes)))
    mpResp.statusCode() shouldBe 201
    val mpRun = mpResp.body().split("\"")(3)
    // the stored file round-trips byte-exact through the multipart framing
    req("GET", s"/runs/$mpRun?download=true", "avg2").body() shouldBe
      new String(payload, "UTF-8")
    // a multipart body whose parts don't include "run" → 400
    val mpMissing = mpPost(multipart("GraftBoundary42",
      ("other", "x.json", "{}".getBytes)))
    mpMissing.statusCode() shouldBe 400
    mpMissing.body() should include("Run summary file not specified")

    // RFC 7578 puts no order constraint on disposition parameters:
    // filename BEFORE name must still resolve the part name as "run"
    // (a naive name=... regex would match the tail of filename=...)
    val reversed =
      ("--GraftBoundary42\r\nContent-Disposition: form-data; " +
        "filename=\"rev.json\"; name=\"run\"\r\n\r\n").getBytes("UTF-8") ++
        fixture("maple/maple_multi_sample_single_rg.json") ++
        "\r\n--GraftBoundary42--\r\n".getBytes("UTF-8")
    // duplicate content for avg2 → 409 proves the part WAS found and
    // ingested down the normal path (a parse miss would be a 400)
    mpPost(reversed).statusCode() shouldBe 409
  }

  it should "serve the users surface with the reference's status ladder" in {
    // self-registration (open, created unverified): 201; dup id: 409;
    // weak password: 422 with hints; junk: 400
    req("POST", "/users",
      body = """{"id":"newbie","email":"n@test.id","password":"Abc123","confirmPassword":"Abc123"}""".getBytes)
      .statusCode() shouldBe 201
    req("POST", "/users",
      body = """{"id":"newbie","email":"n@test.id","password":"Abc123","confirmPassword":"Abc123"}""".getBytes)
      .statusCode() shouldBe 409
    val weak = req("POST", "/users",
      body = """{"id":"w","email":"bad","password":"x","confirmPassword":"y"}""".getBytes)
    weak.statusCode() shouldBe 422
    weak.body() should include("hints")
    req("POST", "/users", body = "not json".getBytes).statusCode() shouldBe 400

    // point-get: self 200 (no password material), other-user 403, missing 404
    val me = req("GET", "/users/avg", "avg")
    me.statusCode() shouldBe 200
    me.body() should include("avg@test.id")
    me.body() should not include "password"
    req("GET", "/users/avg2", "avg").statusCode() shouldBe 403
    req("GET", "/users/nobody", "avg") // authed as avg, asking for missing id
      .statusCode() shouldBe 403 // non-admin can't probe others; admin would see 404

    // patch authenticates with HTTP Basic (reference UsersController:102):
    // no credentials and wrong password → 401 with the WWW-Authenticate
    // challenge; unverified account → 403; then self email 204,
    // /verified non-admin 403, bad path 422
    val noAuth = basicReq("PATCH", "/users/avg", null,
      """[{"op":"replace","path":"/email","value":"new@test.id"}]""".getBytes)
    noAuth.statusCode() shouldBe 401
    noAuth.headers().firstValue("WWW-Authenticate").get() should include("Basic")
    basicReq("PATCH", "/users/avg", "avg:WrongPass1",
      """[{"op":"replace","path":"/email","value":"new@test.id"}]""".getBytes)
      .statusCode() shouldBe 401
    basicReq("PATCH", "/users/unv", "unv:Abc123",
      """[{"op":"replace","path":"/email","value":"new@test.id"}]""".getBytes)
      .statusCode() shouldBe 403
    basicReq("PATCH", "/users/avg", "avg:Abc123",
      """[{"op":"replace","path":"/email","value":"new@test.id"}]""".getBytes)
      .statusCode() shouldBe 204
    req("GET", "/users/avg", "avg").body() should include("new@test.id")
    basicReq("PATCH", "/users/avg", "avg:Abc123",
      """[{"op":"replace","path":"/verified","value":true}]""".getBytes)
      .statusCode() shouldBe 403
    basicReq("PATCH", "/users/avg", "avg:Abc123",
      """[{"op":"replace","path":"/isAdmin","value":true}]""".getBytes)
      .statusCode() shouldBe 422

    // delete: other-user 403; self 204; key is dead afterwards (401)
    req("DELETE", "/users/avg", "avg2").statusCode() shouldBe 403
    val key = keyOf("newbie")
    req("DELETE", "/users/newbie", "newbie", key = key).statusCode() shouldBe 204
    req("GET", "/users/newbie", "newbie", key = key).statusCode() shouldBe 401
  }

  it should "serve /references and /annotations lists and point-gets with 404s" in {
    // a pref upload get-or-creates a reference dictionary entry; a pann
    // upload an annotation entry
    req("POST", "/runs?pipeline=pref", "avg",
      fixture("pref/pref_01.json")).statusCode() shouldBe 201
    req("POST", "/runs?pipeline=pann", "avg",
      fixture("pann/pann_01.json")).statusCode() shouldBe 201

    // list (public, no auth): contains the created entries
    val refs = req("GET", "/references")
    refs.statusCode() shouldBe 200
    refs.body() should include("refId")
    val annots = req("GET", "/annotations")
    annots.statusCode() shouldBe 200
    annots.body() should include("annotId")
    // maxReturn honored; junk maxReturn → 400
    req("GET", "/references?maxReturn=1").statusCode() shouldBe 200
    req("GET", "/references?maxReturn=junk").statusCode() shouldBe 400

    // point-get by id round-trips; unknown and invalid ids are both 404
    // (reference ReferencesControllerSpec/AnnotationsControllerSpec)
    val refId = refs.body().split("\"refId\":\"")(1).split("\"")(0)
    val got = req("GET", s"/references/$refId")
    got.statusCode() shouldBe 200
    got.body() should include(refId)
    req("GET", s"/references/${"0" * 32}").statusCode() shouldBe 404
    req("GET", "/references/not-an-id").statusCode() shouldBe 404
    val annotId = annots.body().split("\"annotId\":\"")(1).split("\"")(0)
    req("GET", s"/annotations/$annotId").statusCode() shouldBe 200
    req("GET", s"/annotations/${"f" * 32}").statusCode() shouldBe 404
    req("GET", "/annotations/nope").statusCode() shouldBe 404
    // only GET is served
    req("DELETE", s"/references/$refId", "avg").statusCode() shouldBe 405
  }

  it should "serve per-pipeline stats endpoints with the param-error taxonomy" in {
    req("POST", "/runs?pipeline=maple", "avg",
      fixture("maple/maple_single_sample_multi_rg.json")).statusCode() shouldBe 201

    // data points at both accLevels (public)
    val rg = req("GET", "/stats/maple?accLevel=readGroup&timeSorted=true")
    rg.statusCode() shouldBe 200
    rg.body() should include("nReadsInput")
    val sm = req("GET", "/stats/maple?accLevel=sample&nLimit=1")
    sm.statusCode() shouldBe 200

    // aggregate: descriptive stats for every numeric metric, or a subset
    val agg = req("GET", "/stats/maple/aggregate?accLevel=readGroup")
    agg.statusCode() shouldBe 200
    agg.body() should include("nReadsInput_mean")
    val one = req("GET", "/stats/maple/aggregate?accLevel=readGroup&metrics=nReadsInput")
    one.statusCode() shouldBe 200
    one.body() should not include "nReadsAligned_mean"

    // param taxonomy: unknown pipeline, bad enum, malformed id, junk
    // nLimit, unknown metric → all 400, like the reference's converters
    req("GET", "/stats/nope").statusCode() shouldBe 400
    req("GET", "/stats/maple?accLevel=bogus").statusCode() shouldBe 400
    req("GET", "/stats/maple?libType=bogus").statusCode() shouldBe 400
    req("GET", "/stats/maple?runIds=not-hex").statusCode() shouldBe 400
    req("GET", "/stats/maple?nLimit=junk").statusCode() shouldBe 400
    req("GET", "/stats/maple/aggregate?metrics=bogus").statusCode() shouldBe 400
    // plain has no unit levels at all
    req("GET", "/stats/plain?accLevel=sample").statusCode() shouldBe 400
    // deeper unknown paths under /stats are 404
    req("GET", "/stats/maple/aggregate/extra").statusCode() shouldBe 404
  }

  it should "serve a machine-readable self-description covering every mounted route" in {
    port // force server start
    val r = req("GET", "/api-docs")
    r.statusCode() shouldBe 200
    val spec = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.body())
    spec.get("swagger").asText() shouldBe "2.0"
    val paths = spec.get("paths")
    // every context prefix the server actually mounted is described by at
    // least one documented path — docs cannot silently lag the router
    shim.mountedPrefixes should not be empty
    shim.mountedPrefixes.foreach { prefix =>
      withClue(s"$prefix: ") {
        val covered = paths.properties().iterator()
        var hit = false
        while (covered.hasNext && !hit) hit = covered.next().getKey.startsWith(prefix)
        hit shouldBe true
      }
    }
    // ...and every catalog entry renders with its method, params, and
    // error taxonomy
    HttpShim.routeDocs.foreach { rd =>
      withClue(s"${rd.method} ${rd.path}: ") {
        val op = paths.get(rd.path).get(rd.method.toLowerCase)
        op should not be null
        op.get("summary").asText() shouldBe rd.summary
        op.get("parameters").size() shouldBe rd.params.size
        rd.responses.keys.foreach { code =>
          op.get("responses").has(code.toString) shouldBe true
        }
      }
    }
    // the description itself documents the documented-route invariant the
    // other specs exercise: spot-check two status codes against reality
    paths.get("/runs/{runId}").get("patch").get("responses").has("410") shouldBe true
    paths.get("/users/{id}").get("patch").get("responses").has("403") shouldBe true
    // non-GET on the docs route follows the shim's method taxonomy
    req("POST", "/api-docs").statusCode() shouldBe 405
  }

  override def afterAll(): Unit = {
    shim.stop()
    super.afterAll()
  }
}
