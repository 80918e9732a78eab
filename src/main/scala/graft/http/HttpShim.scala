package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.Sentinel
import graft.functions.Scalars
import graft.ingest.Ingest
import graft.lifecycle.{JsonPatch, RunsLifecycle, UsersOps}
import graft.model.Records
import graft.render.ApiRender

/** Minimal HTTP adapter over [[Sentinel]] — the wire-level surface the
  * reference exposes through Scalatra (`api/RunsController.scala:294-316`,
  * `api/UsersController.scala:96-186`), here a dependency-free JDK
  * `com.sun.net.httpserver` shim. The POINT is the error taxonomy: every
  * engine exception maps to the documented status code
  * ([[graft.Sentinel]] doc), proven over an actual socket by
  * `HttpShimSpec`.
  *
  * Routes (reference RunsController surface):
  *  - `POST   /runs?userId=U&pipeline=P`  body = upload bytes, raw or
  *    multipart/form-data with a file part named `run`     → 201 {runId}
  *  - `GET    /runs?userId=U[&pipelines=a,b]`                 → 200 [runs]
  *  - `GET    /runs/{id}?userId=U[&download=true]`            → 200
  *  - `PATCH  /runs/{id}?userId=U`        body = JSON patch   → 200 {counts}
  *  - `DELETE /runs/{id}?userId=U`                            → 204
  *  - `GET    /stats/runs`                                    → 200 [rollup]
  *  - `GET    /stats/{pipeline}[/aggregate]?accLevel=..&...`  → 200 (public)
  *  - `GET    /references[/{id}]` / `GET /annotations[/{id}]` → 200 | 404
  *
  * Auth mirrors the reference's SimpleKeyAuthStrategy: `userId` query param
  * (400 when missing) + `X-Sentinel-Key` header matched against the user's
  * active key (401 when absent or wrong). `PATCH /users/{id}` instead uses
  * HTTP Basic (reference `api/auth/BasicAuthStrategy.scala`): 401 +
  * `WWW-Authenticate` challenge on missing/wrong credentials, 403 on an
  * unverified account. `/stats/runs` is public, like the reference's stats
  * endpoints.
  */
final class HttpShim(sentinel: Sentinel) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  /** Wire-level patch-document gate, mirroring the reference's validation
    * of PATCH bodies against `schemas/json_patch.json` before any op is
    * interpreted (RFC 6902 array shape; 400 on violation). */
  private val patchSchema =
    graft.pipelines.SchemaValidator.fromResource("/schemas/json_patch.json")

  /** HTTP status for an engine exception — the [[Sentinel]] taxonomy. */
  def statusOf(e: Throwable): Int = e match {
    case _: Ingest.NotJsonException            => 400
    case _: Scalars.InvalidEnumException       => 400
    case _: JsonPatch.PatchParseException      => 400
    case _: Ingest.UnknownPipelineException    => 400
    case _: Ingest.NotAuthorizedException      => 403
    case _: RunsLifecycle.ForbiddenException   => 403
    case _: RunsLifecycle.NotFoundException    => 404
    case _: Ingest.DuplicateFileException      => 409
    case _: UsersOps.ConflictException         => 409
    case _: RunsLifecycle.GoneException        => 410
    case _: Ingest.PayloadTooLargeException    => 413
    case _: Ingest.SchemaException             => 422
    case _: JsonPatch.PatchValidationException => 422
    case _: UsersOps.ValidationException       => 422
    case _                                     => 500
  }

  private val mounted = scala.collection.mutable.ArrayBuffer.empty[String]

  private def mount(path: String)(h: HttpExchange => Unit): Unit = {
    mounted += path
    server.createContext(path, (ex: HttpExchange) => safely(ex)(h))
  }

  /** Context prefixes registered at [[start]] — what the self-description
    * must cover (spec-pinned). */
  def mountedPrefixes: Seq[String] = mounted.toSeq

  /** Start on an ephemeral port; returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    mount("/runs")(handleRuns)
    mount("/users")(handleUsers)
    // longest-prefix context match: /stats/runs wins over the /stats
    // fallback handling the per-pipeline endpoints
    mount("/stats/runs") { e =>
      json(e, 200, ApiRender.renderRows(sentinel.globalRunStats()))
    }
    mount("/stats")(handleStats)
    mount("/references") { e =>
      handleDictionary(e, "/references",
        n => sentinel.listReferences(n), id => sentinel.getReference(id))
    }
    mount("/annotations") { e =>
      handleDictionary(e, "/annotations",
        n => sentinel.listAnnotations(n), id => sentinel.getAnnotation(id))
    }
    mount("/api-docs")(handleApiDocs)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ---- request plumbing ---------------------------------------------------

  private def safely(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try f(ex)
    catch {
      case e: Throwable =>
        val code = statusOf(e)
        val body = mapper.createObjectNode()
        body.put("message", Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        e match {
          case s: Ingest.SchemaException =>
            val arr = body.putArray("hints"); s.errors.foreach(arr.add)
          case v: UsersOps.ValidationException =>
            val arr = body.putArray("hints"); v.errors.foreach(arr.add)
          case d: Ingest.DuplicateFileException =>
            body.put("existingRunId", d.existingRunId)
          case _ => ()
        }
        json(ex, code, body.toString)
    } finally ex.close()

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split('&').toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _           => None
      }
    }.toMap).getOrElse(Map.empty)

  /** 400 when userId is missing, 401 when the API key doesn't match —
    * the reference's auth ladder. None ⇒ the response was already sent. */
  private def authed(ex: HttpExchange): Option[Records.User] =
    query(ex).get("userId") match {
      case None =>
        json(ex, 400, """{"message":"User ID not specified."}""")
        None
      case Some(userId) =>
        Option(ex.getRequestHeaders.getFirst("X-Sentinel-Key")) match {
          case None =>
            json(ex, 401, """{"message":"Authentication required."}""")
            None
          case Some(key) =>
            val u = UsersOps.authenticateByKey(sentinel.warehouse, userId, key)
            if (u.isEmpty) json(ex, 401, """{"message":"Authentication failed."}""")
            u
        }
    }

  /** HTTP Basic authentication (reference `api/auth/BasicAuthStrategy
    * .scala`): missing/malformed credentials or a wrong password → 401
    * with the `WWW-Authenticate` challenge; valid credentials on an
    * unverified account → 403 (the reference's afterAuthenticate halt).
    * None ⇒ the response was already sent. */
  private def basicAuthed(ex: HttpExchange): Option[Records.User] = {
    def challenge(): Option[Records.User] = {
      ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"Sentinel Admins\"")
      json(ex, 401, """{"message":"Authentication required to access resource."}""")
      None
    }
    Option(ex.getRequestHeaders.getFirst("Authorization")) match {
      case Some(h) if h.regionMatches(true, 0, "Basic ", 0, 6) =>
        val decoded =
          try new String(java.util.Base64.getDecoder.decode(h.substring(6).trim),
            StandardCharsets.UTF_8)
          catch { case _: IllegalArgumentException => "" }
        decoded.split(":", 2) match {
          case Array(id, password) =>
            UsersOps.authenticateByPassword(sentinel.warehouse, id, password) match {
              case None => challenge()
              case Some(u) if !u.verified =>
                json(ex, 403, """{"message":"Unauthorized to access resource."}""")
                None
              case some => some
            }
          case _ => challenge()
        }
      case _ => challenge()
    }
  }

  private def handleRuns(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod.toUpperCase
    val runId = if (path == "/runs") None else Some(path.stripPrefix("/runs/"))
    val q = query(ex)
    authed(ex).foreach { user =>
      (method, runId) match {
        case ("POST", None) =>
          q.get("pipeline") match {
            case None => json(ex, 400, """{"message":"Pipeline not specified."}""")
            case Some(pipeline) =>
              val raw = ex.getRequestBody.readAllBytes()
              val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
              // multipart framing (reference RunsController:294-316): the
              // upload is the file part named "run"; raw-body posts stay
              // accepted as the simpler equivalent framing
              val upload =
                if (ct.toLowerCase.startsWith("multipart/form-data"))
                  Multipart.boundaryOf(ct)
                    .map(Multipart.parse(raw, _)).getOrElse(Seq.empty)
                    .find(_.name == "run") match {
                    case None =>
                      json(ex, 400, """{"message":"Run summary file not specified."}""")
                      None
                    case some => some
                  }
                else Some(Multipart.Part("run", q.get("fileName"), raw))
              upload.foreach { p =>
                val id = sentinel.upload(
                  p.bytes, p.fileName.getOrElse("upload.json"), pipeline, user)
                json(ex, 201, obj("runId" -> id))
              }
          }
        case ("GET", None) =>
          val pipelines = q.get("pipelines").map(_.split(',').toSeq).getOrElse(Seq.empty)
          json(ex, 200, ApiRender.renderRows(
            sentinel.getRuns(user, pipelines), showBlanks = false))
        case ("GET", Some(id)) if q.get("download").contains("true") =>
          val bytes = sentinel.getRunFile(id, user)
          ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        case ("GET", Some(id)) =>
          json(ex, 200, ApiRender.renderRows(
            sentinel.getRun(id, user, showUnitsLabels =
              q.get("showUnitsLabels").contains("true")), showBlanks = false))
        case ("PATCH", Some(id)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val node =
            try mapper.readTree(body)
            catch {
              case e: Exception => throw new JsonPatch.PatchParseException(
                s"patch is not JSON: ${e.getMessage}")
            }
          if (node == null)
            throw new JsonPatch.PatchParseException("patch is empty")
          val schemaErrs = patchSchema.validate(node)
          if (schemaErrs.nonEmpty)
            throw new JsonPatch.PatchParseException(
              s"patch document invalid: ${schemaErrs.mkString("; ")}")
          val (r, s, g) = sentinel.patchRun(id, user, JsonPatch.parse(node))
          json(ex, 200, obj("runsModified" -> r,
            "samplesModified" -> s, "readGroupsModified" -> g))
        case ("DELETE", Some(id)) =>
          sentinel.deleteRun(id, user)
          ex.sendResponseHeaders(204, -1)
        case _ =>
          json(ex, 405, """{"message":"method not allowed"}""")
      }
    }
  }

  /** Users surface (reference `api/UsersController.scala:96-186`):
    * `POST /users` is open (self-registration, created unverified);
    * get/patch/delete authenticate and authorize per UsersOps. */
  private def handleUsers(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod.toUpperCase
    val target = if (path == "/users") None else Some(path.stripPrefix("/users/"))
    (method, target) match {
      case ("POST", None) =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val node =
          try mapper.readTree(body)
          catch { case e: Exception =>
            throw new Ingest.NotJsonException(s"user payload is not JSON: ${e.getMessage}") }
        def field(n: String): String =
          Option(node.get(n)).filter(_.isTextual).map(_.asText)
            .getOrElse(throw new UsersOps.ValidationException(Seq(s"$n: required string")))
        sentinel.addUser(field("id"), field("email"),
          field("password"), field("confirmPassword"))
        json(ex, 201, obj("id" -> field("id")))
      case ("PATCH", Some(id)) =>
        // the one HTTP-Basic route, like the reference
        // (UsersController.scala:102 `val user = basicAuth()`)
        basicAuthed(ex).foreach { user =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val node =
            try mapper.readTree(body)
            catch { case e: Exception =>
              throw new JsonPatch.PatchParseException(s"patch is not JSON: ${e.getMessage}") }
          val schemaErrs = patchSchema.validate(node)
          if (schemaErrs.nonEmpty)
            throw new JsonPatch.PatchParseException(
              s"patch document invalid: ${schemaErrs.mkString("; ")}")
          sentinel.patchUser(user, id, JsonPatch.parse(node))
          ex.sendResponseHeaders(204, -1)
        }
      case _ =>
        authed(ex).foreach { user =>
          (method, target) match {
            case ("GET", Some(id)) =>
              // self-or-admin, like the reference's user point-get
              if (user.id != id && !user.isAdmin)
                throw new RunsLifecycle.ForbiddenException(s"cannot view user $id")
              sentinel.getUser(id) match {
                case Some(u) => json(ex, 200, obj(
                  "id" -> u.id, "email" -> u.email, "verified" -> u.verified))
                case None => throw new RunsLifecycle.NotFoundException(s"user $id not found")
              }
            case ("DELETE", Some(id)) =>
              sentinel.deleteUser(user, id)
              ex.sendResponseHeaders(204, -1)
            case _ => json(ex, 405, """{"message":"method not allowed"}""")
          }
        }
    }
  }

  /** Dictionary surface (reference `api/ReferencesController.scala:64-86`,
    * `api/AnnotationsController.scala:64-87`): public like the reference's
    * dictionary browse — list with optional `maxReturn`, point-get by id
    * with 404 on an invalid OR unknown id. */
  private def handleDictionary(ex: HttpExchange, prefix: String,
      list: Option[Int] => org.apache.spark.sql.DataFrame,
      get: String => org.apache.spark.sql.DataFrame): Unit = {
    if (ex.getRequestMethod.toUpperCase != "GET") {
      json(ex, 405, """{"message":"method not allowed"}"""); return
    }
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val target = if (path == prefix) None else Some(path.stripPrefix(prefix + "/"))
    target match {
      case None =>
        val maxReturn = query(ex).get("maxReturn").map(parseIntParam("maxReturn"))
        json(ex, 200, ApiRender.renderRows(list(maxReturn), showBlanks = false))
      case Some(id) =>
        json(ex, 200, ApiRender.renderRows(get(id), showBlanks = false))
    }
  }

  /** Per-pipeline stats endpoints (reference
    * `api/BaseStatsController.scala:66-71` + the param converters of
    * `api/SentinelServlet.scala:219-273`):
    *  - `GET /stats/{pipeline}` → data points (accLevel, libType, runIds,
    *    references, annotations, timeSorted, nLimit)
    *  - `GET /stats/{pipeline}/aggregate` → descriptive stats over the
    *    pipeline's numeric metrics (optionally narrowed via `metrics`).
    * Error taxonomy: unknown pipeline / bad enum / malformed id ⇒ 400,
    * like the reference's param-conversion halts. Public, like all stats
    * endpoints. */
  private def handleStats(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod.toUpperCase != "GET") {
      json(ex, 405, """{"message":"method not allowed"}"""); return
    }
    val parts = ex.getRequestURI.getPath.stripSuffix("/").stripPrefix("/stats")
      .stripPrefix("/").split('/').toSeq.filter(_.nonEmpty)
    val (pipeline, aggregate) = parts match {
      case Seq(p)              => (p, false)
      case Seq(p, "aggregate") => (p, true)
      case _ =>
        throw new RunsLifecycle.NotFoundException(
          s"no such stats endpoint: ${ex.getRequestURI.getPath}")
    }
    val plugin = sentinel.pipelines.getOrElse(pipeline,
      throw new Ingest.UnknownPipelineException(pipeline))
    val q = query(ex)
    def idsParam(name: String): Seq[String] = {
      val raw = Scalars.splitParam(q.get(name))
      val (ok, bad) = Scalars.partitionIds(raw)
      if (bad.nonEmpty) throw new Scalars.InvalidEnumException(name, bad.head)
      ok
    }
    val params = graft.stats.StatsParams(
      accLevel = q.get("accLevel").map(Scalars.AccLevel.parse)
        .getOrElse(Scalars.AccLevel.ReadGroup),
      libType = q.get("libType").map(Scalars.parseLibType),
      runIds = idsParam("runIds"),
      references = idsParam("references"),
      annotations = idsParam("annotations"),
      timeSorted = q.get("timeSorted").contains("true"),
      nLimit = q.get("nLimit").map(parseIntParam("nLimit")))
    val statsSchema = (params.accLevel match {
      case Scalars.AccLevel.Sample    => plugin.sampleStatsSchema
      case Scalars.AccLevel.ReadGroup => plugin.readGroupStatsSchema
    }).getOrElse(throw new Scalars.InvalidEnumException(
      "accLevel", s"$pipeline has no ${params.accLevel} units"))
    if (!aggregate) {
      val projection = Seq(org.apache.spark.sql.functions.col("_id"),
        org.apache.spark.sql.functions.col("runId"),
        org.apache.spark.sql.functions.col("creationTimeUtc"),
        org.apache.spark.sql.functions.col("stats"))
      json(ex, 200, ApiRender.renderRows(
        sentinel.getStats(pipeline, params, projection), showBlanks = false))
    } else {
      val numeric = statsSchema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
          f.name
      }.toSeq
      val wanted = Scalars.splitParam(q.get("metrics")) match {
        case Seq() => numeric
        case ms =>
          ms.foreach(m => if (!numeric.contains(m))
            throw new Scalars.InvalidEnumException("metrics", m))
          ms
      }
      val metrics = wanted.map(m =>
        m -> org.apache.spark.sql.functions.col(s"stats.$m"))
      json(ex, 200, ApiRender.renderRows(
        sentinel.getAggregateStats(pipeline, params, metrics)))
    }
  }

  /** Machine-readable API self-description (reference: every controller
    * carries `SwaggerSupport` operation/param/error annotations and the
    * app serves the spec — `api/RunsController.scala:40-67`,
    * `api/SentinelServlet.scala`, `api/ResourceApp` wiring). Swagger-2
    * shape: `{"swagger":"2.0","info":...,"paths":{path:{method:op}}}` with
    * per-operation `summary`, `parameters` (name/in/required) and
    * `responses` (status → description) drawn from the same taxonomy
    * [[statusOf]] enforces. Public like the reference's spec route. */
  private def handleApiDocs(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod.toUpperCase != "GET") {
      json(ex, 405, """{"message":"method not allowed"}"""); return
    }
    val root = mapper.createObjectNode()
    root.put("swagger", "2.0")
    val info = root.putObject("info")
    info.put("title", "Sentinel-on-Spark API")
    info.put("version", "1")
    val paths = root.putObject("paths")
    HttpShim.routeDocs.foreach { r =>
      val p = if (paths.has(r.path)) paths.get(r.path)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else paths.putObject(r.path)
      val op = p.putObject(r.method.toLowerCase)
      op.put("summary", r.summary)
      op.put("security", r.auth)
      val params = op.putArray("parameters")
      r.params.foreach { pd =>
        val n = params.addObject()
        n.put("name", pd.name)
        n.put("in", pd.in)
        n.put("required", pd.required)
      }
      val resp = op.putObject("responses")
      r.responses.foreach { case (code, desc) => resp.put(code.toString, desc) }
    }
    json(ex, 200, root.toString)
  }

  private def parseIntParam(name: String)(v: String): Int =
    try v.toInt
    catch { case _: NumberFormatException =>
      throw new Scalars.InvalidEnumException(name, v) }

  private def json(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  /** Serialize a response object through Jackson — user-controlled values
    * (ids, emails, file names) must never be string-interpolated into a
    * JSON body: a quote or backslash in a registered value would produce
    * malformed JSON (injection). */
  private def obj(kvs: (String, Any)*): String = {
    val node = mapper.createObjectNode()
    kvs.foreach {
      case (k, v: String)  => node.put(k, v)
      case (k, v: Int)     => node.put(k, v)
      case (k, v: Long)    => node.put(k, v)
      case (k, v: Boolean) => node.put(k, v)
      case (k, v)          => node.put(k, String.valueOf(v))
    }
    node.toString
  }
}

object HttpShim {
  final case class ParamDoc(name: String, in: String, required: Boolean)
  final case class RouteDoc(
      method: String,
      path: String,
      summary: String,
      auth: String, // "key" (userId + X-Sentinel-Key), "basic", or "none"
      params: Seq[ParamDoc],
      responses: Map[Int, String])

  private def q(name: String, required: Boolean = false) =
    ParamDoc(name, "query", required)
  private def p(name: String) = ParamDoc(name, "path", required = true)

  /** The full route catalog — ONE entry per (method, path) the shim
    * serves; the source of truth `/api-docs` renders and the coverage
    * spec checks against [[HttpShim.mountedPrefixes]]. */
  val routeDocs: Seq[RouteDoc] = Seq(
    RouteDoc("POST", "/runs", "Upload a run summary (raw or multipart 'run' part)",
      "key", Seq(q("userId", required = true), q("pipeline", required = true), q("fileName")),
      Map(201 -> "created {runId}", 400 -> "bad payload / pipeline missing",
        401 -> "bad key", 403 -> "not authorized", 409 -> "duplicate file",
        413 -> "payload too large", 422 -> "schema violation")),
    RouteDoc("GET", "/runs", "List the caller's runs",
      "key", Seq(q("userId", required = true), q("pipelines")),
      Map(200 -> "runs", 400 -> "userId missing", 401 -> "bad key")),
    RouteDoc("GET", "/runs/{runId}", "Point-get a run (or download=true for the raw file)",
      "key", Seq(p("runId"), q("userId", required = true), q("download"), q("showUnitsLabels")),
      Map(200 -> "run | file bytes", 401 -> "bad key", 403 -> "not owner",
        404 -> "unknown id", 410 -> "deleted")),
    RouteDoc("PATCH", "/runs/{runId}", "Apply a JSON Patch to a run",
      "key", Seq(p("runId"), q("userId", required = true)),
      Map(200 -> "modification counts", 400 -> "malformed patch", 401 -> "bad key",
        403 -> "not owner", 404 -> "unknown id", 410 -> "deleted",
        422 -> "patch not applicable")),
    RouteDoc("DELETE", "/runs/{runId}", "Soft-delete a run (cascades to units)",
      "key", Seq(p("runId"), q("userId", required = true)),
      Map(204 -> "deleted", 401 -> "bad key", 403 -> "not owner",
        404 -> "unknown id", 410 -> "already deleted")),
    RouteDoc("POST", "/users", "Self-register a user (created unverified)",
      "none", Seq.empty,
      Map(201 -> "created {id}", 400 -> "not JSON", 409 -> "id taken",
        422 -> "validation errors")),
    RouteDoc("GET", "/users/{id}", "Point-get a user (self or admin)",
      "key", Seq(p("id"), q("userId", required = true)),
      Map(200 -> "user", 401 -> "bad key", 403 -> "not self/admin", 404 -> "unknown id")),
    RouteDoc("PATCH", "/users/{id}", "Patch a user (HTTP Basic, verified accounts only)",
      "basic", Seq(p("id")),
      Map(204 -> "patched", 400 -> "malformed patch", 401 -> "challenge",
        403 -> "unverified account", 404 -> "unknown id", 422 -> "patch not applicable")),
    RouteDoc("DELETE", "/users/{id}", "Delete a user (self or admin)",
      "key", Seq(p("id"), q("userId", required = true)),
      Map(204 -> "deleted", 401 -> "bad key", 403 -> "not self/admin", 404 -> "unknown id")),
    RouteDoc("GET", "/stats/runs", "Global per-pipeline run/unit rollup (public)",
      "none", Seq.empty, Map(200 -> "rollup rows")),
    RouteDoc("GET", "/stats/{pipeline}", "Per-pipeline stats data points (public)",
      "none", Seq(p("pipeline"), q("accLevel"), q("libType"), q("runIds"),
        q("references"), q("annotations"), q("timeSorted"), q("nLimit")),
      Map(200 -> "data points", 400 -> "unknown pipeline / bad enum / bad id")),
    RouteDoc("GET", "/stats/{pipeline}/aggregate", "Descriptive stats over numeric metrics (public)",
      "none", Seq(p("pipeline"), q("accLevel"), q("libType"), q("runIds"),
        q("references"), q("annotations"), q("metrics")),
      Map(200 -> "aggregates", 400 -> "unknown pipeline / bad enum / bad metric")),
    RouteDoc("GET", "/references", "List reference records (public)",
      "none", Seq(q("maxReturn")), Map(200 -> "references", 400 -> "bad maxReturn")),
    RouteDoc("GET", "/references/{refId}", "Point-get a reference record (public)",
      "none", Seq(p("refId")), Map(200 -> "reference", 404 -> "unknown id")),
    RouteDoc("GET", "/annotations", "List annotation records (public)",
      "none", Seq(q("maxReturn")), Map(200 -> "annotations", 400 -> "bad maxReturn")),
    RouteDoc("GET", "/annotations/{annotId}", "Point-get an annotation record (public)",
      "none", Seq(p("annotId")), Map(200 -> "annotation", 404 -> "unknown id")),
    RouteDoc("GET", "/api-docs", "This machine-readable API description (public)",
      "none", Seq.empty, Map(200 -> "swagger-2 spec")))
}
