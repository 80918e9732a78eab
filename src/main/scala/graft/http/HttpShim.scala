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
  *  - `POST   /runs?userId=U&pipeline=P`  body = upload bytes → 201 {runId}
  *  - `GET    /runs?userId=U[&pipelines=a,b]`                 → 200 [runs]
  *  - `GET    /runs/{id}?userId=U[&download=true]`            → 200
  *  - `PATCH  /runs/{id}?userId=U`        body = JSON patch   → 200 {counts}
  *  - `DELETE /runs/{id}?userId=U`                            → 204
  *  - `GET    /stats/runs`                                    → 200 [rollup]
  *
  * Auth mirrors the reference's SimpleKeyAuthStrategy: `userId` query param
  * (400 when missing) + `X-API-Key` header matched against the user's
  * active key (401 when absent or wrong). `/stats/runs` is public, like the
  * reference's stats endpoints.
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

  /** Start on an ephemeral port; returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/runs", (ex: HttpExchange) => safely(ex)(handleRuns))
    server.createContext("/users", (ex: HttpExchange) => safely(ex)(handleUsers))
    server.createContext("/stats/runs", (ex: HttpExchange) => safely(ex) { e =>
      json(e, 200, ApiRender.renderRows(sentinel.globalRunStats()))
    })
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
        Option(ex.getRequestHeaders.getFirst("X-API-Key")) match {
          case None =>
            json(ex, 401, """{"message":"Authentication required."}""")
            None
          case Some(key) =>
            val u = UsersOps.authenticateByKey(sentinel.warehouse, userId, key)
            if (u.isEmpty) json(ex, 401, """{"message":"Authentication failed."}""")
            u
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
              val bytes = ex.getRequestBody.readAllBytes()
              val id = sentinel.upload(
                bytes, q.getOrElse("fileName", "upload.json"), pipeline, user)
              json(ex, 201, s"""{"runId":"$id"}""")
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
          json(ex, 200,
            s"""{"runsModified":$r,"samplesModified":$s,"readGroupsModified":$g}""")
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
        json(ex, 201, s"""{"id":"${field("id")}"}""")
      case _ =>
        authed(ex).foreach { user =>
          (method, target) match {
            case ("GET", Some(id)) =>
              // self-or-admin, like the reference's user point-get
              if (user.id != id && !user.isAdmin)
                throw new RunsLifecycle.ForbiddenException(s"cannot view user $id")
              sentinel.getUser(id) match {
                case Some(u) => json(ex, 200,
                  s"""{"id":"${u.id}","email":"${u.email}","verified":${u.verified}}""")
                case None => throw new RunsLifecycle.NotFoundException(s"user $id not found")
              }
            case ("PATCH", Some(id)) =>
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
            case ("DELETE", Some(id)) =>
              sentinel.deleteUser(user, id)
              ex.sendResponseHeaders(204, -1)
            case _ => json(ex, 405, """{"message":"method not allowed"}""")
          }
        }
    }
  }

  private def json(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }
}
