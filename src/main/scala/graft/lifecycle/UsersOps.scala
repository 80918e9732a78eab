package graft.lifecycle

import java.sql.Timestamp

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ingest.Ingest
import graft.lifecycle.JsonPatch._
import graft.model.Records
import graft.store.Warehouse

/** User management (S10, M6, C8, C9 — reference `models/User.scala:41-138`,
  * `adapters/UsersAdapter.scala:46-133`).
  *
  * Passwords hash with [[Bcrypt]] in the reference's exact `$2a$` format
  * (`models/User.scala:77` `BCrypt.hashpw(password, BCrypt.gensalt())`) —
  * implemented in-repo from the public algorithm since the offline build
  * has no jBCrypt jar. Hashes produced by the r1-r4 interim scheme
  * (`pbkdf2$salt$hash`, self-describing prefix) still verify. The adapter
  * surface — validation rules, 409/404/403 semantics, patchable paths —
  * matches the reference exactly.
  */
object UsersOps {

  final class ConflictException(msg: String) extends RuntimeException(msg)
  final class ValidationException(val errors: Seq[String])
    extends RuntimeException(errors.mkString("; "))

  // ---- C8: validation (reference models/User.scala:78-138) ---------------

  val MinUserIdLength = 3
  val MinPasswordLength = 6

  def idMessages(id: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (id.length < MinUserIdLength)
      b += s"User ID shorter than $MinUserIdLength characters."
    val bad = "\\W+".r.findAllIn(id).toSeq
    if (bad.nonEmpty)
      b += s"User ID contains forbidden characters: '${bad.mkString("', '")}'."
    b.result()
  }

  def passwordMessages(password: String, confirm: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (password != confirm) b += "Different passwords given."
    if (password.length < MinPasswordLength)
      b += s"Password shorter than $MinPasswordLength characters."
    val mixed = Seq("[A-Z]+", "[a-z]+", "[0-9]+").forall(_.r.findFirstIn(password).isDefined)
    if (!mixed)
      b += "Password does not contain a mixture of lower case(s), upper case(s), and number(s)."
    b.result()
  }

  def emailMessages(email: String): Seq[String] =
    if (email.matches("""^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+$""")) Seq.empty
    else Seq("Email invalid.")

  // ---- C9: password hashing + API key gen --------------------------------

  private[lifecycle] def pbkdf2(password: String, salt: String): String = {
    val spec = new PBEKeySpec(password.toCharArray, salt.getBytes("UTF-8"), 100000, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded.map(b => f"${b & 0xff}%02x").mkString
  }

  def hashPassword(password: String): String =
    Bcrypt.hashpw(password, Bcrypt.gensalt())

  def verifyPassword(password: String, stored: String): Boolean =
    if (stored.startsWith("$2a$")) Bcrypt.checkpw(password, stored)
    else stored.split('$') match { // r1-r4 interim PBKDF2 hashes
      case Array("pbkdf2", salt, hash) => pbkdf2(password, salt) == hash
      case _                           => false
    }

  private val keyRng = new java.security.SecureRandom()

  /** 32-hex bearer key from a CSPRNG (the reference's KeyGenerator is
    * HmacSHA1-random too — a time-derived hash would be guessable). */
  def generateApiKey(id: String): String = {
    val b = new Array[Byte](16)
    keyRng.synchronized(keyRng.nextBytes(b))
    b.map(x => f"${x & 0xff}%02x").mkString
  }

  // ---- S10: insert with 409 ----------------------------------------------

  def addUser(wh: Warehouse, id: String, email: String, password: String,
      confirmPassword: String,
      verified: Boolean = false, isAdmin: Boolean = false,
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): Unit = {
    val errors = idMessages(id) ++ passwordMessages(password, confirmPassword) ++
      emailMessages(email)
    if (errors.nonEmpty) throw new ValidationException(errors)
    // exists-check + append under the warehouse lock: without it two
    // concurrent registrations of the same id both pass the 409 gate and
    // append duplicate rows (the reference relied on a Mongo unique index)
    wh.synchronized {
      if (userExists(wh, id))
        throw new ConflictException(s"user $id already exists")
      val row = Row(id, email, hashPassword(password), generateApiKey(id),
        verified, isAdmin, now(), null)
      wh.append(Warehouse.Users,
        wh.spark.createDataFrame(java.util.List.of(row), Records.userSchema))
    }
  }

  /** A6: existence = filtered count, limit-1 short circuit. */
  def userExists(wh: Warehouse, id: String): Boolean =
    wh.exists(Warehouse.Users) &&
      wh.read(Warehouse.Users).filter(col("id") === id).limit(1).count() > 0

  def getUser(wh: Warehouse, id: String): Option[Records.User] =
    if (!wh.exists(Warehouse.Users)) None
    else wh.read(Warehouse.Users).filter(col("id") === id).collect().headOption
      .map(r => Records.User(r.getAs[String]("id"), r.getAs[String]("email"),
        r.getAs[Boolean]("verified"), r.getAs[Boolean]("isAdmin")))

  /** HTTP Basic credential check (reference `api/auth/BasicAuthStrategy
    * .scala:54-62` → `models/User.scala:63-77` passwordMatches): user row
    * by id, stored hash verified against the presented password. Returns
    * the user regardless of `verified` — the 403-on-unverified gate is
    * the caller's (afterAuthenticate in the reference). */
  def authenticateByPassword(wh: Warehouse, id: String, password: String): Option[Records.User] =
    if (!wh.exists(Warehouse.Users)) None
    else wh.read(Warehouse.Users).filter(col("id") === id).collect().headOption
      .filter(r => verifyPassword(password, r.getAs[String]("hashedPassword")))
      .map(r => Records.User(r.getAs[String]("id"), r.getAs[String]("email"),
        r.getAs[Boolean]("verified"), r.getAs[Boolean]("isAdmin")))

  /** API-key authentication (reference SimpleKeyAuthStrategy). */
  def authenticateByKey(wh: Warehouse, id: String, key: String): Option[Records.User] =
    if (!wh.exists(Warehouse.Users)) None
    else wh.read(Warehouse.Users)
      .filter(col("id") === id && col("activeKey") === key).collect().headOption
      .map(r => Records.User(r.getAs[String]("id"), r.getAs[String]("email"),
        r.getAs[Boolean]("verified"), r.getAs[Boolean]("isAdmin")))

  // ---- patch (reference adapters/UsersAdapter.scala:86-133) --------------

  /** Patch a user: /verified (admin-only, boolean), /email, /password.
    * Requester must be the user or an admin. */
  def patchUser(wh: Warehouse, requester: Records.User, userId: String,
      ops: List[PatchOp],
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): Unit = {
    if (requester.id != userId && !requester.isAdmin)
      throw new RunsLifecycle.ForbiddenException(
        s"user ${requester.id} cannot patch $userId")
    if (ops.exists(_.path == "/verified") && !requester.isAdmin)
      throw new RunsLifecycle.ForbiddenException("only admins may patch /verified")
    if (!userExists(wh, userId))
      throw new RunsLifecycle.NotFoundException(s"user $userId not found")

    // validate + fold the ops into column updates
    var updates = Map.empty[String, Any]
    ops.foreach {
      case ReplaceOp("/verified", v: Boolean) => updates += "verified" -> v
      case ReplaceOp("/email", v: String) =>
        val errs = emailMessages(v)
        if (errs.nonEmpty) throw new PatchValidationException(errs.mkString("; "))
        updates += "email" -> v
      case ReplaceOp("/password", v: String) =>
        val errs = passwordMessages(v, v)
        if (errs.nonEmpty) throw new PatchValidationException(errs.mkString("; "))
        updates += "hashedPassword" -> hashPassword(v)
      case other =>
        throw new PatchValidationException(
          s"op '${other.op}' on '${other.path}' is not allowed for users")
    }
    val ts = now()
    wh.rewrite(Warehouse.Users, df =>
      updates.foldLeft(
        df.withColumn("updateTimeUtc",
          when(col("id") === userId, lit(ts)).otherwise(col("updateTimeUtc")))) {
        case (d, (field, value)) =>
          d.withColumn(field,
            when(col("id") === userId, lit(value)).otherwise(col(field)))
      })
  }

  /** M6: hard delete by id. */
  def deleteUser(wh: Warehouse, requester: Records.User, userId: String): Unit = {
    if (!requester.isAdmin && requester.id != userId)
      throw new RunsLifecycle.ForbiddenException(
        s"user ${requester.id} cannot delete $userId")
    if (!userExists(wh, userId))
      throw new RunsLifecycle.NotFoundException(s"user $userId not found")
    wh.rewrite(Warehouse.Users, _.filter(col("id") =!= userId))
  }
}
