package graft.lifecycle

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** [[Bcrypt]] against jBCrypt's published test vectors (the reference's
  * hashing library, `models/User.scala:77`) — wire-format compatibility
  * is the point: a hash minted by the reference verifies here and vice
  * versa. Vectors are from jBCrypt's own TestBCrypt table. */
class BcryptSpec extends AnyFlatSpec with Matchers {

  "Bcrypt" should "reproduce jBCrypt's published test vectors" in {
    Bcrypt.hashpw("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.") shouldBe
      "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."
    Bcrypt.hashpw("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO") shouldBe
      "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"
    // same salt + same password ⇒ byte-identical hash (determinism)
    Bcrypt.hashpw("abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu") shouldBe
      Bcrypt.hashpw("abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu")
  }

  it should "emit the reference's format and verify round-trip" in {
    val h = Bcrypt.hashpw("Abc123", Bcrypt.gensalt(6))
    h should fullyMatch regex """\$2a\$06\$[./A-Za-z0-9]{53}"""
    Bcrypt.checkpw("Abc123", h) shouldBe true
    Bcrypt.checkpw("Abc124", h) shouldBe false
    Bcrypt.checkpw("", h) shouldBe false
    Bcrypt.checkpw("Abc123", "not-a-hash") shouldBe false
  }

  it should "treat passwords as UTF-8 with the $2a$ null terminator" in {
    val h = Bcrypt.hashpw("pässwörd→", Bcrypt.gensalt(5))
    Bcrypt.checkpw("pässwörd→", h) shouldBe true
    Bcrypt.checkpw("passwort", h) shouldBe false
  }

  it should "back UsersOps hashing with old-format verification intact" in {
    val stored = UsersOps.hashPassword("Abc123")
    stored should startWith("$2a$")
    UsersOps.verifyPassword("Abc123", stored) shouldBe true
    UsersOps.verifyPassword("nope", stored) shouldBe false
  }
}
