package graft.selector

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    // (id, flag, tags, owner, deleted)
    (1L, "a", Seq("x", "y"), "u1", Option.empty[String]),
    (2L, "b", Seq("y"), "u2", None),
    (3L, null.asInstanceOf[String], Seq.empty[String], "u1", Some("2024-01-01")),
    (4L, "a", Seq("z"), "u2", None)
  ).toDF("id", "flag", "tags", "owner", "deleted")

  private def ids(sel: Selector): Set[Long] =
    df.filter(sel.toColumn).select("id").as[Long].collect().toSet

  "OneMatchOne" should "match scalar equality" in {
    ids(OneMatchOne("flag", "a")) shouldBe Set(1L, 4L)
  }

  "OneOptMatchOne" should "be a no-op when the value is absent" in {
    ids(OneOptMatchOne("flag", None)) shouldBe Set(1L, 2L, 3L, 4L)
    ids(OneOptMatchOne("flag", Some("b"))) shouldBe Set(2L)
  }

  "OneInMany" should "match array containment" in {
    ids(OneInMany("tags", "y")) shouldBe Set(1L, 2L)
  }

  "OneOptInMany" should "guard on the option" in {
    ids(OneOptInMany("tags", None)) shouldBe Set(1L, 2L, 3L, 4L)
    ids(OneOptInMany("tags", Some("z"))) shouldBe Set(4L)
  }

  "ManyContainOne" should "treat an empty set as a no-op" in {
    ids(ManyContainOne("flag", Seq.empty)) shouldBe Set(1L, 2L, 3L, 4L)
    ids(ManyContainOne("flag", Seq("a", "b"))) shouldBe Set(1L, 2L, 4L)
  }

  "ManyIntersectMany" should "match any-overlap and no-op on empty" in {
    ids(ManyIntersectMany("tags", Seq.empty)) shouldBe Set(1L, 2L, 3L, 4L)
    ids(ManyIntersectMany("tags", Seq("x", "z"))) shouldBe Set(1L, 4L)
  }

  "Not" should "match rows whose attribute is null (Mongo \\$not semantics)" in {
    // row 3 has flag = null: a SQL !(flag = 'a') would drop it; the
    // reference's negated query matches documents lacking the field.
    ids(Not(OneMatchOne("flag", "a"))) shouldBe Set(2L, 3L)
  }

  "combineAnd" should "conjoin and select-all on empty" in {
    df.filter(Selector.combineAnd(Seq.empty)).count() shouldBe 4
    df.filter(Selector.combineAnd(Seq(
      OneMatchOne("flag", "a"), OneMatchOne("owner", "u2")))).count() shouldBe 1
  }

  "fromLibType" should "compile to the isPaired predicate" in {
    val lib = Seq((1L, true), (2L, false)).toDF("id", "isPaired")
    lib.filter(Selector.fromLibType(Some(Selector.Paired)).toColumn)
      .select("id").as[Long].collect().toSet shouldBe Set(1L)
    lib.filter(Selector.fromLibType(None).toColumn).count() shouldBe 2
  }

  "visibility" should "scope non-admins to their own rows" in {
    ids(Selector.visibility("u1", isAdmin = false, attr = "owner")) shouldBe Set(1L, 3L)
    ids(Selector.visibility("u1", isAdmin = true, attr = "owner")) shouldBe Set(1L, 2L, 3L, 4L)
  }

  "notDeleted" should "exclude tombstoned rows" in {
    ids(Selector.notDeleted("deleted")) shouldBe Set(1L, 2L, 4L)
  }
}
