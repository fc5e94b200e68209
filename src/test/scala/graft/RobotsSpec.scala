package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.RobotsCodec
import graft.pipeline.RobotsCodec.RobotsGroup

/** RobotsCodec: build/parse round-trip, the rejection battery (the
 * container-family convention), group selection, and the RFC 9309
 * longest-match evaluation rules. */
class RobotsSpec extends AnyFunSuite {

  private val two = Seq(
    RobotsGroup(Vector("*"), Vector((false, "/private"), (true, "/private/ok"))),
    RobotsGroup(Vector("graftbot", "otherbot"), Vector((false, "/"))))

  test("build/parse round-trips groups, agents, and rule order") {
    assert(RobotsCodec.parse(RobotsCodec.build(two)) === two)
  }

  test("parse: comments, CRLF, blank-line separation, case-insensitivity") {
    val txt = "User-Agent: *  # main group\r\n" +
      "Disallow: /a\r\n" +
      "ALLOW: /a/b\r\n" +
      "\r\n" +
      "user-agent: GraftBot\r\n" +
      "disallow: /\r\n"
    val got = RobotsCodec.parse(txt)
    assert(got === Seq(
      RobotsGroup(Vector("*"), Vector((false, "/a"), (true, "/a/b"))),
      RobotsGroup(Vector("GraftBot"), Vector((false, "/")))))
  }

  test("parse: an interior comment-only line does NOT split its group") {
    val got = RobotsCodec.parse(
      "user-agent: *\n# block the private tree\ndisallow: /x\n")
    assert(got === Seq(RobotsGroup(Vector("*"), Vector((false, "/x")))))
  }

  test("build validates what parse would reject or reinterpret") {
    def rejectBuild(g: RobotsGroup, hint: String): Unit = {
      val ex = intercept[IllegalArgumentException](
        RobotsCodec.build(Seq(g)))
      assert(ex.getMessage.toLowerCase.contains(hint),
        s"message '${ex.getMessage}' lacks '$hint'")
    }
    // '#' in a value would come back as a comment on re-parse
    rejectBuild(RobotsGroup(Vector("*"), Vector((false, "/a#b"))),
      "unserializable")
    // a newline would inject lines
    rejectBuild(RobotsGroup(Vector("a\nb"), Vector.empty),
      "unserializable")
    // rules-only stanza parses as "rule before any user-agent"
    rejectBuild(RobotsGroup(Vector.empty, Vector((false, "/x"))),
      "no user-agent")
    // empty path would be silently dropped as the spec's no-op
    rejectBuild(RobotsGroup(Vector("*"), Vector((false, ""))),
      "empty rule path")
    rejectBuild(RobotsGroup(Vector("*"), Vector((false, "x"))),
      "start with '/'")
  }

  test("parse: empty Disallow/Allow are the spec's no-ops, dropped") {
    val got = RobotsCodec.parse(
      "user-agent: *\ndisallow:\nallow:\ndisallow: /x\n")
    assert(got === Seq(RobotsGroup(Vector("*"), Vector((false, "/x")))))
  }

  test("parse: a user-agent line after rules starts a new group") {
    val got = RobotsCodec.parse(
      "user-agent: a\ndisallow: /x\nuser-agent: b\ndisallow: /y\n")
    assert(got.map(_.agents) === Seq(Vector("a"), Vector("b")))
  }

  private def reject(txt: String, hint: String): Unit = {
    val ex = intercept[IllegalArgumentException](RobotsCodec.parse(txt))
    assert(ex.getMessage.toLowerCase.contains(hint),
      s"message '${ex.getMessage}' lacks '$hint'")
  }

  test("parse rejections: rule before group, unknown key, bad path, CR") {
    reject("disallow: /x\n", "before any user-agent")
    reject("user-agent: *\ncrawl-delay: 5\n", "unknown robots key")
    reject("user-agent: *\ndisallow: x\n", "start with '/'")
    reject("user-agent: *\rdisallow: /x\n", "stray cr")
    reject("user-agent: *\njunk line\n", "malformed")
    reject("user-agent:\n", "empty user-agent")
  }

  test("selectGroup: exact token (case-insensitive) beats *, merges") {
    assert(RobotsCodec.selectGroup(two, "GRAFTBOT") === Vector((false, "/")))
    assert(RobotsCodec.selectGroup(two, "unknownbot") ===
      Vector((false, "/private"), (true, "/private/ok")))
    assert(RobotsCodec.selectGroup(two.take(0), "x") === Vector.empty)
  }

  test("evaluate: longest prefix wins, tie goes to Allow, default allow") {
    val rules = Vector((false, "/a"), (true, "/a/b"), (false, "/a/b"))
    // longest match: /a/b rules (Allow and Disallow tie on length ->
    // Allow wins)
    assert(RobotsCodec.evaluate(rules, "/a/b/c") === ((true, Some("/a/b"))))
    // only /a matches
    assert(RobotsCodec.evaluate(rules, "/a/x") === ((false, Some("/a"))))
    // prefix gotcha: /a matches /about too (string prefix, per spec)
    assert(RobotsCodec.evaluate(rules, "/about") === ((false, Some("/a"))))
    // nothing matches
    assert(RobotsCodec.evaluate(rules, "/z") === ((true, None)))
    assert(RobotsCodec.evaluate(Vector.empty, "/a") === ((true, None)))
  }
}
