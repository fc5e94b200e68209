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

  test("matchesRule: RFC 9309 §2.2.3 wildcard battery") {
    val m = RobotsCodec.matchesRule _
    // plain prefix (no wildcards) — the pre-wildcard subset
    assert(m("/a/b", "/a/b/c") && !m("/a/b", "/a/x"))
    // '*' spans any run, including empty
    assert(m("/p/*.gif", "/p/x/y.gif.tmp"))
    assert(m("/p/*.gif", "/p/.gif"))
    assert(!m("/p/*.gif", "/p/x.png"))
    // consecutive '*'s collapse
    assert(m("/a**b", "/aXYb"))
    // '$' anchors the end
    assert(m("/a/b$", "/a/b") && !m("/a/b$", "/a/b/c"))
    assert(m("/p/*.gif$", "/p/x/y.gif") && !m("/p/*.gif$", "/p/x.gif.tmp"))
    // '*$' absorbs the tail
    assert(m("/dl/*$", "/dl/anything/at/all"))
    // greedy-with-suffix-check: the LAST occurrence must align
    assert(m("/a*b$", "/axbyb") && !m("/a*b$", "/axbyc"))
    // multi-gap anchored
    assert(m("/a*b*c$", "/aXbYcZc") && !m("/a*b*c$", "/aXcYb"))
  }

  test("likePattern translation agrees with matchesRule semantics") {
    assert(RobotsCodec.likePattern("/a/b") === "/a/b%")
    assert(RobotsCodec.likePattern("/a/b$") === "/a/b")
    assert(RobotsCodec.likePattern("/p/*.gif$") === "/p/%.gif")
    assert(RobotsCodec.likePattern("/p/*.gif") === "/p/%.gif%")
    // LIKE metacharacters in the rule are escaped, '*' still translates
    assert(RobotsCodec.likePattern("/100%_x/*$") === "/100\\%\\_x/%")
  }

  test("wildcard validation: '$' only as the final character") {
    reject("user-agent: *\ndisallow: /a$b\n", "final anchor")
    intercept[IllegalArgumentException] {
      RobotsCodec.build(Seq(RobotsCodec.RobotsGroup(Vector("*"),
        Vector((false, "/a$b")))))
    }
    // legal forms round-trip
    val g = Seq(RobotsCodec.RobotsGroup(Vector("*"),
      Vector((false, "/p/*.gif$"), (true, "/q/*"))))
    assert(RobotsCodec.parse(RobotsCodec.build(g)) === g)
  }

  test("evaluate: wildcard specificity is raw pattern length") {
    // '/page/*2$' (9 chars) beats '/page/1' (7) on a path both match
    val rules = Vector((false, "/page/*2$"), (true, "/page/1"))
    assert(RobotsCodec.evaluate(rules, "/page/12") ===
      ((false, Some("/page/*2$"))))
    // unanchored wildcard loses to a longer literal prefix
    val r2 = Vector((false, "/a/*"), (true, "/a/long/prefix"))
    assert(RobotsCodec.evaluate(r2, "/a/long/prefix/x") ===
      ((true, Some("/a/long/prefix"))))
  }
}
