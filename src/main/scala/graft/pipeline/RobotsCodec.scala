package graft.pipeline

/**
 * robots.txt — the crawl-politeness leg of the crawl-ingest family
 * (WARC containers → URL canonicalization → domain rollup → THIS):
 * the Robots Exclusion Protocol, RFC 9309, including the §2.2.3
 * special characters — `*` (matches any run of characters, empty
 * included) and `$` (end-of-path anchor, accepted only as the final
 * pattern character — a mid-pattern `$` is rejected rather than
 * silently treated as a literal, the strict-walker refusal of
 * ambiguity). Built and parsed in pure JVM strings like the container
 * codecs, with the same validating-walker discipline: this parser
 * targets files built by [[build]] and is deliberately strict where
 * real-crawl ingest would be lenient.
 *
 * Grammar accepted (RFC 9309 §2.2):
 *   - lines are LF- or CRLF-terminated (both appear in the wild and
 *     the RFC requires tolerating either); a stray CR elsewhere is
 *     malformed;
 *   - `#` starts a comment (to end of line); blank lines (after
 *     comment stripping) separate groups;
 *   - a group is one or more `User-agent:` lines followed by any
 *     number of `Allow:` / `Disallow:` rule lines; keys are
 *     case-insensitive; a rule line BEFORE any `User-agent:` line is
 *     malformed; an unknown key is malformed (strict-walker
 *     convention — real crawlers skip unknown keys);
 *   - an EMPTY `Disallow:` value is the spec's "nothing is disallowed"
 *     no-op — parsed and DROPPED (it must not participate in
 *     longest-match); an empty `Allow:` is equally a no-op;
 *   - a non-empty rule pattern must start with `/`; `*` may appear
 *     anywhere after it; `$` only at the very end.
 *
 * Matching semantics ([[evaluate]], RFC 9309 §2.2.2–2.2.3): among the
 * selected group's rules whose pattern MATCHES the URL path
 * ([[matchesRule]] — pattern is a path prefix with `*` gaps unless
 * `$`-anchored), the rule with the LONGEST pattern wins (octet count
 * of the raw pattern, `*`/`$` included — the reference-implementation
 * specificity); on a length tie Allow wins; no matching rule means
 * allowed. Group selection ([[selectGroup]]): all groups naming the
 * crawler's product token (case-insensitive) merge; if none do, all
 * `*` groups merge; a crawler matching no group is allowed everything
 * (empty rule set).
 */
object RobotsCodec {

  final case class RobotsGroup(agents: Vector[String],
      rules: Vector[(Boolean, String)]) // (isAllow, pathPrefix)

  /** Serialize groups — lowercase canonical keys, LF line endings, one
   * blank line between groups (byte-deterministic, [[parse]]-exact).
   * Validates at BUILD time everything parse would reject or silently
   * reinterpret (a '#' inside a value would come back as a comment, a
   * newline would inject lines, an empty rule path would be dropped as
   * the spec's no-op) — so build∘parse is the identity on accepted
   * input and a round-trip can never silently change rules. */
  def build(groups: Seq[RobotsGroup]): String = {
    def cleanValue(v: String, what: String): Unit = {
      require(v.nonEmpty, s"empty $what")
      require(!v.exists(c => c == '#' || c == '\n' || c == '\r'),
        s"$what '$v' contains '#' or a line break — unserializable")
    }
    groups.map { g =>
      require(g.agents.nonEmpty, "group with no user-agent")
      g.agents.foreach(cleanValue(_, "user-agent"))
      g.rules.foreach { case (_, p) =>
        cleanValue(p, "rule path")
        require(p.startsWith("/"), s"rule path must start with '/': '$p'")
        require(!p.init.contains('$'),
          s"'$$' is only valid as the final anchor character: '$p'")
      }
      (g.agents.map(a => s"user-agent: $a") ++
        g.rules.map { case (allow, p) =>
          s"${if (allow) "allow" else "disallow"}: $p" })
        .mkString("", "\n", "\n")
    }.mkString("\n")
  }

  /** Validating parse; IllegalArgumentException on ANY malformed
   * input. Empty-path rules (the spec's no-ops) are dropped here. */
  def parse(text: String): Seq[RobotsGroup] = {
    require(!text.replace("\r\n", "\n").contains('\r'),
      "stray CR outside a CRLF line ending")
    val out = Seq.newBuilder[RobotsGroup]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var inGroup = false
    def flush(): Unit = {
      if (inGroup) out += RobotsGroup(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inGroup = false
    }
    for (raw <- text.replace("\r\n", "\n").split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.isEmpty) {
        // only a genuinely BLANK line separates groups; a comment-only
        // line is ignored entirely (RFC 9309 — an interior '# note'
        // line must not split the group it sits inside)
        if (raw.trim.isEmpty) flush()
      } else {
        val ci = line.indexOf(':')
        require(ci > 0, s"malformed robots line '$raw'")
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            require(value.nonEmpty, "empty user-agent")
            // a user-agent line after rules starts a NEW group (RFC
            // groups are agent-lines-then-rules)
            if (rules.nonEmpty) flush()
            agents :+= value
            inGroup = true
          case "allow" | "disallow" =>
            require(inGroup, s"rule before any user-agent: '$raw'")
            if (value.nonEmpty) {
              require(value.startsWith("/"),
                s"rule path must start with '/': '$raw'")
              require(!value.init.contains('$'),
                s"'$$' is only valid as the final anchor character: '$raw'")
              rules :+= (key == "allow", value)
            } // empty value = the spec's no-op, dropped
          case other =>
            throw new IllegalArgumentException(
              s"unknown robots key '$other'")
        }
      }
    }
    flush()
    out.result()
  }

  /** Merged rule set for a crawler: exact product-token groups if any
   * (case-insensitive), else the `*` groups, else no rules. */
  def selectGroup(groups: Seq[RobotsGroup], agent: String)
      : Vector[(Boolean, String)] = {
    val la = agent.toLowerCase
    val exact = groups.filter(_.agents.exists(_.toLowerCase == la))
    val chosen = if (exact.nonEmpty) exact
      else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules).toVector
  }

  /** RFC 9309 §2.2.3 pattern match: `*` matches any run of characters
   * (empty included); a final `$` anchors the pattern to the path end;
   * without it the pattern matches any path it PREFIXES (an implicit
   * trailing `*`). Literal segments between `*`s match greedily
   * left-to-right — correct for this prefix-anchored/suffix-checked
   * pattern class, and exactly the semantics of SQL LIKE after
   * [[likePattern]]'s translation (which is how the relational engine
   * evaluates it). A pattern with no wildcards degrades to
   * startsWith / equality, the pre-wildcard subset. */
  def matchesRule(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1).toIndexedSeq
    if (!path.startsWith(parts.head)) return false
    var pos = parts.head.length
    val mids =
      if (anchored && parts.length > 1) parts.tail.init else parts.tail
    for (seg <- mids if seg.nonEmpty) {
      val i = path.indexOf(seg, pos)
      if (i < 0) return false
      pos = i + seg.length
    }
    if (!anchored) true
    else if (parts.length == 1) pos == path.length
    else {
      val last = parts.last
      last.isEmpty ||
        (path.length - last.length >= pos && path.endsWith(last))
    }
  }

  /** The SQL-LIKE form of a rule pattern — LIKE metacharacters
   * (`%`, `_`, `\`) escaped with `\`, `*` → `%`, the `$` anchor
   * dropped, a trailing `%` appended when unanchored — so a relational
   * engine evaluates [[matchesRule]] as ONE LIKE predicate (codegen'd,
   * broadcast-joinable) instead of a per-row JVM call. Spark's LIKE
   * escape defaults to `\`; DuckDB needs an explicit ESCAPE '\'. */
  def likePattern(p: String): String = {
    val anchored = p.endsWith("$")
    val core = (if (anchored) p.dropRight(1) else p)
      .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace("*", "%")
    if (anchored) core else core + "%"
  }

  /** RFC 9309 §2.2.2 verdict: (allowed, winning rule pattern or None).
   * Longest matching pattern wins (raw octet count, wildcards
   * included); ties go to Allow; ties beyond that to the
   * lexicographically smallest pattern (determinism — the RFC leaves
   * it open, both engines must agree). No match → allowed. */
  def evaluate(rules: Seq[(Boolean, String)], path: String)
      : (Boolean, Option[String]) = {
    val hits = rules.filter { case (_, p) => matchesRule(p, path) }
    if (hits.isEmpty) (true, None)
    else {
      val (allow, p) = hits.minBy { case (a, p) =>
        (-p.length, if (a) 0 else 1, p) }
      (allow, Some(p))
    }
  }
}
