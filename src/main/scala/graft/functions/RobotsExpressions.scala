package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `robots_allowed(robots_txt, path)` for a fixed agent — the crawl
  * politeness gate: evaluate a robots.txt (the public 1994 Robots
  * Exclusion Protocol, RFC 9309's core without the `*`/`$` wildcard
  * extension — rules are PATH PREFIXES) against a path+query and decide
  * fetchability.
  *
  * Parsing: lines split on \n, `#` comments stripped, `field: value`
  * records with case-insensitive field names; consecutive `User-agent`
  * lines open a group, `Allow`/`Disallow` rules bind to the open group, a
  * `User-agent` after rules starts a new group; unknown fields
  * (Crawl-delay, Sitemap, ...) are ignored; an empty Disallow value is no
  * restriction.
  *
  * Group selection (RFC 9309 §2.2.1): the union of groups whose agent
  * token equals the crawler's token case-insensitively; if none match,
  * the union of `*` groups; if neither exists, everything is allowed —
  * and a specific group SHADOWS the `*` group entirely (a `*` Disallow
  * does not leak into a crawler that has its own group).
  *
  * Decision (RFC 9309 §2.2.2): among matching rules (path starts with the
  * rule value) the LONGEST rule wins; equal lengths resolve to Allow; no
  * matching rule means allowed. Null/garbage robots text degrades to
  * allowed (a crawler that cannot read robots.txt treats 4xx as
  * allow-all), never an error. */
object RobotsCodec {

  private final case class Group(agents: List[String],
      rules: List[(Boolean, String)], delay: Long)

  private def parse(robots: String): List[Group] = parseAll(robots)._1

  /** (groups, sitemaps). Crawl-delay (the de-facto Bing/Yandex extension,
    * not in RFC 9309) is GROUP-SCOPED: the first valid value seen in a
    * group sticks; -1 = absent. Sitemap is GLOBAL (its spec says location
    * independent) and collected in document order. Neither closes a
    * user-agent group — RFC 9309 closes groups only on RULE lines. */
  private def parseAll(robots: String): (List[Group], List[String]) = {
    var groups = List.empty[Group]
    var sitemaps = List.empty[String]
    var agents = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var delay = -1L
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups = Group(agents.reverse, rules.reverse, delay) :: groups
      agents = Nil; rules = Nil; delay = -1L
    }
    robots.split("\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            agents = value.toLowerCase(Locale.ROOT) :: agents
          case "allow" =>
            inAgents = false
            if (value.nonEmpty) rules = (true, value) :: rules
          case "disallow" =>
            inAgents = false
            if (value.nonEmpty) rules = (false, value) :: rules
          case "crawl-delay" =>
            // group content, but NOT a group-closing rule line; first
            // valid value wins, garbage is ignored (allow-on-broken).
            // Fractional delays ("Crawl-delay: 0.5" — accepted in the
            // wild by Bing/Yandex) round UP: politeness never rounds
            // toward impoliteness.
            if (delay < 0)
              try {
                val v = value.toDouble
                if (v >= 0 && !v.isNaN && !v.isInfinity)
                  delay = math.ceil(v).toLong
              } catch { case _: NumberFormatException => }
          case "sitemap" =>
            if (value.nonEmpty) sitemaps = value :: sitemaps
          case _ => // other unknown fields: ignored. RFC 9309 closes a
            // user-agent group only on RULE lines — an unknown field between
            // consecutive User-agent lines must NOT split the group, so
            // "User-agent: a / Sitemap: s / User-agent: b / Disallow: /x"
            // gives BOTH agents the Disallow.
        }
      }
    }
    flush()
    (groups.reverse, sitemaps.reverse)
  }

  def allowed(robots: String, agent: String, pathq: String): Boolean = {
    if (robots == null || pathq == null) return true
    val groups = parse(robots)
    if (groups.isEmpty) return true
    val tok = if (agent == null) "" else agent.toLowerCase(Locale.ROOT)
    val specific = groups.filter(_.agents.contains(tok))
    val chosen =
      if (specific.nonEmpty) specific else groups.filter(_.agents.contains("*"))
    if (chosen.isEmpty) return true
    var bestLen = -1
    var bestAllow = true
    chosen.iterator.flatMap(_.rules).foreach { case (allow, p) =>
      if (pathq.startsWith(p)) {
        if (p.length > bestLen || (p.length == bestLen && allow)) {
          bestLen = p.length; bestAllow = allow
        }
      }
    }
    bestAllow
  }

  def allowedU8(robots: UTF8String, agent: UTF8String, pathq: UTF8String): Boolean =
    allowed(robots.toString, if (agent == null) "" else agent.toString,
      pathq.toString)

  /** Effective Crawl-delay seconds for `agent` — the politeness interval
    * a scheduler leaves between fetches to one host. Group selection is
    * [[allowed]]'s (specific groups shadow `*`); among the chosen groups
    * the first declared delay wins; -1 = no delay declared (or unreadable
    * robots — the caller applies its own default). */
  def crawlDelay(robots: String, agent: String): Long = {
    if (robots == null) return -1L
    val groups = parse(robots)
    if (groups.isEmpty) return -1L
    val tok = if (agent == null) "" else agent.toLowerCase(Locale.ROOT)
    val specific = groups.filter(_.agents.contains(tok))
    val chosen =
      if (specific.nonEmpty) specific else groups.filter(_.agents.contains("*"))
    chosen.find(_.delay >= 0).map(_.delay).getOrElse(-1L)
  }

  def crawlDelayU8(robots: UTF8String, agent: UTF8String): Long =
    crawlDelay(robots.toString, if (agent == null) "" else agent.toString)

  /** All Sitemap URLs in document order (the directive is global per its
    * spec — not scoped to any user-agent group). Empty array when none. */
  def sitemaps(robots: String): Array[String] =
    if (robots == null) Array.empty
    else parseAll(robots)._2.toArray

  def sitemapsU8(robots: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sitemaps(robots.toString).map(s => UTF8String.fromString(s))
        .toArray[Any])
}

/** Catalyst expression for [[RobotsCodec.allowed]] — codegen'd; the agent
  * token rides as a reference object (it is per-crawler config, not data).
  * Standard null semantics: a null robots text or path yields null (query
  * sides filter their inputs; the allow-on-4xx policy is the CALLER's
  * coalesce, kept out of the kernel so the gate is honest about unknowns). */
case class RobotsAllowed(left: Expression, right: Expression, agent: String)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_allowed"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType, StringType)

  override def nullSafeEval(robots: Any, pathq: Any): Any =
    RobotsCodec.allowed(robots.asInstanceOf[UTF8String].toString,
      agent, pathq.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    defineCodeGen(ctx, ev, (r, p) =>
      s"graft.functions.RobotsCodec.allowed($r.toString(), $agentRef, $p.toString())")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** `robots_crawl_delay(robots_txt)` for a fixed agent — the group-scoped
  * politeness interval ([[RobotsCodec.crawlDelay]]; -1 = none declared). */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType)

  override def nullSafeEval(robots: Any): Any =
    RobotsCodec.crawlDelay(robots.asInstanceOf[UTF8String].toString, agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    defineCodeGen(ctx, ev, r =>
      s"graft.functions.RobotsCodec.crawlDelay($r.toString(), $agentRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `robots_sitemaps(robots_txt)` — every Sitemap URL in document order
  * (global directive, not group-scoped). */
case class RobotsSitemaps(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "robots_sitemaps"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType)

  override def nullSafeEval(robots: Any): Any =
    RobotsCodec.sitemapsU8(robots.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r =>
      s"graft.functions.RobotsCodec.sitemapsU8($r)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
