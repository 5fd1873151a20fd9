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
      rules: List[(Boolean, String)])

  private def parse(robots: String): List[Group] = {
    var groups = List.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups = Group(agents.reverse, rules.reverse) :: groups
      agents = Nil; rules = Nil
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
          case _ => // Crawl-delay, Sitemap, ...: ignored. RFC 9309 closes a
            // user-agent group only on RULE lines — an unknown field between
            // consecutive User-agent lines must NOT split the group, so
            // "User-agent: a / Sitemap: s / User-agent: b / Disallow: /x"
            // gives BOTH agents the Disallow.
        }
      }
    }
    flush()
    groups.reverse
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
