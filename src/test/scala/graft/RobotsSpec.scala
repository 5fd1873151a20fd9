package graft

import graft.functions.RobotsCodec

/** RFC 9309 core-semantics contracts for the x90 robots gate. */
class RobotsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val txt =
    """# sample
      |User-agent: graftbot
      |Disallow: /page/
      |Allow: /page/1
      |
      |User-agent: *
      |Disallow: /asset/
      |Disallow: /doc/
      |Crawl-delay: 2
      |""".stripMargin

  private def bot(p: String) = RobotsCodec.allowed(txt, "graftbot", p)
  private def any(p: String) = RobotsCodec.allowed(txt, "OtherBot", p)

  test("longest match wins; Allow wins ties") {
    assert(!bot("/page/5/"))
    assert(bot("/page/15/"), "Allow /page/1 (len 7) outranks Disallow /page/ (len 6)")
    assert(bot("/page/1"))
    // tie: Allow and Disallow of equal length -> Allow
    val tie = "User-agent: *\nDisallow: /x\nAllow: /x\n"
    assert(RobotsCodec.allowed(tie, "anybot", "/x/y"))
  }

  test("a specific group shadows '*' entirely") {
    assert(bot("/doc/5?a=1"), "'*' Disallow /doc/ must not leak into graftbot")
    assert(bot("/asset/1.png"))
    assert(!any("/doc/5?a=1"))
    assert(!any("/asset/1.png"))
    assert(any("/page/5/"), "'*' has no /page rule")
  }

  test("agent token match is case-insensitive and exact") {
    assert(!RobotsCodec.allowed(txt, "GRAFTBOT", "/page/5/"))
    // a different token falls to '*'
    assert(RobotsCodec.allowed(txt, "graftbot2", "/page/5/"))
  }

  test("no matching group, empty/garbage robots, unknown fields => allowed") {
    assert(RobotsCodec.allowed("User-agent: onlybot\nDisallow: /", "me", "/x"))
    assert(RobotsCodec.allowed("", "me", "/x"))
    assert(RobotsCodec.allowed("complete garbage\nno colons here", "me", "/x"))
    assert(RobotsCodec.allowed("Sitemap: https://x/s.xml", "me", "/x"))
    assert(RobotsCodec.allowed(null, "me", "/x"))
    // empty Disallow value = no restriction (classic REP)
    assert(RobotsCodec.allowed("User-agent: *\nDisallow:\n", "me", "/x"))
  }

  test("multiple groups for the same agent union their rules") {
    val multi =
      "User-agent: a\nDisallow: /one\n\nUser-agent: a\nDisallow: /two\n"
    assert(!RobotsCodec.allowed(multi, "a", "/one/x"))
    assert(!RobotsCodec.allowed(multi, "a", "/two/x"))
    assert(RobotsCodec.allowed(multi, "a", "/three"))
  }

  test("comments strip; consecutive user-agent lines share one group") {
    val shared =
      "User-agent: a # primary\nUser-agent: b\nDisallow: /x # block\n"
    assert(!RobotsCodec.allowed(shared, "a", "/x/1"))
    assert(!RobotsCodec.allowed(shared, "b", "/x/1"))
  }

  test("crawl-delay: group-scoped, shadowed like rules, first value wins, " +
      "garbage ignored, absent = -1") {
    val both = "User-agent: graftbot\nCrawl-delay: 3\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 2\nDisallow: /y\n"
    assert(RobotsCodec.crawlDelay(both, "graftbot") === 3L)
    assert(RobotsCodec.crawlDelay(both, "GRAFTBOT") === 3L, "token case-fold")
    assert(RobotsCodec.crawlDelay(both, "otherbot") === 2L, "* fallback")
    // the crawler's own group SHADOWS * even when it declares no delay
    val shadow = "User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 2\n"
    assert(RobotsCodec.crawlDelay(shadow, "graftbot") === -1L)
    // first valid value wins; garbage values are ignored
    assert(RobotsCodec.crawlDelay(
      "User-agent: a\nCrawl-delay: nope\nCrawl-delay: 5\nCrawl-delay: 9\n",
      "a") === 5L)
    assert(RobotsCodec.crawlDelay("", "a") === -1L)
    assert(RobotsCodec.crawlDelay(null, "a") === -1L)
    // a crawl-delay between User-agent lines neither splits the group nor
    // escapes it
    val mid = "User-agent: a\nCrawl-delay: 7\nUser-agent: b\nDisallow: /x\n"
    assert(RobotsCodec.crawlDelay(mid, "a") === 7L)
    assert(RobotsCodec.crawlDelay(mid, "b") === 7L)
    // fractional delays (Bing/Yandex accept them in the wild) round UP —
    // politeness never rounds toward impoliteness; they are VALID values,
    // not garbage, so they also satisfy "first value wins"
    assert(RobotsCodec.crawlDelay("User-agent: a\nCrawl-delay: 0.5\n", "a")
      === 1L)
    assert(RobotsCodec.crawlDelay(
      "User-agent: a\nCrawl-delay: 2.25\nCrawl-delay: 9\n", "a") === 3L)
    assert(RobotsCodec.crawlDelay("User-agent: a\nCrawl-delay: 4.0\n", "a")
      === 4L)
    // non-finite and negative numerics stay garbage (allow-on-broken)
    assert(RobotsCodec.crawlDelay("User-agent: a\nCrawl-delay: NaN\n", "a")
      === -1L)
    assert(RobotsCodec.crawlDelay("User-agent: a\nCrawl-delay: Infinity\n",
      "a") === -1L)
    assert(RobotsCodec.crawlDelay("User-agent: a\nCrawl-delay: -2\n", "a")
      === -1L)
  }

  test("sitemaps: global, document order, empty when none") {
    val txt = "Sitemap: https://x/s1.xml\nUser-agent: a\nDisallow: /\n" +
      "Sitemap: https://x/s2.xml\n"
    assert(RobotsCodec.sitemaps(txt).toSeq ===
      Seq("https://x/s1.xml", "https://x/s2.xml"))
    assert(RobotsCodec.sitemaps("User-agent: *\nDisallow:\n").isEmpty)
    assert(RobotsCodec.sitemaps(null).isEmpty)
  }

  test("an unknown field between User-agent lines does not split the group") {
    // RFC 9309: groups close only on RULE lines — a Sitemap/Crawl-delay
    // between consecutive User-agent lines leaves both agents in ONE group
    // sharing the rules (ADVICE r15).
    val txt = "User-agent: a\nSitemap: https://x/s.xml\n" +
      "User-agent: b\nDisallow: /x\n"
    assert(!RobotsCodec.allowed(txt, "a", "/x/1"),
      "agent a must inherit the group's Disallow")
    assert(!RobotsCodec.allowed(txt, "b", "/x/1"))
    assert(RobotsCodec.allowed(txt, "a", "/y"))
    // but a rule line still closes the group: a later User-agent starts fresh
    val closed = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert(RobotsCodec.allowed(closed, "a", "/y/1"))
    assert(!RobotsCodec.allowed(closed, "b", "/y/1"))
  }
}
