package graft.sources.replay

import java.io.IOException

import org.apache.spark.sql.functions._

/** SASL/PLAIN + TLS on the Kafka wire client (VERDICT r9 #5) — the
  * reference gets both free from librdkafka's config passthrough
  * (tests/utils.rs:261-285); here they ride the same `consumer.*` option
  * seam: `consumer.security.protocol`, `consumer.sasl.mechanism`,
  * `consumer.sasl.username/password`, `consumer.ssl.truststore.location/
  * password`. The broker double gains a SASL-gated listener (handshake v1 +
  * authenticate v0, per-connection session state, error 58 on bad
  * credentials, connection kill on pre-auth API use) and a TLS listener
  * from a PKCS12 keystore, so every path is proven over real sockets with
  * a real JDK TLS handshake — no broker library anywhere. The plaintext
  * path stays byte-identical (KafkaWireSpec/KafkaCodecSpec run unchanged).
  */
class KafkaSecuritySpec extends graft.SparkSpec {

  private val user = "alice"
  private val pass = "s3cret"

  /** Self-signed broker keystore + client truststore, generated once via
    * the JDK's keytool (what a real deployment's cert tooling produces). */
  private lazy val tls: (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("kafka-tls")
    val ks = dir.resolve("broker.p12").toString
    val ts = dir.resolve("trust.p12").toString
    val cert = dir.resolve("broker.crt").toString
    val storePass = "graft-test"
    val keytool = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "keytool").toString
    def run(args: String*): Unit = {
      val p = new ProcessBuilder((keytool +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8")
      assert(p.waitFor() == 0, s"keytool ${args.head} failed: $out")
    }
    run("-genkeypair", "-alias", "broker", "-keyalg", "RSA", "-keysize",
      "2048", "-validity", "1", "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", storePass, "-dname", "CN=127.0.0.1",
      "-ext", "SAN=IP:127.0.0.1")
    run("-exportcert", "-alias", "broker", "-keystore", ks,
      "-storepass", storePass, "-file", cert)
    run("-importcert", "-alias", "broker", "-file", cert, "-keystore", ts,
      "-storepass", storePass, "-noprompt")
    (ks, ts, storePass)
  }

  private def readAll(path: String, extra: (String, String)*): Set[org.apache.spark.sql.Row] = {
    var r = spark.read.format("graft-replay")
      .option("client", "kafka").option("path", path)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
      .select(col("partition"), col("offset"), col("key").cast("string"),
        col("value").cast("string"), col("timestamp").cast("long"))
      .collect().toSet
  }

  test("SASL/PLAIN authenticates through the consumer.* option seam") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val open = new KafkaLogServer(dir, "events")
    val gated = new KafkaLogServer(dir, "events", sasl = Some((user, pass)))
    try {
      val got = readAll(gated.clientPath,
        "consumer.security.protocol" -> "SASL_PLAINTEXT",
        "consumer.sasl.mechanism" -> "PLAIN",
        "consumer.sasl.username" -> user,
        "consumer.sasl.password" -> pass)
      assert(got.nonEmpty)
      assert(got === readAll(open.clientPath),
        "authenticated read must equal the open-listener read")
    } finally { open.close(); gated.close() }
  }

  test("KIP-368: a long-lived cursor re-authenticates across the session " +
      "lifetime; a client that skips re-auth is killed by the broker") {
    val dir = ReplayLog.ensureLog(spark, sf)
    // 700 ms session lifetime, 7-record batches → a full-partition drain
    // takes many fetches and MUST cross the lifetime at least once
    val gated = new KafkaLogServer(dir, "events", batchRecords = 7,
      sasl = Some((user, pass)), maxReauthMs = 700L)
    try {
      val saslConf = Map(
        "security.protocol" -> "SASL_PLAINTEXT",
        "sasl.mechanism" -> "PLAIN",
        "sasl.username" -> user, "sasl.password" -> pass)
      def drain(c: KafkaLogClient): Seq[Long] = {
        val p = c.listPartitions().head
        val end = c.endOffset(p)
        assert(end > 21, "need several fetches to cross the lifetime")
        val frames = c.openFrames(p, 0L, needKey = false, needValue = false)
        try {
          val out = Seq.newBuilder[Long]
          var slept = false
          while (frames.readFrameBefore(end)) {
            out += frames.frameOffset
            if (!slept && frames.frameOffset == 10L) {
              Thread.sleep(1000)        // past the 700 ms lifetime
              slept = true
            }
          }
          out.result()
        } finally frames.close()
      }
      // re-authenticating client: the drain crosses the lifetime and
      // survives (maybeReauth re-runs handshake+authenticate in place)
      val c = new KafkaLogClient(gated.clientPath, saslConf)
      val got = drain(c)
      assert(got === (0L until got.length.toLong),
        "re-auth must lose or duplicate nothing")
      // control: the same client with re-auth disabled is KILLED by the
      // broker after the lifetime — proving the enforcement (and that the
      // positive path's survival came from real re-authentication)
      val dis = new KafkaLogClient(gated.clientPath,
        saslConf + ("sasl.disable.reauth" -> "true"))
      val e = intercept[Exception](drain(dis))
      assert(e.isInstanceOf[IOException] ||
        e.isInstanceOf[java.io.EOFException],
        s"expected the broker to kill the expired session, got $e")
    } finally gated.close()
  }

  test("wrong password fails loudly with the broker's error 58") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val gated = new KafkaLogServer(dir, "events", sasl = Some((user, pass)))
    try {
      val c = new KafkaLogClient(gated.clientPath, Map(
        "security.protocol" -> "SASL_PLAINTEXT",
        "sasl.username" -> user, "sasl.password" -> "wrong"))
      val e = intercept[IOException] { c.listPartitions() }
      assert(e.getMessage.contains("authentication failed"),
        s"expected an authentication error, got: ${e.getMessage}")
    } finally gated.close()
  }

  test("SASL/SCRAM-SHA-256 and -512: full RFC 5802 exchange authenticates") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val open = new KafkaLogServer(dir, "events")
    val gated = new KafkaLogServer(dir, "events", sasl = Some((user, pass)))
    try {
      val expected = readAll(open.clientPath)
      Seq("SCRAM-SHA-256", "SCRAM-SHA-512").foreach { mech =>
        val got = readAll(gated.clientPath,
          "consumer.security.protocol" -> "SASL_PLAINTEXT",
          "consumer.sasl.mechanism" -> mech,
          "consumer.sasl.username" -> user,
          "consumer.sasl.password" -> pass)
        assert(got.nonEmpty && got === expected,
          s"$mech read must equal the open-listener read")
      }
    } finally { open.close(); gated.close() }
  }

  test("SCRAM wrong password is rejected at the client-final leg (error 58)") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val gated = new KafkaLogServer(dir, "events", sasl = Some((user, pass)))
    try {
      val c = new KafkaLogClient(gated.clientPath, Map(
        "security.protocol" -> "SASL_PLAINTEXT",
        "sasl.mechanism" -> "SCRAM-SHA-256",
        "sasl.username" -> user, "sasl.password" -> "wrong"))
      val e = intercept[IOException] { c.listPartitions() }
      assert(e.getMessage.contains("authentication failed"),
        s"expected an authentication error, got: ${e.getMessage}")
    } finally gated.close()
  }

  test("SCRAM is mutual: a forged server signature is rejected by the client") {
    // A server that never held the credentials cannot compute
    // HMAC(ServerKey, AuthMessage); the client must verify v= and refuse —
    // otherwise a MITM that relays the handshake could serve forged data.
    val dir = ReplayLog.ensureLog(spark, sf)
    val evil = new KafkaLogServer(dir, "events", sasl = Some((user, pass)),
      forgeScramServerSig = true)
    try {
      val c = new KafkaLogClient(evil.clientPath, Map(
        "security.protocol" -> "SASL_PLAINTEXT",
        "sasl.mechanism" -> "SCRAM-SHA-512",
        "sasl.username" -> user, "sasl.password" -> pass))
      val e = intercept[IOException] { c.listPartitions() }
      assert(e.getMessage.contains("server signature"),
        s"expected a server-signature failure, got: ${e.getMessage}")
    } finally evil.close()
  }

  test("SASL/OAUTHBEARER: bearer token authenticates (inline and token file)") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val open = new KafkaLogServer(dir, "events")
    val token = "graft.oauth.token-abc123"
    val gated = new KafkaLogServer(dir, "events", oauthToken = Some(token))
    try {
      val expected = readAll(open.clientPath)
      val got = readAll(gated.clientPath,
        "consumer.security.protocol" -> "SASL_PLAINTEXT",
        "consumer.sasl.mechanism" -> "OAUTHBEARER",
        "consumer.sasl.oauthbearer.token" -> token)
      assert(got.nonEmpty && got === expected,
        "OAUTHBEARER read must equal the open-listener read")
      // the mounted-service-account shape: token read (and re-read per
      // connection) from a file, trailing newline trimmed
      val tf = java.nio.file.Files.createTempFile("oauth", ".token")
      java.nio.file.Files.write(tf, (token + "\n").getBytes("UTF-8"))
      val got2 = readAll(gated.clientPath,
        "consumer.security.protocol" -> "SASL_PLAINTEXT",
        "consumer.sasl.mechanism" -> "OAUTHBEARER",
        "consumer.sasl.oauthbearer.token.file" -> tf.toString)
      assert(got2 === expected)
    } finally { open.close(); gated.close() }
  }

  test("OAUTHBEARER bad token surfaces the RFC 7628 error JSON, not a wire error") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val gated = new KafkaLogServer(dir, "events",
      oauthToken = Some("the-right-token"))
    try {
      val c = new KafkaLogClient(gated.clientPath, Map(
        "security.protocol" -> "SASL_PLAINTEXT",
        "sasl.mechanism" -> "OAUTHBEARER",
        "sasl.oauthbearer.token" -> "the-wrong-token"))
      val e = intercept[IOException] { c.listPartitions() }
      assert(e.getMessage.contains("invalid_token"),
        s"expected the RFC error JSON in the failure, got: ${e.getMessage}")
    } finally gated.close()
  }

  test("OAUTHBEARER without a token config fails fast with a named error") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val gated = new KafkaLogServer(dir, "events", oauthToken = Some("t"))
    try {
      val c = new KafkaLogClient(gated.clientPath, Map(
        "security.protocol" -> "SASL_PLAINTEXT",
        "sasl.mechanism" -> "OAUTHBEARER"))
      val e = intercept[IOException] { c.listPartitions() }
      assert(e.getMessage.contains("sasl.oauthbearer.token"))
    } finally gated.close()
  }

  test("a SASL listener refuses unauthenticated data APIs") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val gated = new KafkaLogServer(dir, "events", sasl = Some((user, pass)))
    try {
      // plaintext client straight to Metadata: the broker kills the
      // connection rather than serve it
      val c = new KafkaLogClient(gated.clientPath)
      intercept[Exception] { c.listPartitions() }
    } finally gated.close()
  }

  test("TLS: full batch read over an encrypted listener with a pinned truststore") {
    val (ks, ts, storePass) = tls
    val dir = ReplayLog.ensureLog(spark, sf)
    val open = new KafkaLogServer(dir, "events")
    val sec = new KafkaLogServer(dir, "events", tlsKeystore = Some((ks, storePass)))
    try {
      val got = readAll(sec.clientPath,
        "consumer.security.protocol" -> "SSL",
        "consumer.ssl.truststore.location" -> ts,
        "consumer.ssl.truststore.password" -> storePass)
      assert(got.nonEmpty)
      assert(got === readAll(open.clientPath),
        "TLS read must equal the plaintext read")
    } finally { open.close(); sec.close() }
  }

  test("TLS without the broker's CA in the truststore fails the handshake") {
    val (ks, _, storePass) = tls
    val dir = ReplayLog.ensureLog(spark, sf)
    val sec = new KafkaLogServer(dir, "events", tlsKeystore = Some((ks, storePass)))
    try {
      // JVM default trust anchors do not include the self-signed cert
      val c = new KafkaLogClient(sec.clientPath,
        Map("security.protocol" -> "SSL"))
      intercept[Exception] { c.listPartitions() }
    } finally sec.close()
  }

  test("TLS: a trusted cert for the WRONG host is rejected (endpoint identification)") {
    // The MITM scenario: the client trusts the attacker's CA (or any public
    // CA), but the served cert names a different host. Real Kafka clients
    // reject this via ssl.endpoint.identification.algorithm=https (their
    // default); before round 11 we accepted any trusted cert for any host.
    val dir = java.nio.file.Files.createTempDirectory("kafka-tls-evil")
    val ks = dir.resolve("evil.p12").toString
    val ts = dir.resolve("evil-trust.p12").toString
    val cert = dir.resolve("evil.crt").toString
    val storePass = "graft-test"
    val keytool = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "keytool").toString
    def run(args: String*): Unit = {
      val p = new ProcessBuilder((keytool +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8")
      assert(p.waitFor() == 0, s"keytool ${args.head} failed: $out")
    }
    run("-genkeypair", "-alias", "evil", "-keyalg", "RSA", "-keysize",
      "2048", "-validity", "1", "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", storePass, "-dname", "CN=evil.example",
      "-ext", "SAN=DNS:evil.example")
    run("-exportcert", "-alias", "evil", "-keystore", ks,
      "-storepass", storePass, "-file", cert)
    run("-importcert", "-alias", "evil", "-file", cert, "-keystore", ts,
      "-storepass", storePass, "-noprompt")
    val logDir = ReplayLog.ensureLog(spark, sf)
    val sec = new KafkaLogServer(logDir, "events",
      tlsKeystore = Some((ks, storePass)))
    try {
      // trusted chain, wrong identity (cert says evil.example, peer is
      // 127.0.0.1) → handshake must fail
      val c = new KafkaLogClient(sec.clientPath, Map(
        "security.protocol" -> "SSL",
        "ssl.truststore.location" -> ts,
        "ssl.truststore.password" -> storePass))
      intercept[Exception] { c.listPartitions() }
      // Kafka's documented escape hatch: the empty algorithm disables
      // hostname verification (SAN-less internal certs)
      val lax = new KafkaLogClient(sec.clientPath, Map(
        "security.protocol" -> "SSL",
        "ssl.truststore.location" -> ts,
        "ssl.truststore.password" -> storePass,
        "ssl.endpoint.identification.algorithm" -> ""))
      assert(lax.listPartitions().nonEmpty)
    } finally sec.close()
  }

  test("SASL_SSL: authentication inside the encrypted channel") {
    val (ks, ts, storePass) = tls
    val dir = ReplayLog.ensureLog(spark, sf)
    val open = new KafkaLogServer(dir, "events")
    val sec = new KafkaLogServer(dir, "events", sasl = Some((user, pass)),
      tlsKeystore = Some((ks, storePass)))
    try {
      val got = readAll(sec.clientPath,
        "consumer.security.protocol" -> "SASL_SSL",
        "consumer.sasl.username" -> user,
        "consumer.sasl.password" -> pass,
        "consumer.ssl.truststore.location" -> ts,
        "consumer.ssl.truststore.password" -> storePass)
      assert(got.nonEmpty)
      assert(got === readAll(open.clientPath))
    } finally { open.close(); sec.close() }
  }

  test("unknown security.protocol fails fast at construction") {
    val e = intercept[IllegalArgumentException] {
      new KafkaLogClient("h:1/t", Map("security.protocol" -> "KERBEROS"))
    }
    assert(e.getMessage.contains("security.protocol"))
  }
}
