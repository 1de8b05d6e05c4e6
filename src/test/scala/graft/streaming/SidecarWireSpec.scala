package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.security.KeyStore
import java.security.cert.{CertificateFactory, X509Certificate}

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

import org.apache.spark.sql.functions.lit

import graft.{GraftEngine, SparkSpec}
import SidecarWire.{MetricsRow, PolicyRow}

/** The sidecar boundary's NETWORK transport: framed exchange end to end
  * (with a live engine on the client side), version-skew and garbage
  * refusal at the frame layer, and the mutual-TLS channel — client auth
  * required, certificate-less peers rejected in the handshake. */
class SidecarWireSpec extends SparkSpec {
  import spark.implicits._

  // deterministic sidecar half for the tests: the same shape as
  // Policy.heuristic — high miss rate buys a longer TTL
  private def handler(ms: Seq[MetricsRow]): Seq[PolicyRow] =
    ms.map { m =>
      val missRate = if (m.nRequests == 0) 0.0 else m.nMisses.toDouble / m.nRequests
      if (missRate > 0.5) PolicyRow(m.tenant, m.window, 300, 0.05, "aggressive")
      else PolicyRow(m.tenant, m.window, 60, 0.15, "normal")
    }

  test("codec roundtrip, including escapes in tenant names") {
    val ms = Seq(
      MetricsRow("t0", 7L, 100L, 80L),
      MetricsRow("we\"ird\\ten\nant", 7L, 5L, 0L),
      // value ENDING in a backslash: a lookbehind scanner misreads the
      // escaped backslash before the closing quote and runs past it,
      // corrupting the row (review finding) — pin the escape-pair scan
      MetricsRow("trailing\\", 9L, 1L, 1L),
      MetricsRow("\\", 10L, 2L, 0L))
    assert(SidecarWire.decodeMetrics(SidecarWire.encodeMetrics(ms)) == ms)
    val ps = Seq(
      PolicyRow("t0", 7L, 300, 0.05, "aggressive"),
      PolicyRow("a\\b\"c", 8L, 60, 0.15, "nor\"mal"),
      PolicyRow("t1", 9L, 60, 0.15, "ends\\"))
    assert(SidecarWire.decodePolicies(SidecarWire.encodePolicies(ps)) == ps)
    assert(SidecarWire.decodeMetrics(Array.empty[Byte]).isEmpty)
  }

  test("truncated frames throw the contract error, never an index exception") {
    // each truncation class must surface as the descriptive
    // IllegalArgumentException the other parse paths throw — a raw
    // StringIndexOutOfBoundsException from the scanner leaks an
    // unattributed crash to the transport loop (ADVICE r9)
    def reject(js: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        SidecarWire.decodeMetrics(js.getBytes(UTF_8))
      }
      assert(e.getMessage.contains("frame row") ||
        e.getMessage.contains("escape"), e.getMessage)
    }
    reject("""{"tenant":"a""") // unterminated string value
    reject("""{"tenant":"a\""") // lone trailing backslash inside string
    reject("""{"tenant":"a""" + "\\u12") // truncated \u escape
    reject("""{"tenant":"t","window":7""") // numeric value, no terminator
    reject("""{"tenant":""") // key present, value missing entirely
  }

  test("plain TCP exchange: metrics out, policy decisions back") {
    val srv = new SidecarWire.Server(handler)
    try {
      val client = new SidecarWire.Client("127.0.0.1", srv.port)
      val got = client.exchange(Seq(
        MetricsRow("t0", 1L, 100L, 80L), MetricsRow("t1", 1L, 100L, 10L)))
      assert(got.toSet == Set(
        PolicyRow("t0", 1L, 300, 0.05, "aggressive"),
        PolicyRow("t1", 1L, 60, 0.15, "normal")))
      // second exchange over a fresh connection — server stays up
      assert(client.exchange(Seq(MetricsRow("t2", 2L, 10L, 9L))).head
        .ttlSeconds == 300)
    } finally srv.close()
  }

  test("tickWire: live engine counters over the wire, reply applied as TTL") {
    val root = Files.createTempDirectory("sidecar-wire-eng").toString
    val eng = new GraftEngine(spark, root)
    val recs = (0 until 30).map(i =>
        (s"v$i", Seq(i.toFloat, 1f, 0f), null: String, Seq.empty[String], 100L))
      .toDF("id", "vector", "meta", "tags", "updated_at")
      .withColumn("tenant_id", lit("t1"))
      .withColumn("index_name", lit("idx"))
      .withColumn("deleted", lit(false))
    eng.add(recs)
    eng.build("t1", "idx", nlist = 2)
    // two misses of three requests → miss rate 2/3 → aggressive policy
    eng.searchCachedRows("t1", "idx", 1L, Array(4f, 1f, 0f), k = 3,
      nprobe = 2, now = 1000L)
    eng.searchCachedRows("t1", "idx", 1L, Array(4f, 1f, 0f), k = 3,
      nprobe = 2, now = 1001L)
    eng.searchCachedRows("t1", "idx", 2L, Array(9f, 1f, 0f), k = 8,
      nprobe = 2, now = 1002L)
    assert(eng.servingTtl("t1") == 60)
    val srv = new SidecarWire.Server(handler)
    try {
      val loop = new SidecarLoop(eng, spark, root + "/unused-contract")
      loop.tickWire(5L, new SidecarWire.Client("127.0.0.1", srv.port))
      assert(eng.servingTtl("t1") == 300) // the wire reply was applied
    } finally srv.close()
  }

  test("version skew: server refuses loudly; client refuses a skewed reply") {
    val srv = new SidecarWire.Server(handler)
    try {
      // raw peer stamping version+1 → ERR frame naming both versions
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val payload = SidecarWire.encodeMetrics(Seq(MetricsRow("t", 1, 1, 1)))
        out.writeInt(SidecarWire.Magic)
        out.writeByte(SidecarWire.TypeMetrics)
        out.writeInt(SidecarContract.Version + 1)
        out.writeInt(payload.length); out.write(payload); out.flush()
        val in = new java.io.DataInputStream(sock.getInputStream)
        assert(in.readInt() == SidecarWire.Magic)
        assert(in.readByte() == SidecarWire.TypeErr)
        in.readInt() // sender version
        val msg = new Array[Byte](in.readInt()); in.readFully(msg)
        val txt = new String(msg, UTF_8)
        assert(txt.contains("version skew") &&
          txt.contains(s"v${SidecarContract.Version + 1}"))
      } finally sock.close()
      // and the ERR reply path surfaces as a loud client failure
      val e = intercept[IllegalStateException] {
        // wrong TYPE from a versioned peer — server replies ERR
        val s2 = new java.net.Socket("127.0.0.1", srv.port)
        try {
          val out = new java.io.BufferedOutputStream(s2.getOutputStream)
          SidecarWire.writeFrame(out, SidecarWire.TypePolicies, Array.empty)
          val (t, _, p) = SidecarWire.readFrame(
            new java.io.BufferedInputStream(s2.getInputStream))
          if (t == SidecarWire.TypeErr)
            throw new IllegalStateException(new String(p, UTF_8))
        } finally s2.close()
      }
      assert(e.getMessage.contains("unexpected frame type"))
    } finally srv.close()
  }

  test("frame layer refuses bad magic and oversized payloads") {
    val in = new java.io.ByteArrayInputStream(
      Array[Byte](0x12, 0x34, 0x56, 0x78, 1, 0, 0, 0, 1, 0, 0, 0, 0))
    val e = intercept[IllegalArgumentException](SidecarWire.readFrame(in))
    assert(e.getMessage.contains("magic"))
    val big = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(big)
    d.writeInt(SidecarWire.Magic); d.writeByte(1)
    d.writeInt(SidecarContract.Version)
    d.writeInt(SidecarWire.MaxPayloadBytes + 1)
    val e2 = intercept[IllegalArgumentException](SidecarWire.readFrame(
      new java.io.ByteArrayInputStream(big.toByteArray)))
    assert(e2.getMessage.contains("out of bounds"))
    intercept[IllegalArgumentException](
      SidecarWire.writeFrame(new java.io.ByteArrayOutputStream(),
        SidecarWire.TypeMetrics, new Array[Byte](SidecarWire.MaxPayloadBytes + 1)))
  }

  // ---- mTLS ----------------------------------------------------------

  private def runKeytool(args: String*): Unit = {
    val pb = new ProcessBuilder(("keytool" +: args): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    assert(p.waitFor() == 0, s"keytool failed: $out")
  }

  /** Self-signed identity: PKCS12 keystore + exported certificate. */
  private def genIdentity(dir: Path, name: String): (String, X509Certificate) = {
    val ks = s"$dir/$name.p12"
    runKeytool("-genkeypair", "-alias", name, "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", "changeit", "-dname", s"CN=$name", "-validity", "2")
    val certPath = s"$dir/$name.cer"
    runKeytool("-exportcert", "-alias", name, "-keystore", ks,
      "-storepass", "changeit", "-file", certPath)
    val cf = CertificateFactory.getInstance("X.509")
    val inStream = Files.newInputStream(Paths.get(certPath))
    val cert =
      try cf.generateCertificate(inStream).asInstanceOf[X509Certificate]
      finally inStream.close()
    (ks, cert)
  }

  /** SSLContext from an optional own identity + explicitly trusted peer
    * certs — the deployment-shaped input [[SidecarWire]] endpoints take. */
  private def sslCtx(keystore: Option[String],
                     trusted: Seq[X509Certificate]): SSLContext = {
    val kms = keystore.map { path =>
      val ks = KeyStore.getInstance("PKCS12")
      val in = Files.newInputStream(Paths.get(path))
      try ks.load(in, "changeit".toCharArray) finally in.close()
      val kmf = KeyManagerFactory.getInstance(
        KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, "changeit".toCharArray)
      kmf.getKeyManagers
    }.getOrElse(Array.empty)
    val ts = KeyStore.getInstance("PKCS12")
    ts.load(null, null)
    trusted.zipWithIndex.foreach { case (c, i) =>
      ts.setCertificateEntry(s"trusted$i", c) }
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ts)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, tmf.getTrustManagers, null)
    ctx
  }

  test("mTLS: mutual auth serves; a certificate-less client is rejected") {
    val dir = Files.createTempDirectory("sidecar-wire-tls")
    val (serverKs, serverCert) = genIdentity(dir, "sidecar")
    val (clientKs, clientCert) = genIdentity(dir, "engine")
    val serverCtx = sslCtx(Some(serverKs), Seq(clientCert))
    val clientCtx = sslCtx(Some(clientKs), Seq(serverCert))
    val srv = new SidecarWire.Server(handler, ssl = Some(serverCtx))
    try {
      val got = new SidecarWire.Client("127.0.0.1", srv.port,
        ssl = Some(clientCtx))
        .exchange(Seq(MetricsRow("t0", 3L, 10L, 9L)))
      assert(got == Seq(PolicyRow("t0", 3L, 300, 0.05, "aggressive")))

      // same trust of the server but NO client identity → the server's
      // required client auth fails the handshake before any frame
      val anonCtx = sslCtx(None, Seq(serverCert))
      intercept[java.io.IOException] {
        new SidecarWire.Client("127.0.0.1", srv.port, ssl = Some(anonCtx))
          .exchange(Seq(MetricsRow("t0", 4L, 1L, 1L)))
      }
      // and the authenticated channel still serves afterwards
      assert(new SidecarWire.Client("127.0.0.1", srv.port,
        ssl = Some(clientCtx))
        .exchange(Seq(MetricsRow("t1", 5L, 10L, 1L))).head.ttlSeconds == 60)
    } finally srv.close()
  }
}
