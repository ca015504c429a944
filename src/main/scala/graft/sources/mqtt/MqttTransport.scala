package graft.sources.mqtt

import java.io.FileInputStream
import java.net.Socket
import java.security.KeyStore

import javax.net.ssl.{SSLContext, SSLSocket, SSLSocketFactory, TrustManagerFactory}

/** Broker-link transport selection behind the reference's free-form
  * `scheme` config field (`/root/reference/conf.go:26-27` carries it
  * verbatim into the paho broker URL; the shipped configs use `tcp`,
  * the field admits `ssl`). `tcp://` is a plain socket; `ssl://` is a
  * JSSE TLS socket, handshaken eagerly so a certificate failure
  * surfaces at CONNECT time as loudly as a refused TCP connect —
  * not lazily on the first packet write.
  */
object MqttTransport {

  /** Open the transport socket for `scheme://host:port`.
    *
    * @param trustStore optional (path, password) of a PKCS12 trust
    *   store for `ssl://` — the self-signed-broker case (tests, private
    *   deployments). Absent, the JVM's default trust anchors apply
    *   (public-CA broker certificates).
    */
  def connect(scheme: String, host: String, port: Int,
              trustStore: Option[(String, String)] = None): Socket =
    scheme match {
      case "tcp" => new Socket(host, port)
      case "ssl" =>
        val factory = trustStore match {
          case Some((path, password)) =>
            val ks = KeyStore.getInstance("PKCS12")
            val in = new FileInputStream(path)
            try ks.load(in, password.toCharArray) finally in.close()
            val tmf = TrustManagerFactory.getInstance(
              TrustManagerFactory.getDefaultAlgorithm)
            tmf.init(ks)
            val ctx = SSLContext.getInstance("TLS")
            ctx.init(null, tmf.getTrustManagers, null)
            ctx.getSocketFactory
          case None =>
            SSLSocketFactory.getDefault.asInstanceOf[SSLSocketFactory]
        }
        val s = factory.createSocket(host, port).asInstanceOf[SSLSocket]
        // Endpoint identification: chain validation alone accepts ANY
        // trusted certificate for ANY hostname — the classic JSSE
        // raw-socket MITM hole. "HTTPS" turns on RFC 2818 hostname
        // matching against the certificate's SANs, which is what the
        // reference's Go tls.Dial does by default (crypto/tls verifies
        // the ServerName unless InsecureSkipVerify is set).
        val params = s.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(params)
        s.startHandshake()
        s
      case other => throw new IllegalArgumentException(
        s"unsupported broker scheme '$other' (tcp, ssl)")
    }
}
