package graft

import java.nio.charset.StandardCharsets

/** Throwaway TLS PKI for ssl:// tests, generated at test time with the
  * JDK's own keytool (no binary blobs in the repo): a server keypair
  * store and a client trust store holding the exported certificate.
  */
object TlsTestPki {
  final case class Pki(serverSocketFactory: javax.net.ServerSocketFactory,
                       truststore: String, password: String)

  /** @param san the certificate's SubjectAlternativeName list. Endpoint
    *   identification (RFC 2818, enabled on the client socket) matches
    *   the target against SANs — for an IP target an `ip:` SAN entry is
    *   REQUIRED (JSSE never falls back to the CN for IPs), so the
    *   default carries the loopback address tests connect to. Passing a
    *   non-matching SAN builds the MITM-shaped cert the negative test
    *   wants: validly signed, trusted, wrong host.
    */
  def create(san: String = "ip:127.0.0.1,dns:localhost"): Pki = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val keystore = s"$dir/server.p12"
    val truststore = s"$dir/trust.p12"
    val cert = s"$dir/server.cer"
    val pw = "testonly"
    def keytool(args: String*): Unit = {
      val bin = System.getProperty("java.home") + "/bin/keytool"
      val p = new ProcessBuilder((bin +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      require(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
    }
    keytool("-genkeypair", "-alias", "broker", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "3650",
      "-dname", "CN=127.0.0.1", "-ext", s"SAN=$san",
      "-storetype", "PKCS12",
      "-keystore", keystore, "-storepass", pw, "-keypass", pw)
    keytool("-exportcert", "-alias", "broker", "-keystore", keystore,
      "-storepass", pw, "-file", cert)
    keytool("-importcert", "-alias", "broker", "-file", cert,
      "-storetype", "PKCS12", "-keystore", truststore,
      "-storepass", pw, "-noprompt")

    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(keystore)
    try ks.load(fis, pw.toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    Pki(ctx.getServerSocketFactory, truststore, pw)
  }
}
