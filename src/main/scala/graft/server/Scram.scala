package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (RFC 5802 / RFC 7677), shared by the wire
  * SERVER (PgServer's scram auth mode) and the native federation
  * CLIENT (sources/PgWireClient). The reference's federation path
  * authenticates against modern Postgres through rust-postgres, which
  * speaks SCRAM (udtf/postgres_scan.rs:18-52 -> tokio-postgres); PG
  * >= 14 defaults to scram-sha-256, so without this exchange a
  * default-config server is unreachable from the JDBC-free leg.
  *
  * Channel-binding stances (RFC 5802 §6): over plaintext the client
  * sends gs2 "n,," and the server offers only the base mechanism; over
  * TLS both sides negotiate SCRAM-SHA-256-PLUS bound to the RFC 5929
  * tls-server-end-point certificate hash ([[endpointHash]]), the
  * client sends "y,," if a TLS server somehow omitted -PLUS (so a
  * genuine server detects a stripped offer), and the server rejects
  * "y" whenever it DID offer -PLUS (downgrade detection). Matches
  * libpq/psql semantics in both channels.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"
  val MechanismPlus = "SCRAM-SHA-256-PLUS"

  /** RFC 5929 tls-server-end-point channel-binding data: a hash of the
    * server certificate's DER encoding, keyed by the certificate's own
    * signature hash (MD5/SHA-1 upgrade to SHA-256 per the RFC; SHA-384
    * and SHA-512 pass through). Both SCRAM-SHA-256-PLUS legs bind to
    * this value, so a TLS-terminating man in the middle — who must
    * present a DIFFERENT certificate — breaks the proof. */
  def endpointHash(cert: java.security.cert.X509Certificate): Array[Byte] = {
    val sig = cert.getSigAlgName.toUpperCase(java.util.Locale.ROOT)
    val alg =
      if (sig.contains("SHA384")) "SHA-384"
      else if (sig.contains("SHA512")) "SHA-512"
      else "SHA-256"
    MessageDigest.getInstance(alg).digest(cert.getEncoded)
  }

  def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def sha256(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(data)

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA-256 (RFC 5802 §2.2). */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(normalize(password).toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** SASLprep (RFC 4013) to the extent PG applies it: ASCII passes
    * through; non-ASCII is NFKC-normalized (PG falls back to the raw
    * string when saslprep fails — we mirror the common path). */
  def normalize(password: String): String =
    if (password.forall(_ < 0x80)) password
    else java.text.Normalizer.normalize(password, java.text.Normalizer.Form.NFKC)

  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key".getBytes(UTF_8))
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key".getBytes(UTF_8))
  def storedKey(clientKey: Array[Byte]): Array[Byte] = sha256(clientKey)

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Parse "k1=v1,k2=v2,..." SCRAM attribute lists. Values may contain
    * '=' (base64 padding), so split on the FIRST '=' only. */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      kv.charAt(0) -> kv.substring(2)
    }.toMap

  /** client-first-message-bare for user-less PG convention ("n=" empty
    * — PG takes the role from the startup packet, libpq sends it
    * empty). */
  def clientFirstBare(nonce: String): String = s"n=,r=$nonce"

  /** AuthMessage = client-first-bare , server-first , client-final-without-proof */
  def authMessage(clientFirstBare: String, serverFirst: String,
      clientFinalNoProof: String): Array[Byte] =
    s"$clientFirstBare,$serverFirst,$clientFinalNoProof".getBytes(UTF_8)

  def clientProof(salted: Array[Byte], authMsg: Array[Byte]): Array[Byte] = {
    val ck = clientKey(salted)
    xor(ck, hmac(storedKey(ck), authMsg))
  }

  def serverSignature(salted: Array[Byte], authMsg: Array[Byte]): Array[Byte] =
    hmac(serverKey(salted), authMsg)

  /** Server-side proof check: recover ClientKey from the proof and the
    * signature, then compare H(ClientKey) against StoredKey —
    * constant-time compare (RFC 5802 §3). */
  def verifyClientProof(salted: Array[Byte], authMsg: Array[Byte],
      proof: Array[Byte]): Boolean = {
    // a proof that is not exactly SHA-256-sized cannot be valid — and
    // xor over a longer array would index past the 32-byte signature
    // (an AIOOBE a hostile client could trigger pre-auth)
    if (proof.length != 32) return false
    val stored = storedKey(clientKey(salted))
    val signature = hmac(stored, authMsg)
    val recovered = xor(proof, signature)
    MessageDigest.isEqual(sha256(recovered), stored)
  }

  private val NonceChars =
    ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('+', '/')

  def randomNonce(rng: java.security.SecureRandom, len: Int = 18): String =
    Array.fill(len)(NonceChars(rng.nextInt(NonceChars.length))).mkString
}
