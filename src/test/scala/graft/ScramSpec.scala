package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.server.Scram

/** SCRAM-SHA-256 primitives against RFC 7677 §3's published test
  * vector (user "user", pass "pencil", the exact nonces/salt of the
  * RFC exchange) — validates both directions (client proof, server
  * signature, server-side verification) without a live server, so the
  * wire legs that build on these functions inherit spec correctness.
  */
class ScramSpec extends GraftSuite {

  // RFC 7677 §3 exchange
  private val clientFirstBare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
  private val serverFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
  private val clientFinalNoProof =
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
  private val salt = Scram.unb64("W22ZaJ0SNY7soEsUEjb6gQ==")
  private val authMsg =
    Scram.authMessage(clientFirstBare, serverFirst, clientFinalNoProof)

  test("client proof matches the RFC 7677 vector") {
    val salted = Scram.saltedPassword("pencil", salt, 4096)
    assert(Scram.b64(Scram.clientProof(salted, authMsg)) ==
      "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
  }

  test("server signature matches the RFC 7677 vector") {
    val salted = Scram.saltedPassword("pencil", salt, 4096)
    assert(Scram.b64(Scram.serverSignature(salted, authMsg)) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("server-side verification accepts the vector proof, rejects a wrong password") {
    val salted = Scram.saltedPassword("pencil", salt, 4096)
    val proof = Scram.unb64("dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(Scram.verifyClientProof(salted, authMsg, proof))
    val wrong = Scram.saltedPassword("pencil2", salt, 4096)
    assert(!Scram.verifyClientProof(wrong, authMsg, proof))
    // a single flipped proof bit fails too
    val flipped = proof.clone(); flipped(0) = (flipped(0) ^ 1).toByte
    assert(!Scram.verifyClientProof(salted, authMsg, flipped))
    // a proof that is not SHA-256-sized is REJECTED, never an
    // ArrayIndexOutOfBounds a hostile pre-auth client could trigger
    // (xor used to index the 32-byte signature by the proof's length)
    assert(!Scram.verifyClientProof(salted, authMsg, new Array[Byte](64)))
    assert(!Scram.verifyClientProof(salted, authMsg, new Array[Byte](16)))
    assert(!Scram.verifyClientProof(salted, authMsg, Array.emptyByteArray))
  }

  test("attribute parser keeps base64 padding and '=' inside values") {
    val a = Scram.attrs(serverFirst)
    assert(a('r') == "rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0")
    assert(a('s') == "W22ZaJ0SNY7soEsUEjb6gQ==")
    assert(a('i') == "4096")
  }

  test("gs2 'n,,' header base64 is the literal biws the wire messages carry") {
    assert(Scram.b64("n,,".getBytes(UTF_8)) == "biws")
  }
}
