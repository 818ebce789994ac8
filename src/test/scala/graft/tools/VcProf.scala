package graft.tools

import graft.functions.JsonCanon._
import graft.functions.{CryptoFunctions, DidVc}

/** Micro-profiler for the U2 VC sign/verify row path (not a ScalaTest
  * suite — run with `sbt "Test/runMain graft.tools.VcProf"`). Breaks the
  * per-row cost into components so optimization targets are measured, not
  * guessed.
  */
object VcProf {
  def time(n: Int, label: String)(f: Int => Unit): Unit = {
    f(0); f(1)
    val t0 = System.nanoTime()
    var i = 0; while (i < n) { f(i); i += 1 }
    val us = (System.nanoTime() - t0) / 1000.0 / n
    println(f"$label%-28s $us%8.2f us/op")
  }

  def main(args: Array[String]): Unit = {
    val kp = CryptoFunctions.seededKeyPair("Ed25519", 7L)
    val priv = kp.getPrivate.getEncoded
    val pub = kp.getPublic.getEncoded
    val issuer = DidVc.mintDid("issuer-fixture")
    val N = 20000

    time(N, "full sign+verify") { i =>
      val doc = DidVc.buildVcDoc(s"VC$i", issuer, DidVc.mintDid(s"C$i"),
        s"M$i", s"D$i", "2024-01-01T00:00:00Z")
      val vc = DidVc.signVc(doc, priv, "2024-01-01T00:00:00Z", s"$issuer#key-1")
      require(DidVc.verifyVc(vc, pub))
    }
    val doc0 = DidVc.buildVcDoc("VC1", issuer, DidVc.mintDid("C1"), "M1",
      "D1", "2024-01-01T00:00:00Z")
    time(N, "buildVcDoc+serialize") { i =>
      serialize(DidVc.buildVcDoc(s"VC$i", issuer, DidVc.mintDid(s"C$i"),
        s"M$i", s"D$i", "2024-01-01T00:00:00Z"))
    }
    val payload = serialize(doc0).getBytes("UTF-8")
    time(N, "ed25519 sign") { _ => CryptoFunctions.sign("Ed25519", priv, payload) }
    val sig = CryptoFunctions.sign("Ed25519", priv, payload)
    time(N, "ed25519 verify") { _ =>
      require(CryptoFunctions.verify("Ed25519", pub, payload, sig)) }
    time(N, "Signature.getInstance") { _ =>
      java.security.Signature.getInstance("Ed25519") }
    time(N, "hex format 64B") { _ => sig.map("%02x".format(_)).mkString }
    val vc0 = DidVc.signVc(doc0, priv, "2024-01-01T00:00:00Z", s"$issuer#key-1")
    time(N, "parse vcJson") { _ => parse(vc0) }
    time(N, "verifyVc full") { _ => require(DidVc.verifyVc(vc0, pub)) }

    // Tink (ships in /opt/spark/jars) vs SunEC for the same key material.
    // JDK17 Ed25519 PKCS#8 DER = 16-byte header + 32-byte seed;
    // X.509 DER = 12-byte header + 32-byte public key.
    val seed = priv.slice(16, 48)
    val pubRaw = pub.slice(12, 44)
    val tSign = new com.google.crypto.tink.subtle.Ed25519Sign(seed)
    val tVerify = new com.google.crypto.tink.subtle.Ed25519Verify(pubRaw)
    val tSig = tSign.sign(payload)
    require(java.util.Arrays.equals(tSig, sig),
      "tink and JDK Ed25519 signatures must be bit-identical")
    time(N, "tink ed25519 sign") { _ => tSign.sign(payload) }
    time(N, "tink ed25519 verify") { _ => tVerify.verify(sig, payload) }
  }
}
