package graft.tools

import graft.functions.CryptoFunctions

/** Micro-profiler for the u1 hot path (r12 verdict #3): times the raw
  * Tink Ed25519 kernels against the full per-row [[CryptoFunctions]]
  * sign/verify entry points (header sniff + key-cache lookup included),
  * so a u1 p50 shift can be attributed to the crypto floor vs the
  * UDF-side overhead vs the machine. Single thread; multiply by rows
  * and divide by cores for the query-stage floor.
  */
object CryptoProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val kp = CryptoFunctions.seededKeyPair("Ed25519", 42L)
    val priv = kp.getPrivate.getEncoded
    val pub = kp.getPublic.getEncoded
    val payloads = (0 until 256).map(i => s"$i|3-MEDIUM".getBytes).toArray

    def time(label: String)(body: Int => Unit): Unit = {
      (0 until n / 4).foreach(body) // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(body)
      val us = (System.nanoTime() - t0) / 1000.0 / n
      println(f"CRYPTOPROF $label%-28s $us%8.1f us/op")
    }

    // Raw Tink kernels (cache bypassed: constructed once).
    val signer = new com.google.crypto.tink.subtle.Ed25519Sign(priv.slice(16, 48))
    val sig0 = signer.sign(payloads(0))
    val verifier = new com.google.crypto.tink.subtle.Ed25519Verify(pub.slice(12, 44))
    time("tink_sign_raw")(i => { signer.sign(payloads(i % 256)): Unit })
    time("tink_verify_raw")(i => {
      try verifier.verify(signer.sign(payloads(i % 256)), payloads(i % 256))
      catch { case _: Exception => () }
    })
    // The per-row entry points the UDFs call.
    time("cf_sign")(i =>
      { CryptoFunctions.sign("Ed25519", priv, payloads(i % 256)): Unit })
    time("cf_sign_verify")(i => {
      val s = CryptoFunctions.sign("Ed25519", priv, payloads(i % 256))
      CryptoFunctions.verify("Ed25519", pub, payloads(i % 256), s): Unit
    })

    // The u2 path (r13 verdict #3): verifyVc = JSON parse + strip proof +
    // canonical serialize + hex-decode + Ed25519 verify, per row. Pinning
    // each stage separately classifies a u2 p50 swing as kernel drift
    // (tink_verify_raw moved), canonicalization drift (vc_parse_serialize
    // moved), or environment (neither moved).
    import graft.functions.{DidVc, JsonCanon}
    val vcs = (0 until 256).map { i =>
      DidVc.signVc(
        DidVc.buildVcDoc(s"vc:$i", "did:example:issuer",
          s"did:example:drone$i", s"M-$i", s"D-$i", "2024-01-01T00:00:00Z"),
        priv, "2024-01-01T00:00:00Z", "did:example:issuer#key-1")
    }.toArray
    time("vc_parse_only")(i => { JsonCanon.parse(vcs(i % 256)): Unit })
    time("vc_parse_serialize")(i =>
      { JsonCanon.serialize(JsonCanon.parse(vcs(i % 256))): Unit })
    time("cf_verify_vc")(i => {
      require(DidVc.verifyVc(vcs(i % 256), pub), "verifyVc returned false")
    })
    println(s"CRYPTOPROF sig_len=${sig0.length} vc_len=${vcs(0).length}")
  }
}
