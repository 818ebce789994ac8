package graft

import graft.functions.{CryptoFunctions, DidVc, JsonCanon}
import org.scalatest.funsuite.AnyFunSuite

class JsonCanonSpec extends AnyFunSuite {
  import JsonCanon._

  // Vectors generated with CPython 3.11 json.dumps(v, sort_keys=True).
  val vectors = Seq(
    """{"b": 1, "a": "x"}""" -> """{"a": "x", "b": 1}""",
    """{"z": [3, 1, 2], "a": {"c": true, "b": null}}""" ->
      """{"a": {"b": null, "c": true}, "z": [3, 1, 2]}""",
    """{"@context": ["https://www.w3.org/2018/credentials/v1"], "type": ["VerifiableCredential"], "issuer": "did:example:123"}""" ->
      """{"@context": ["https://www.w3.org/2018/credentials/v1"], "issuer": "did:example:123", "type": ["VerifiableCredential"]}""",
    "{\"s\": \"quote\\\"back\\\\slash\\ntab\\t\", \"u\": \"café ☃\"}" ->
      "{\"s\": \"quote\\\"back\\\\slash\\ntab\\t\", \"u\": \"caf\\u00e9 \\u2603\"}",
    """{"n": 3.5, "i": 42, "neg": -1.25e-05}""" ->
      """{"i": 42, "n": 3.5, "neg": -1.25e-05}""",
    """{}""" -> """{}""")

  test("canonicalize matches python json.dumps(sort_keys=True) bytes") {
    vectors.foreach { case (in, want) =>
      assert(canonicalize(in) == want, s"input: $in")
    }
  }

  test("python float repr rules") {
    assert(pyFloatRepr(3.5) == "3.5")
    assert(pyFloatRepr(42.0) == "42.0")
    assert(pyFloatRepr(-1.25e-05) == "-1.25e-05")
    assert(pyFloatRepr(0.0005) == "0.0005")     // java would say 5.0E-4
    assert(pyFloatRepr(1e16) == "1e+16")
    assert(pyFloatRepr(1.5e16) == "1.5e+16")
    assert(pyFloatRepr(123456789.0) == "123456789.0")
    assert(pyFloatRepr(1e-4) == "0.0001")
    assert(pyFloatRepr(9.999e-5) == "9.999e-05")
    assert(pyFloatRepr(0.1) == "0.1")
    assert(pyFloatRepr(-0.0) == "-0.0")
    assert(pyFloatRepr(1e100) == "1e+100")
  }

  test("idempotent and stable under key reordering") {
    val a = """{"x": 1, "y": {"b": 2, "a": 3}}"""
    val b = """{"y": {"a": 3, "b": 2}, "x": 1}"""
    assert(canonicalize(a) == canonicalize(b))
    assert(canonicalize(canonicalize(a)) == canonicalize(a))
  }
}

class CryptoSpec extends AnyFunSuite {
  import CryptoFunctions._

  test("ed25519 sign/verify round-trip and tamper detection") {
    val kp = seededKeyPair("Ed25519", 42L)
    val data = "mission payload".getBytes("UTF-8")
    val sig = sign("Ed25519", kp.getPrivate.getEncoded, data)
    assert(verify("Ed25519", kp.getPublic.getEncoded, data, sig))
    assert(!verify("Ed25519", kp.getPublic.getEncoded,
      "tampered".getBytes("UTF-8"), sig))
  }

  test("seeded keypair is deterministic") {
    val a = seededKeyPair("Ed25519", 42L)
    val b = seededKeyPair("Ed25519", 42L)
    assert(a.getPrivate.getEncoded.sameElements(b.getPrivate.getEncoded))
  }

  test("ecdsa p-256 round-trip") {
    val kp = seededKeyPair("EC", 1L)
    val data = "doc".getBytes("UTF-8")
    val sig = sign("EC", kp.getPrivate.getEncoded, data)
    assert(verify("EC", kp.getPublic.getEncoded, data, sig))
  }

  test("hybrid encrypt/decrypt round-trip; wrong sig key rejected") {
    val enc = seededKeyPair("RSA", 1L)
    val sig = seededKeyPair("RSA", 2L)
    val blob = hybridEncrypt(enc.getPublic.getEncoded,
      sig.getPrivate.getEncoded, "secret vc".getBytes("UTF-8"))
    val out = hybridDecrypt(enc.getPrivate.getEncoded,
      sig.getPublic.getEncoded, blob)
    assert(out.map(new String(_, "UTF-8")).contains("secret vc"))
    val wrong = seededKeyPair("RSA", 3L)
    assert(hybridDecrypt(enc.getPrivate.getEncoded,
      wrong.getPublic.getEncoded, blob).isEmpty)
  }

  test("vc sign/verify through canonical json; tamper detection") {
    val kp = seededKeyPair("Ed25519", 7L)
    val doc = DidVc.buildVcDoc("VC1", "did:example:iss", "did:example:sub",
      "M1", "D1", "2024-01-01T00:00:00Z")
    val vc = DidVc.signVc(doc, kp.getPrivate.getEncoded,
      "2024-01-01T00:00:00Z", "did:example:iss#key-1")
    assert(DidVc.verifyVc(vc, kp.getPublic.getEncoded))
    val tampered = vc.replace("did:example:sub", "did:example:eve")
    assert(!DidVc.verifyVc(tampered, kp.getPublic.getEncoded))
  }
}
