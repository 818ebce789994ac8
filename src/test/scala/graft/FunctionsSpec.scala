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

  test("shortest round-trip digits on JDK 17 (Double.toString over-long cases)") {
    // CPython: repr(4.6339927102834509e17) == '4.633992710283451e+17' —
    // JDK 17 Double.toString gives "4.6339927102834509E17" (one extra digit).
    assert(pyFloatRepr(4.6339927102834509e17) == "4.633992710283451e+17")
    assert(pyFloatRepr(2.2250738585072014e-308) == "2.2250738585072014e-308")
    // Every emitted repr must round-trip to the identical double, and be
    // no longer than what a 17-sig-digit print would give.
    val rnd = new scala.util.Random(7)
    (1 to 20000).foreach { _ =>
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN && !d.isInfinite) {
        val r = pyFloatRepr(d)
        val parsed = java.lang.Double.parseDouble(r)
        assert(parsed == d || (d == 0.0 && parsed == 0.0), s"round-trip fail: $d -> $r")
      }
    }
  }

  test("byte-compat with CPython repr on 10k golden vectors") {
    // src/test/resources/cpython_float_repr.tsv: "<ieee754 bits>\t<repr(d)>"
    // generated with CPython 3.11 (seed 123) + targeted boundary cases.
    val in = getClass.getResourceAsStream("/cpython_float_repr.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size > 9000)
    lines.foreach { ln =>
      val Array(bits, want) = ln.split("\t")
      val d = java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(bits))
      assert(pyFloatRepr(d) == want, s"bits=$bits d=$d")
    }
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

  test("malformed DER stays on the JDK path and is rejected, not mis-signed") {
    val kp = seededKeyPair("Ed25519", 42L)
    val data = "payload".getBytes("UTF-8")
    val badPriv = kp.getPrivate.getEncoded.clone()
    badPriv(1) = 0x00 // break the outer SEQUENCE length: not a valid PKCS#8
    intercept[java.security.GeneralSecurityException] {
      sign("Ed25519", badPriv, data)
    }
    val badPub = kp.getPublic.getEncoded.clone()
    badPub(1) = 0x00
    intercept[java.security.GeneralSecurityException] {
      verify("Ed25519", badPub, data,
        sign("Ed25519", kp.getPrivate.getEncoded, data))
    }
  }

  test("tink fast path is bit-identical to the JDK provider") {
    // sign() routes 48-byte PKCS#8 Ed25519 keys through Tink; RFC 8032
    // signatures are deterministic, so the two providers must agree
    // byte-for-byte and cross-verify in both directions.
    val kp = seededKeyPair("Ed25519", 42L)
    val data = "cross-provider payload".getBytes("UTF-8")
    val fast = sign("Ed25519", kp.getPrivate.getEncoded, data)
    val jdk = java.security.Signature.getInstance("Ed25519")
    jdk.initSign(kp.getPrivate)
    jdk.update(data)
    val slow = jdk.sign()
    assert(fast.sameElements(slow))
    val jdkV = java.security.Signature.getInstance("Ed25519")
    jdkV.initVerify(kp.getPublic)
    jdkV.update(data)
    assert(jdkV.verify(fast))
    assert(verify("Ed25519", kp.getPublic.getEncoded, data, slow))
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

  test("wallet seal/open round-trip; wrong passphrase and tamper drop rows") {
    val key = passphraseKey("securepassword", "salt".getBytes)
    val (nonce, ct) = aesGcmEncrypt(key, "row".getBytes("UTF-8"))
    assert(aesGcmDecrypt(key, nonce, ct).map(new String(_, "UTF-8"))
      .contains("row"))
    val wrongKey = passphraseKey("other", "salt".getBytes)
    assert(aesGcmDecrypt(wrongKey, nonce, ct).isEmpty)
    val tampered = ct.clone(); tampered(0) = (tampered(0) ^ 1).toByte
    assert(aesGcmDecrypt(key, nonce, tampered).isEmpty)

    val spark = SparkTestSession.spark
    val d = "/root/testdata/sf0.001"
    val t = graft.state.Wallet.privateKeys(spark, d)
    val sealedT = graft.state.Wallet.seal(t, "pw")
    assert(sealedT.columns.toSeq == Seq("nonce", "ciphertext"))
    val ddl = "did STRING, private_key STRING"
    val opened = graft.state.Wallet.open(sealedT, "pw", ddl)
    assert(t.exceptAll(opened).count() == 0 && opened.count() == t.count())
    assert(graft.state.Wallet.open(sealedT, "bad", ddl).count() == 0)
  }

  test("wallet round-trips random content including quotes and unicode") {
    // Fuzz the row→JSON→AES-GCM→JSON→row path: escaping-sensitive strings
    // must survive seal/open byte-exactly (raw ScalaCheck, fixed seeds).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val spark = SparkTestSession.spark
    import spark.implicits._
    val tricky = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("""quote " backslash \ slash /"""),
      Gen.const("unicode ünïcødé é世界"),
      Gen.const("control\ttab\nnewline"),
      Gen.const(""))
    (1 to 4).foreach { i =>
      val rows = Gen.listOfN(8, Gen.zip(Gen.choose(0L, 999L), tricky))(
        Gen.Parameters.default, Seed(5L + i)).getOrElse(Nil)
        .zipWithIndex.map { case ((n, s), j) => (j.toLong, s"$s-$n") }
      val t = rows.toDF("id", "payload")
      val opened = graft.state.Wallet.open(
        graft.state.Wallet.seal(t, s"pw$i"), s"pw$i",
        "id BIGINT, payload STRING")
      assert(opened.as[(Long, String)].collect().toSet == rows.toSet,
        s"case $i diverged")
    }
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

  test("vc with non-hex signature chars fails closed, not garbage-decoded") {
    val kp = seededKeyPair("Ed25519", 7L)
    val doc = DidVc.buildVcDoc("VC1", "did:example:iss", "did:example:sub",
      "M1", "D1", "2024-01-01T00:00:00Z")
    val vc = DidVc.signVc(doc, kp.getPrivate.getEncoded,
      "2024-01-01T00:00:00Z", "did:example:iss#key-1")
    // Corrupt the proof hex with non-hex characters: unhex must throw
    // (caught by verifyVc's catch-all → false), never map them to
    // garbage bytes that happen to decode.
    val sigHex = """"signatureValue": "([0-9a-f]+)"""".r
      .findFirstMatchIn(vc).get.group(1)
    val bad = vc.replace(sigHex, "zz" + sigHex.drop(2))
    assert(!DidVc.verifyVc(bad, kp.getPublic.getEncoded))
    // Odd-length hex (truncated by one char) must also fail closed, not
    // silently drop the trailing nibble and verify against a short sig.
    val odd = vc.replace(sigHex, sigHex.drop(1))
    assert(!DidVc.verifyVc(odd, kp.getPublic.getEncoded))
  }

  test("kdf cache distinguishes boundary-shifted passphrase/salt pairs") {
    // ("ab","cd") and ("abc","d") concatenate to the same byte stream; a
    // delimiter-free cache key would serve the first pair's derived key
    // to the second. The PBKDF2 outputs genuinely differ, so equality
    // here could ONLY come from a key collision.
    val k1 = CryptoFunctions.passphraseKey("ab", "cd".getBytes("UTF-8"))
    val k2 = CryptoFunctions.passphraseKey("abc", "d".getBytes("UTF-8"))
    assert(!java.util.Arrays.equals(k1, k2),
      "cache served a boundary-shifted pair the wrong derived key")
  }

  test("jaro_winkler: textbook values, DuckDB conventions, codegen path") {
    import graft.functions.JaroWinkler.similarity
    assert(math.abs(similarity("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(similarity("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    // Boost threshold is EXCLUSIVE at 0.7: jaro('ax','az') = 2/3 with a
    // 1-char prefix — a boosted value would be 0.7.
    assert(similarity("ax", "az") == 2.0 / 3.0)
    // DuckDB conventions: empty strings score 0 (not the RapidFuzz 1.0
    // for two empties) — probed directly in DuckDB 1.0.0:
    // jaro_winkler_similarity('','') = jaro_winkler_similarity('','a')
    // = jaro_winkler_similarity('a','') = 0.0. Odd matched-but-different
    // counts FLOOR on halving (dacebcca/aecda has 3 mismatched matches
    // -> t=1, not 1.5).
    assert(similarity("", "") == 0.0 && similarity("", "abc") == 0.0 &&
      similarity("abc", "") == 0.0)
    assert(math.abs(similarity("dacebcca", "aecda") - 0.8083333333333333) < 1e-12)
    assert(similarity("abc", "abc") == 1.0)
    // Symmetry on random strings.
    val rnd = new scala.util.Random(11)
    def rs() = (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 200).foreach { _ =>
      val (a, b) = (rs(), rs())
      assert(similarity(a, b) == similarity(b, a), s"asymmetric on $a/$b")
    }
    // Expression path: registered function evaluates inside codegen and
    // honors null-in -> null-out.
    val spark = SparkTestSession.spark
    import spark.implicits._
    graft.functions.JaroWinklerExpr.register(spark)
    val df = Seq(("martha", Option("marhta")), ("x", None))
      .toDF("a", "b")
      .selectExpr("jaro_winkler(a, b) AS s")
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).exists(v => math.abs(v - 0.9611111111111111) < 1e-15))
    assert(got(1).isEmpty, "null input must yield null")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEval") && !plan.contains("ScalaUDF"),
      "jaro_winkler must plan as a native expression, not a UDF")
  }
}
