package graft.queries

import graft.Tables
import graft.functions.{CryptoFunctions, Debezium, DidVc, JsonCanon}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function family (SURVEY.md §2.9) exercised end-to-end.
  *
  * Crypto round-trips have no SQL-expressible oracle for the signature
  * bytes, so those queries output the **verified count** and the oracle is
  * the table cardinality — the hash only matches if every per-row
  * sign→verify round-trip succeeded in the Spark engine. This mirrors the
  * reference's own oracle (verified_count == inserted,
  * test_cases/test_a_classic_sig_pg.py:88-110).
  */
object FuncQueries {

  /** The test parquet files are single-row-group (one scan partition), so
    * CPU-bound crypto stages must repartition to use all cores; on a real
    * cluster this is the same move — crypto throughput scales with
    * executors, and the shuffle is negligible next to the per-row cost.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** U1: Ed25519 mission-signature round-trip over orders (the classic-sig
    * path A: sign payload, store, re-verify all).
    */
  def u1SigRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val kp = CryptoFunctions.seededKeyPair("Ed25519", 42L)
    val priv = kp.getPrivate.getEncoded
    val pub = kp.getPublic.getEncoded
    val signU = CryptoFunctions.sign_udf("Ed25519")
    val verifyU = CryptoFunctions.verify_udf("Ed25519")
    spread(Tables.orders(spark, d))
      .withColumn("payload",
        concat(col("o_orderkey").cast("string"), lit("|"), col("o_orderpriority"))
          .cast("binary"))
      .withColumn("sig", signU(lit(priv), col("payload")))
      .withColumn("ok", verifyU(lit(pub), col("payload"), col("sig")))
      .filter(col("ok"))
      .agg(count(lit(1)).as("verified"))
  }

  /** U2+U5+U6: full VC lifecycle — mint DIDs, build the W3C VC doc, sign
    * its canonical JSON, then verify through storage (JSON string column).
    */
  def u2VcRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val kp = CryptoFunctions.seededKeyPair("Ed25519", 7L)
    val priv = kp.getPrivate.getEncoded
    val pub = kp.getPublic.getEncoded
    val issuer = DidVc.mintDid("issuer-fixture")
    val buildSign = udf((custkey: Long) =>
      DidVc.signVc(
        DidVc.buildVcDoc(s"VC$custkey", issuer, DidVc.mintDid(s"C$custkey"),
          s"M$custkey", s"D$custkey", "2024-01-01T00:00:00Z"),
        priv, "2024-01-01T00:00:00Z", s"$issuer#key-1"))
      .asNondeterministic() // optimizer barrier — see CryptoFunctions.sign_udf
    val verifyU = DidVc.verify_vc_udf(pub)
    spread(Tables.customer(spark, d))
      .withColumn("vc_json", buildSign(col("c_custkey")))
      .withColumn("ok", verifyU(col("vc_json")))
      .filter(col("ok"))
      .agg(count(lit(1)).as("verified"))
  }

  /** U3: ECDSA P-256 round-trip over supplier names. */
  def u3EcdsaRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val kp = CryptoFunctions.seededKeyPair("EC", 42L)
    val priv = kp.getPrivate.getEncoded
    val pub = kp.getPublic.getEncoded
    val signU = CryptoFunctions.sign_udf("EC")
    val verifyU = CryptoFunctions.verify_udf("EC")
    spread(Tables.supplier(spark, d))
      .withColumn("sig", signU(lit(priv), col("s_name").cast("binary")))
      .withColumn("ok", verifyU(lit(pub), col("s_name").cast("binary"), col("sig")))
      .filter(col("ok"))
      .agg(count(lit(1)).as("verified"))
  }

  /** U7: hybrid RSA-OAEP + AES-GCM encrypt → decrypt+verify round-trip over
    * document text, via typed binary columns (the encrypted_vc row shape).
    */
  def u7HybridRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val enc = CryptoFunctions.seededKeyPair("RSA", 1L)
    val sig = CryptoFunctions.seededKeyPair("RSA", 2L)
    val encPub = enc.getPublic.getEncoded
    val encPriv = enc.getPrivate.getEncoded
    val sigPub = sig.getPublic.getEncoded
    val sigPriv = sig.getPrivate.getEncoded
    // asNondeterministic is load-bearing: the UDF draws a fresh AES key and
    // nonce per call, and without it Catalyst's projection collapse
    // re-executes the UDF once per referenced struct field — pairing the
    // key of one encryption with the nonce/ciphertext of another.
    val encryptU = udf((text: String) => {
      val b = CryptoFunctions.hybridEncrypt(encPub, sigPriv, text.getBytes("UTF-8"))
      (b.encKey, b.nonce, b.ciphertext, b.signature)
    }).asNondeterministic()
    val decryptU = udf((ek: Array[Byte], nonce: Array[Byte], ct: Array[Byte],
        s: Array[Byte]) =>
      CryptoFunctions.hybridDecrypt(encPriv, sigPub,
          CryptoFunctions.HybridBlob(ek, nonce, ct, s))
        .map(new String(_, "UTF-8")).orNull)
    spread(Tables.documents(spark, d))
      .withColumn("blob", encryptU(col("text")))
      .withColumn("decrypted", decryptU(col("blob._1"), col("blob._2"),
        col("blob._3"), col("blob._4")))
      .filter(col("decrypted") === col("text"))
      .agg(count(lit(1)).as("verified"))
  }

  /** U4: SHA-256 canonical document hash. */
  def u4Sha256(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("sha"))
      .orderBy(col("doc_id"))

  /** U5: deterministic DID minting from a stable key (uuid form is
    * random; the content-keyed form is the reproducible pipeline variant).
    */
  def u5DidMint(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .select(col("c_custkey"),
        concat(lit("did:example:"), md5(col("c_name").cast("binary"))).as("did"))
      .orderBy(col("c_custkey"))

  /** U6: canonical JSON (Python json.dumps sort_keys=True byte-compat),
    * via the native codegen expression — no UDF boundary in the plan.
    */
  def u6CanonicalJson(spark: SparkSession, d: String): DataFrame = {
    graft.functions.CanonicalJsonExpr.register(spark)
    Tables.events(spark, d)
      .select(col("event_id"),
        call_function("canonical_json", col("props")).as("cj"))
      .orderBy(col("event_id"))
  }

  /** U12: chained-hash document packaging + verification (reference:
    * demo_offline/02_offline_did_and_hash/packaging_with_did_and_hash.py:8-27
    * — each document embeds `hash = sha256(canonical_json(doc))`, and
    * packages chain by hashing over the previous package). Per `source`
    * block: build the DID-document JSON per doc, embed its sha256, verify
    * every embedded hash by re-extracting it from the packaged JSON and
    * recomputing from the body, then fold the packages in doc_id order
    * into a chain head `h_i = sha256(h_{i-1} || packaged_i)`.
    *
    * Scale shape: one chain per block — blocks hash in parallel, and the
    * sequential fold (inherent to hash chaining) runs as a codegen'd
    * `aggregate` over each group's sorted packages, not a driver loop.
    */
  def u12HashChain(spark: SparkSession, d: String): DataFrame = {
    val dj = concat(lit("{\"id\": \"did:example:"),
      md5(col("text").cast("binary")),
      lit("\", \"seq\": "), col("doc_id").cast("string"), lit("}"))
    Tables.documents(spark, d)
      .select(col("source"), col("doc_id"), dj.as("dj"))
      .withColumn("h", sha2(col("dj"), 256))
      .withColumn("packaged",
        concat(lit("{\"hash\": \""), col("h"), lit("\", "),
          expr("substring(dj, 2)")))
      .withColumn("ok",
        get_json_object(col("packaged"), "$.hash") === sha2(col("dj"), 256))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("ok"), 1)).as("verified"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("packaged")))),
            s => s.getField("packaged")),
          lit("GENESIS"),
          (acc, x) => sha2(concat(acc, x), 256)).as("chain_head"))
      .orderBy(col("source"))
  }

  /** U13: encrypted wallet round-trip (reference: demo_offline/05_sqlite —
    * SQLCipher wallet with did_document / verifiable_credential /
    * private_keys tables). Each table is sealed under a passphrase
    * ([[graft.state.Wallet.seal]]: per-row JSON → AES-GCM with a
    * PBKDF2-derived key) and re-opened; `verified` counts rows that
    * survive the decrypt+parse round-trip intact (multiset equality via
    * exceptAll), and a wrong-passphrase open must yield zero rows
    * (`wrong_pass_rows`). Oracle = the same sha256-derived table contents
    * and cardinalities — counts only match if every row round-tripped.
    */
  def u13WalletRoundtrip(spark: SparkSession, d: String): DataFrame = {
    import graft.state.Wallet
    // Fixture pin, not a secret: the reference's own SQLCipher passphrase
    // literal (`PRAGMA key = 'securepassword'`,
    // demo_offline/05_sqlite/02initdb.py) — public test-suite content.
    val pass = "securepassword"
    def metric(name: String, tRaw: DataFrame, keyCol: String,
        ddl: String): DataFrame = {
      // The table feeds three consumers (counts, seal, exceptAll) and the
      // sealed form two (open with right + wrong passphrase): cache both
      // so the sha derivations and the AES pass each run once.
      val t = graft.CacheRegistry.register(tRaw.cache())
      val sealedT = graft.CacheRegistry.register(Wallet.seal(t, pass).cache())
      val opened = Wallet.open(sealedT, pass, ddl)
      val wrong = Wallet.open(sealedT, "wrong-passphrase", ddl)
      t.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(keyCol)).as("n_distinct"))
        .crossJoin(t.exceptAll(opened).agg(count(lit(1)).as("missing")))
        .crossJoin(wrong.agg(count(lit(1)).as("wrong_pass_rows")))
        .select(lit(name).as("tbl"), col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("missing")).as("verified"),
          col("wrong_pass_rows"))
    }
    metric("did_document", Wallet.didDocuments(spark, d), "did",
        "did STRING, public_key STRING, service_endpoint STRING")
      .unionByName(metric("private_keys", Wallet.privateKeys(spark, d), "did",
        "did STRING, private_key STRING"))
      .unionByName(metric("verifiable_credential",
        Wallet.verifiableCredentials(spark, d), "vc_id",
        "vc_id STRING, issuer STRING, holder STRING, credential_data STRING, signature STRING"))
      .orderBy(col("tbl"))
  }

  /** U14: W3C DID Document builder with `verificationMethod[]` (reference:
    * demo_offline/01_offline_did/packaging_with_did.py:8-17 — @context /
    * id / verificationMethod array with controller, key id, type, and
    * publicKeyBase58; the reference uses a placeholder key string, here
    * the key material is a real base58 encoding). The document is
    * canonical JSON (sorted keys, CPython separators) and hashed; base58
    * is computed positionally with `div`/`mod` column arithmetic — fully
    * codegen'd, no UDF — over a 60-bit key digest, so the DuckDB oracle
    * re-derives every byte including the base58 digits.
    */
  def u14DidDocument(spark: SparkSession, d: String): DataFrame = {
    val alpha = Base58Alphabet
    // 11 base58 digits cover 58^11 > 2^60; most-significant first.
    val b58 = expr((10 to 0 by -1).map { k =>
      val p = BigInt(58).pow(k).toLong
      s"substr('$alpha', CAST((val div ${p}L) % 58 AS INT) + 1, 1)"
    }.mkString("concat(", ", ", ")"))
    Tables.customer(spark, d)
      .select(col("c_custkey"),
        concat(lit("did:example:"), md5(col("c_name").cast("binary"))).as("did"))
      .withColumn("val",
        conv(substring(sha2(col("did").cast("binary"), 256), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("public_key_b58", b58)
      .withColumn("doc", concat(
        lit("{\"@context\": \"https://w3id.org/did/v1\", \"id\": \""),
        col("did"),
        lit("\", \"verificationMethod\": [{\"controller\": \""), col("did"),
        lit("\", \"id\": \""), col("did"),
        lit("#keys-1\", \"publicKeyBase58\": \""), col("public_key_b58"),
        lit("\", \"type\": \"Ed25519VerificationKey2018\"}]}")))
      .select(col("c_custkey"), col("did"), col("public_key_b58"),
        sha2(col("doc").cast("binary"), 256).as("doc_sha"))
      .orderBy(col("c_custkey"))
  }

  private val Base58Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  private def u14Oracle: String = {
    val digits = (10 to 0 by -1).map { k =>
      val p = BigInt(58).pow(k).toLong
      s"substr('$Base58Alphabet', ((val // $p) % 58)::INT + 1, 1)"
    }.mkString(" || ")
    s"""WITH d0 AS (
       |  SELECT c_custkey, 'did:example:' || md5(c_name) AS did FROM customer),
       |v AS (
       |  SELECT c_custkey, did,
       |    list_reduce(list_transform(range(1, 16),
       |      i -> (strpos('0123456789abcdef',
       |              substr(sha256(did), i::INT, 1)) - 1)::BIGINT),
       |      (acc, x) -> acc * 16 + x) AS val
       |  FROM d0),
       |b AS (
       |  SELECT c_custkey, did, $digits AS public_key_b58 FROM v)
       |SELECT c_custkey, did, public_key_b58,
       |  sha256('{"@context": "https://w3id.org/did/v1", "id": "' || did ||
       |    '", "verificationMethod": [{"controller": "' || did ||
       |    '", "id": "' || did || '#keys-1", "publicKeyBase58": "' ||
       |    public_key_b58 ||
       |    '", "type": "Ed25519VerificationKey2018"}]}') AS doc_sha
       |FROM b ORDER BY c_custkey""".stripMargin
  }

  /** U8: hex encoding of byte content. */
  def u8Hex(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), hex(substring(col("text"), 1, 16)).as("hx"))
      .orderBy(col("doc_id"))

  /** U10: epoch-millisecond extraction. */
  def u10EpochMs(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_id"), unix_millis(col("ts")).as("ms"))
      .orderBy(col("event_id"))

  /** U16: calendar-function alignment — the migration-hazard pin for
    * date semantics: day-of-week NUMBERING differs between engines
    * (Spark `dayofweek` is 1=Sunday, DuckDB `dayofweek` is 0=Sunday),
    * so both sides normalize to ISO (1=Monday..7=Sunday) with explicit
    * arithmetic; `last_day` month-end resolution and `add_months`
    * end-of-month CLAMPING (Jan 31 + 1 month = Feb 29) are pinned
    * corpus-wide through exact day-of-month sums per (ISO dow,
    * quarter). One conditional-sum scan.
    */
  def u16CalendarProfile(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(to_date(col("o_orderdate")).as("dt"))
      .select((((dayofweek(col("dt")) + 5) % 7) + 1).as("dow_iso"),
        quarter(col("dt")).as("q"),
        dayofmonth(last_day(col("dt"))).cast("long").as("eom_day"),
        dayofmonth(add_months(col("dt"), 1)).cast("long").as("nm_day"))
      .groupBy(col("dow_iso"), col("q"))
      .agg(count(lit(1)).as("n"), sum(col("eom_day")).as("sum_eom_day"),
        sum(col("nm_day")).as("sum_nm_day"))
      .orderBy(col("dow_iso"), col("q"))

  /** U17: string-function alignment — the companion migration pin to
    * u16 for the string surface: 1-based substring (positive AND
    * negative start), split_part, lpad, translate, reverse, and
    * 1-based first-occurrence search (Spark `instr` == DuckDB
    * `strpos`), composed into one per-row fingerprint and hash-pinned
    * corpus-wide. The pinned subset is the SAFE one: probing found
    * `substr(s, 0, n)` diverges (Spark clamps start 0 to 1 and returns
    * n chars; DuckDB spends a position and returns n−1) and DuckDB's
    * `left(s, -k)` means all-but-last-k where Spark returns empty —
    * both excluded and documented here so nobody reintroduces them.
    */
  def u17StringProfile(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .select(col("c_custkey"),
        concat_ws("|",
          substring(col("c_name"), 10, 4),
          lpad(split_part(col("c_name"), lit("#"), lit(2)), 12, "0"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou"),
          reverse(substring(col("c_name"), -3, 3)),
          instr(col("c_name"), "0").cast("string")).as("fp"))
      .orderBy(col("c_custkey"))

  /** U11: Debezium envelope build (insert events for the users table). */
  def u11DebeziumEnvelope(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .filter(col("event_type") === "signup")
      .select(col("event_id"),
        Debezium.envelope(
          Debezium.nullRow,
          struct(col("user_id").as("id"),
            concat(lit("u"), col("user_id").cast("string")).as("name")),
          lit("c"), unix_millis(col("ts")), "users").as("env"))
      .orderBy(col("event_id"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_sig_roundtrip" -> u1SigRoundtrip,
    "u2_vc_roundtrip" -> u2VcRoundtrip,
    "u3_ecdsa_roundtrip" -> u3EcdsaRoundtrip,
    "u7_hybrid_roundtrip" -> u7HybridRoundtrip,
    "u4_sha256" -> u4Sha256,
    "u5_did_mint" -> u5DidMint,
    "u6_canonical_json" -> u6CanonicalJson,
    "u8_hex" -> u8Hex,
    "u12_hash_chain" -> u12HashChain,
    "u13_wallet_roundtrip" -> u13WalletRoundtrip,
    "u14_did_document" -> u14DidDocument,
    "u10_epoch_ms" -> u10EpochMs,
    "u16_calendar_profile" -> u16CalendarProfile,
    "u17_string_profile" -> u17StringProfile,
    "u11_debezium_envelope" -> u11DebeziumEnvelope)

  val oracles: Map[String, String] = Map(
    // Crypto round-trips: oracle = cardinality; Spark side only matches if
    // every signature/decryption verified (see object scaladoc).
    "u1_sig_roundtrip" -> "SELECT count(*) AS verified FROM orders",
    "u2_vc_roundtrip" -> "SELECT count(*) AS verified FROM customer",
    "u3_ecdsa_roundtrip" -> "SELECT count(*) AS verified FROM supplier",
    "u7_hybrid_roundtrip" -> "SELECT count(*) AS verified FROM documents",
    "u4_sha256" ->
      "SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id",
    "u5_did_mint" ->
      """SELECT c_custkey, 'did:example:' || md5(c_name) AS did
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "u6_canonical_json" ->
      """SELECT event_id, '{"k": ' || (props->>'$.k') || '}' AS cj
        |FROM events ORDER BY event_id""".stripMargin,
    "u8_hex" ->
      """SELECT doc_id, hex(substr(text, 1, 16)) AS hx
        |FROM documents ORDER BY doc_id""".stripMargin,
    "u14_did_document" -> u14Oracle,
    // Wallet: DuckDB re-derives the same sha256-built table contents; the
    // engine's verified/wrong_pass_rows only match if AES-GCM round-trips
    // succeeded for every row and the wrong key authenticated none.
    "u13_wallet_roundtrip" ->
      """WITH dd AS (
        |  SELECT 'did:example:' || substr(sha256(c_name), 1, 10) AS did
        |  FROM customer),
        |vc AS (
        |  SELECT sha256('did:example:issuer' || did || 'M' || c_custkey) AS vc_id
        |  FROM (SELECT c_custkey,
        |          'did:example:' || substr(sha256(c_name), 1, 10) AS did
        |        FROM customer))
        |SELECT 'did_document' AS tbl, count(*) AS n_rows,
        |  count(DISTINCT did) AS n_distinct, count(*) AS verified,
        |  0::BIGINT AS wrong_pass_rows FROM dd
        |UNION ALL SELECT 'private_keys', count(*), count(DISTINCT did),
        |  count(*), 0::BIGINT FROM dd
        |UNION ALL SELECT 'verifiable_credential', count(*),
        |  count(DISTINCT vc_id), count(*), 0::BIGINT FROM vc
        |ORDER BY tbl""".stripMargin,
    // Derived end-to-end: DuckDB rebuilds the same packaged docs and folds
    // the same chain; `verified` is the cardinality (the engine count only
    // matches if every embedded hash re-verified — the u1 pattern).
    "u12_hash_chain" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    '{"id": "did:example:' || md5(text) || '", "seq": ' || doc_id || '}' AS dj
        |  FROM documents),
        |p AS (
        |  SELECT source, doc_id,
        |    '{"hash": "' || sha256(dj) || '", ' || substr(dj, 2) AS packaged
        |  FROM d)
        |SELECT source, count(*) AS n_docs, count(*) AS verified,
        |  list_reduce(list_prepend('GENESIS', list(packaged ORDER BY doc_id)),
        |    (acc, x) -> sha256(acc || x)) AS chain_head
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "u17_string_profile" ->
      """SELECT c_custkey,
        |  substr(c_name, 10, 4) || '|'
        |  || lpad(split_part(c_name, '#', 2), 12, '0') || '|'
        |  || translate(c_mktsegment, 'AEIOU', 'aeiou') || '|'
        |  || reverse(substr(c_name, -3, 3)) || '|'
        |  || CAST(strpos(c_name, '0') AS VARCHAR) AS fp
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // Oracle is PURE integer arithmetic (civil-from-days, the Hinnant
    // algorithm) on the epoch-day delta — no dayofweek/last_day/INTERVAL
    // builtins, whose numbering and month-clamping conventions are the
    // engine-version-labile surface this gate exists to pin. The ONLY
    // date builtins used are CAST-to-DATE and date subtraction, both
    // proven against the driver's checker by the green c1 gate. The
    // decomposition is verified against DuckDB's own year/month/day/
    // isodow on every distinct order date (0 mismatches, DuckDB 1.0.0).
    "u16_calendar_profile" ->
      """WITH b AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS ed FROM orders),
        |cd AS (
        |  SELECT ed, doy - (153 * mp + 2) // 5 + 1 AS dom,
        |    CASE WHEN mp < 10 THEN mp + 3 ELSE mp - 9 END AS m,
        |    yraw + CASE WHEN mp >= 10 THEN 1 ELSE 0 END AS yr
        |  FROM (
        |    SELECT ed, yoe + era * 400 AS yraw, doy, (5 * doy + 2) // 153 AS mp
        |    FROM (
        |      SELECT ed, era, yoe,
        |        doe - (365 * yoe + yoe // 4 - yoe // 100) AS doy
        |      FROM (
        |        SELECT ed, era, doe,
        |          (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365 AS yoe
        |        FROM (
        |          SELECT ed, (ed + 719468) // 146097 AS era,
        |            (ed + 719468) % 146097 AS doe
        |          FROM b)))) t),
        |dim AS (
        |  SELECT (ed + 3) % 7 + 1 AS dow_iso,
        |    (m + 2) // 3 AS q,
        |    CASE WHEN m = 2 THEN 28 + CASE WHEN (yr % 4 = 0 AND yr % 100 <> 0)
        |        OR yr % 400 = 0 THEN 1 ELSE 0 END
        |      WHEN m IN (4, 6, 9, 11) THEN 30 ELSE 31 END AS eom_day,
        |    least(dom,
        |      CASE WHEN (CASE WHEN m = 12 THEN 1 ELSE m + 1 END) = 2
        |        THEN 28 + CASE WHEN ((yr + CASE WHEN m = 12 THEN 1 ELSE 0 END) % 4 = 0
        |            AND (yr + CASE WHEN m = 12 THEN 1 ELSE 0 END) % 100 <> 0)
        |          OR (yr + CASE WHEN m = 12 THEN 1 ELSE 0 END) % 400 = 0
        |          THEN 1 ELSE 0 END
        |        WHEN (CASE WHEN m = 12 THEN 1 ELSE m + 1 END) IN (4, 6, 9, 11)
        |        THEN 30 ELSE 31 END) AS nm_day
        |  FROM cd)
        |SELECT dow_iso, q, count(*) AS n,
        |  CAST(sum(eom_day) AS BIGINT) AS sum_eom_day,
        |  CAST(sum(nm_day) AS BIGINT) AS sum_nm_day
        |FROM dim GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "u10_epoch_ms" ->
      "SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events ORDER BY event_id",
    "u11_debezium_envelope" ->
      """SELECT event_id,
        |  '{"payload":{"after":{"id":' || user_id || ',"name":"u' || user_id ||
        |  '"},"before":null,"op":"c","source":{"connector":"graft","db":"graftdb","table":"users"},"ts_ms":' ||
        |  epoch_ms(CAST(ts AS TIMESTAMP)) || '}}' AS env
        |FROM events WHERE event_type = 'signup' ORDER BY event_id""".stripMargin)
}
