package graft.state

import graft.Tables
import graft.functions.CryptoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Encrypted wallet surface (SURVEY.md §2 offline-wallet row; reference:
  * demo_offline/05_sqlite/02initdb.py:12-42 — a SQLCipher database keyed by
  * `PRAGMA key = '<passphrase>'` holding three tables: did_document,
  * verifiable_credential, private_keys; 03did_vc_pk.py derives the row
  * contents with sha256).
  *
  * Spark-native model: the wallet is a set of DataFrames sealed at rest —
  * each row JSON-serialized and AES-256-GCM encrypted under a
  * PBKDF2-derived passphrase key ([[CryptoFunctions.passphraseKey]]), the
  * SQLCipher semantic (ciphertext is unreadable and tamper-evident without
  * the passphrase) over ordinary parquet. [[seal]]/[[open]] are inverse
  * row-level transforms; `open` with the wrong passphrase yields zero
  * rows rather than garbage (GCM auth failure ⇒ null ⇒ dropped).
  *
  * Scale: sealing is an embarrassingly parallel map (one UDF call per row,
  * no shuffle); the KDF runs once on the driver, never per row. The
  * encrypt UDF is nondeterministic on purpose — fresh nonce per call (and
  * the usual Catalyst re-execution trap, see CryptoFunctions.sign_udf).
  */
object Wallet {

  val DefaultSalt: Array[Byte] = "graft-wallet-salt-v1".getBytes("UTF-8")

  /** did_document rows derived deterministically from customers (the
    * reference derives did/public_key with sha256: 03did_vc_pk.py:28-33).
    */
  def didDocuments(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(
      concat(lit("did:example:"),
        substring(sha2(col("c_name").cast("binary"), 256), 1, 10)).as("did"))
      .withColumn("public_key", sha2(col("did").cast("binary"), 256))
      .withColumn("service_endpoint",
        concat(lit("https://agent.example/"), col("did")))

  /** verifiable_credential rows (03did_vc_pk.py:56-61: vc_id =
    * sha256(issuer || holder || data), signature = sha256(vc_id)).
    */
  def verifiableCredentials(spark: SparkSession, d: String): DataFrame = {
    val issuer = "did:example:issuer"
    Tables.customer(spark, d).select(
      concat(lit("did:example:"),
        substring(sha2(col("c_name").cast("binary"), 256), 1, 10)).as("holder"),
      concat(lit("M"), col("c_custkey").cast("string")).as("credential_data"))
      .withColumn("issuer", lit(issuer))
      .withColumn("vc_id", sha2(
        concat(col("issuer"), col("holder"), col("credential_data"))
          .cast("binary"), 256))
      .withColumn("signature", sha2(col("vc_id").cast("binary"), 256))
      .select("vc_id", "issuer", "holder", "credential_data", "signature")
  }

  /** private_keys rows (did → key material; sha256-derived stand-in). */
  def privateKeys(spark: SparkSession, d: String): DataFrame =
    didDocuments(spark, d).select(col("did"),
      sha2(concat(lit("pk"), col("did")).cast("binary"), 256).as("private_key"))

  /** Seal a wallet table: each row → canonical JSON → AES-GCM under the
    * passphrase key. Output is (nonce, ciphertext) only — nothing readable
    * without the passphrase.
    *
    * At very large row counts (≳2^32 rows under one key) the random-nonce
    * GCM collision bound applies — see the key-rotation caveat on
    * [[CryptoFunctions.aesGcmEncrypt]]; shard-derived subkeys keep each
    * shard under the bound.
    */
  def seal(table: DataFrame, passphrase: String,
      salt: Array[Byte] = DefaultSalt): DataFrame = {
    val key = CryptoFunctions.passphraseKey(passphrase, salt)
    val enc = udf((json: String) =>
      CryptoFunctions.aesGcmEncrypt(key, json.getBytes("UTF-8")))
      .asNondeterministic() // fresh nonce per call — see scaladoc
    table
      .select(enc(to_json(struct(table.columns.toIndexedSeq.map(col): _*))).as("blob"))
      .select(col("blob._1").as("nonce"), col("blob._2").as("ciphertext"))
  }

  /** Open a sealed wallet table with the row schema (DDL). Rows that fail
    * GCM authentication (wrong passphrase, tampering) are dropped.
    */
  def open(sealedTable: DataFrame, passphrase: String, ddl: String,
      salt: Array[Byte] = DefaultSalt): DataFrame = {
    val key = CryptoFunctions.passphraseKey(passphrase, salt)
    val dec = udf((nonce: Array[Byte], ct: Array[Byte]) =>
      CryptoFunctions.aesGcmDecrypt(key, nonce, ct)
        .map(new String(_, "UTF-8")).orNull)
      .asNondeterministic() // optimizer barrier, not semantics
    sealedTable
      .select(dec(col("nonce"), col("ciphertext")).as("json"))
      .filter(col("json").isNotNull)
      .select(from_json(col("json"), StructType.fromDDL(ddl)).as("r"))
      .select("r.*")
  }
}
