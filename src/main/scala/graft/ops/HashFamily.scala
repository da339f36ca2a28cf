package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE derived-from-one-md5 hash family (q147's discipline), in one
  * place: hb = first 12 md5 hex digits of a value's string rendering as
  * a 48-bit integer; member j of the family is (hb·(2j+1)+j) mod 2^48 —
  * a universal-ish family whose products never overflow a BIGINT, which
  * is what keeps every consumer (count-min buckets, bloom bit positions,
  * minhash components) bit-identical between Spark and the DuckDB
  * oracles. Column and JVM spellings live side by side so driver-side
  * consumers (bloom point reads) can never drift from the engine's.
  *
  * DuckDB oracle spelling of [[hb48]]:
  * `CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)`.
  */
object HashFamily {

  private val Mod48 = 1L << 48

  /** 48-bit md5 head of a STRING column's UTF-8 bytes. */
  def hb48(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")

  /** Family member j of hb, reduced mod `m` (bucket/bit position).
    * `j` may be a literal or a column (e.g. an exploded 0..k-1). */
  def bucket(hb: Column, j: Column, m: Int): Column =
    ((hb * (j * 2 + 1) + j) % Mod48) % m

  /** Full (un-bucketed) family member j of hb — the 48-bit value MinHash
    * components minimize over (q147's signature discipline; DuckDB
    * spelling: `(hb * (2*j+1) + j) % 281474976710656`). */
  def member(hb: Column, j: Column): Column =
    (hb * (j * 2 + 1) + j) % Mod48

  /** THE whitespace normalization every content fingerprint in this repo
    * shares: lowercase, then collapse runs of the PINNED class
    * `[ \t\n\x0B\f\r]+` to one space (never `\s` — Java's `\s` includes
    * `\x0B`, RE2's does not, and the class is spelled out so both engines
    * tokenize identically; OracleContractSpec lints the oracle side).
    * DuckDB spelling:
    * `regexp_replace(lower(x), '[ \t\n\x0B\f\r]+', ' ', 'g')`. */
  def normText(text: Column): Column =
    regexp_replace(lower(text), "[ \\t\\n\\x0B\\f\\r]+", " ")

  /** md5 hex of the normalized content — the repo's one document
    * fingerprint (dedup keys, split assignment, sampling draws all derive
    * from THIS digest; a drifted copy forks the fingerprint family, so
    * every site routes through here). DuckDB spelling:
    * `md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))`. */
  def normMd5(text: Column): Column = md5(normText(text).cast("binary"))

  /** Seeded fingerprint: md5('<seed>:' || normalized content) — the
    * deterministic per-seed draw used by the sampling family. DuckDB:
    * `md5('<seed>:' || regexp_replace(lower(text), '…', ' ', 'g'))`. */
  def normMd5Seeded(seed: String, text: Column): Column =
    md5(concat(lit(seed + ":"), normText(text)).cast("binary"))

  /** Driver-side twin of [[hb48]] — identical bytes, identical result. */
  def hb48Jvm(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(dig.take(6).map("%02x".format(_)).mkString, 16)
  }

  /** Driver-side twin of [[bucket]]. */
  def bucketJvm(hb: Long, j: Int, m: Int): Long =
    ((hb * (2 * j + 1) + j) % Mod48) % m
}
