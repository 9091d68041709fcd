package graft.sim

/** Cross-engine-reproducible hashing constants, shared by the Scala
  * kernels (graft.functions.Kernels md5_48 / minhashSigPortable /
  * simhash48) and the DuckDB oracle SQL that ExtQueries generates —
  * both sides read THESE values, so the arithmetic can't drift.
  *
  * The production dedup path hashes with xxhash64 (faster, and Spark
  * ships a codegen'd implementation); the portable path derives a
  * 48-bit hash from the first 12 hex chars of MD5, which every engine
  * with an `md5()` string function can reproduce exactly. 48 bits keeps
  * every intermediate (including a 31-bit × 31-bit permutation product)
  * inside a signed 64-bit integer in engines without unsigned types.
  */
object PortableHash {

  /** Modulus for the MinHash permutation family: the Mersenne prime
    * 2^31 − 1. Products a*h with a,h < P stay under 2^62.
    */
  val P = 2147483647L

  /** Multiplier of permutation i — (2i+1) · Knuth's 2654435761, mod P.
    * Odd, non-zero mod P (P is prime and neither factor ≡ 0).
    */
  def permA(i: Int): Long = ((2L * i + 1L) * 2654435761L) % P

  /** Offset of permutation i. */
  def permB(i: Int): Long = (2654435769L * (i + 1L) + 40503L) % P

  /** Number of fingerprint bits in the portable SimHash (fits the
    * 48-bit hash width).
    */
  val SimhashBits = 48
}
