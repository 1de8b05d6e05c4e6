package graft.functions

/** Deterministic, process-stable 64-bit hashing.
  *
  * The reference keys its caches on .NET `GetHashCode`, which is randomized
  * per process — SURVEY §7.3 calls out that bit parity is impossible and
  * pointless; what matters is a stable, well-mixed engine-owned hash. This
  * is FNV-1a 64 over UTF-8 plus a splitmix64 finalizer, with seed support
  * for building independent hash families (minhash, LSH bands).
  */
object StableHash {

  /** splitmix64 finalizer — strong avalanche, cheap. */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then finalized. */
  def hashString(s: String, seed: Long = 0L): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Combine an existing hash with a seed — used to derive the j-th hash
    * function of a family from one base hash (h_j(x) = mix(h(x) ^ mix(j))). */
  @inline def rehash(h: Long, j: Long): Long = mix64(h ^ mix64(j))

  def popcount(x: Long): Int = java.lang.Long.bitCount(x)
}
