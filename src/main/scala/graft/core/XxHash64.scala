package graft.core

import java.nio.charset.StandardCharsets

/** Pure-Scala xxHash64 (public algorithm, https://xxhash.com spec).
  *
  * Single source of truth for `url_hash` / `host_hash` across the engine,
  * the reference simulator, and the corpus generator — every component
  * keys off the same 64-bit hash so the URL-seen set is comparable
  * bit-for-bit between the distributed engine and the single-threaded
  * oracle (SURVEY.md §5.1).
  */
object XxHash64 {
  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  def hashString(s: String, seed: Long = 0L): Long =
    hash(s.getBytes(StandardCharsets.UTF_8), seed)

  def hashLong(v: Long, seed: Long = 0L): Long = {
    var h = seed + P5 + 8L
    val k = java.lang.Long.rotateLeft(v * P2, 31) * P1
    h ^= k
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    avalanche(h)
  }

  def hash(bytes: Array[Byte], seed: Long = 0L): Long = {
    val len = bytes.length
    var i = 0
    var h: Long = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, readLong(bytes, i))
        v2 = round(v2, readLong(bytes, i + 8))
        v3 = round(v3, readLong(bytes, i + 16))
        v4 = round(v4, readLong(bytes, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len.toLong
    while (i + 8 <= len) {
      h ^= round(0L, readLong(bytes, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (readInt(bytes, i) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (bytes(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    avalanche(h)
  }

  @inline private def round(acc: Long, v: Long): Long =
    java.lang.Long.rotateLeft(acc + v * P2, 31) * P1

  @inline private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
}
