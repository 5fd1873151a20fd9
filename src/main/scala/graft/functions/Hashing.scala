package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing used by the dedup/similarity expressions.
  * FNV-1a over bytes + a splitmix64 finalizer: public-domain constructions,
  * stable across JVMs and partitions (no session/seed state). */
object Hashing {
  final def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    splitmix64(h)
  }

  final def hashUTF8(s: UTF8String): Long = hashBytes(s.getBytes)

  /** k deterministic permutation seeds derived from a base seed. */
  final def permSeeds(seed: Long, k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var s = seed
    var i = 0
    while (i < k) { s = splitmix64(s); out(i) = s; i += 1 }
    out
  }
}
