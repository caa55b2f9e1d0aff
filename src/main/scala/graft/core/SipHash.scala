package graft.core

/** SipHash-c-d (Aumasson & Bernstein; public reference implementation at
  * github.com/veorq/SipHash) — keyed 64-bit PRF over a byte string.
  *
  * Needed for the reference engine's footer bloom interop
  * (`/root/reference/src/storage/parquet.rs:204-256`): the Rust
  * `bloomfilter` 1.0.16 crate keys its probes with SipHash-1-3
  * (`siphasher::sip::SipHasher13`). The rounds are parameterized so the
  * same core can be pinned against Guava's independent SipHash-2-4 and
  * the published 2-4 test vectors — SipHash-1-3 is then the identical
  * machinery with (c=1, d=3).
  */
object SipHash {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  @inline private def le64(a: Array[Byte], i: Int): Long =
    (a(i) & 0xffL) | ((a(i + 1) & 0xffL) << 8) | ((a(i + 2) & 0xffL) << 16) |
      ((a(i + 3) & 0xffL) << 24) | ((a(i + 4) & 0xffL) << 32) |
      ((a(i + 5) & 0xffL) << 40) | ((a(i + 6) & 0xffL) << 48) |
      ((a(i + 7) & 0xffL) << 56)

  /** SipHash-2-4, the original published parameterization. */
  def hash24(k0: Long, k1: Long, data: Array[Byte]): Long =
    hash(2, 4, k0, k1, data)

  /** SipHash-1-3, the variant Rust's std hasher and `bloomfilter` use. */
  def hash13(k0: Long, k1: Long, data: Array[Byte]): Long =
    hash(1, 3, k0, k1, data)

  def hash(c: Int, d: Int, k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = k0 ^ 0x736f6d6570736575L
    var v1 = k1 ^ 0x646f72616e646f6dL
    var v2 = k0 ^ 0x6c7967656e657261L
    var v3 = k1 ^ 0x7465646279746573L

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      val m = le64(data, i)
      v3 ^= m
      var r = 0; while (r < c) { round(); r += 1 }
      v0 ^= m
      i += 8
    }

    // final block: remaining 0..7 bytes, length in the top byte
    var b = (n.toLong & 0xff) << 56
    var shift = 0
    while (i < n) { b |= (data(i) & 0xffL) << shift; shift += 8; i += 1 }
    v3 ^= b
    var r = 0; while (r < c) { round(); r += 1 }
    v0 ^= b

    v2 ^= 0xff
    r = 0; while (r < d) { round(); r += 1 }
    v0 ^ v1 ^ v2 ^ v3
  }
}
