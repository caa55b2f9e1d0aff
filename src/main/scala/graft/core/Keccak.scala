package graft.core

/** Keccak-256 (original Keccak padding 0x01, NOT NIST SHA3-256's 0x06) —
  * matches the reference's `sha3::Keccak256` (reference src/hasher/mod.rs:33).
  * Public-spec implementation of Keccak-f[1600], rate 1088 bits.
  */
object Keccak {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L
  )

  // Rotation offsets for lane (x, y) at index x + 5*y.
  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14
  )

  private def rotl(x: Long, n: Int): Long =
    if (n == 0) x else (x << n) | (x >>> (64 - n))

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // rho + pi: b[y, 2x+3y] = rot(a[x, y])
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(x + 5 * y), ROT(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) =
            b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  private final val Rate = 136 // bytes, for 256-bit output

  /** Keccak-256 digest (32 bytes). */
  def hash256(input: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    // absorb full blocks
    var off = 0
    while (input.length - off >= Rate) {
      absorb(state, input, off, Rate)
      keccakF(state)
      off += Rate
    }
    // last (partial) block with multi-rate padding 0x01 … 0x80
    val last = new Array[Byte](Rate)
    System.arraycopy(input, off, last, 0, input.length - off)
    last(input.length - off) = 0x01
    last(Rate - 1) = (last(Rate - 1) | 0x80).toByte
    absorb(state, last, 0, Rate)
    keccakF(state)
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      val lane = state(i)
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((lane >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  private def absorb(state: Array[Long], block: Array[Byte], off: Int, len: Int): Unit = {
    var i = 0
    while (i < len / 8) {
      var lane = 0L
      var j = 7
      while (j >= 0) {
        lane = (lane << 8) | (block(off + i * 8 + j) & 0xffL)
        j -= 1
      }
      state(i) ^= lane
      i += 1
    }
  }
}
