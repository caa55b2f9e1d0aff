package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SipHash core pinned two independent ways:
  *  - the published SipHash-2-4 vectors from the reference implementation
  *    (github.com/veorq/SipHash `vectors.h`: key 000102…0f over inputs
  *    00,01,02,…);
  *  - Guava's `Hashing.sipHash24` (an unrelated implementation that ships
  *    with Spark) over randomized keys and lengths.
  * SipHash-1-3 — what the Rust `bloomfilter`/`siphasher` crates use — is
  * the identical machinery with (c=1, d=3), so pinning 2-4 pins the
  * rounds, init, and finalization shared by both.
  */
class SipHashSpec extends AnyFunSuite {

  private val k0 = 0x0706050403020100L // LE of 00 01 .. 07
  private val k1 = 0x0f0e0d0c0b0a0908L
  private def input(n: Int): Array[Byte] = Array.tabulate(n)(_.toByte)

  test("SipHash-2-4 matches the published reference vectors") {
    val expected = Map(
      0 -> 0x726fdb47dd0e0e31L,
      1 -> 0x74f839c593dc67fdL,
      8 -> 0x93f5f5799a932462L,
      15 -> 0xa129ca6149be45e5L
    )
    for ((n, want) <- expected)
      assert(SipHash.hash24(k0, k1, input(n)) == want,
        s"length $n: got ${SipHash.hash24(k0, k1, input(n)).toHexString}")
  }

  test("SipHash-2-4 agrees with Guava's independent implementation") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val key0 = rnd.nextLong(); val key1 = rnd.nextLong()
      val data = Array.fill(rnd.nextInt(100))(rnd.nextInt().toByte)
      val guava = com.google.common.hash.Hashing.sipHash24(key0, key1)
        .hashBytes(data).asLong()
      assert(SipHash.hash24(key0, key1, data) == guava,
        s"key=($key0,$key1) len=${data.length}")
    }
  }

  test("SipHash-1-3 is deterministic, keyed, and length-sensitive") {
    val a = SipHash.hash13(k0, k1, input(32))
    assert(a == SipHash.hash13(k0, k1, input(32)))
    assert(a != SipHash.hash13(k0 + 1, k1, input(32)))
    assert(a != SipHash.hash13(k0, k1, input(31)))
  }
}
