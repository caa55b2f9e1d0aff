package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Known-answer vectors from the reference (tests/integration.rs:8-96) plus
  * property checks the reference lacks.
  */
class HashersSpec extends AnyFunSuite {

  private val helloVectors = Map(
    "md5" -> "5d41402abc4b2a76b9719d911017c592",
    "sha1" -> "aaf4c61ddcc5e8a2dabede0f3b482cd9aea9434d",
    "sha256" -> "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824",
    "sha512" -> ("9b71d224bd62f3785d96d46ad3ea3d73319bfbc2890caadae2dff72519673ca7" +
      "2323c3d99ba5c11d7c7acc6e14b8c5da0c4663475c2e5c3adef46f73bcdec043"),
    "hash160" -> "b6a9c8c230722b7c748331a8b450f05566dc7d0f",
    "hash256" -> "9595c9df90075148eb06860365df33584b75bff782a510c6cd4883a419833d50",
    "keccak256" -> "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8",
    "blake3" -> "ea8f163db38682925e4491c5e58d4bb3506ef8c14eb78a86e908c5624a67200f",
    "ripemd160" -> "108f07b8382412612c048d07d13f814118445acd"
  )

  for ((algo, expected) <- helloVectors)
    test(s"""$algo("hello") matches the reference vector""") {
      assert(Hashers.hex(Hashers(algo).hash("hello".getBytes(UTF_8))) == expected)
    }

  test("""sha256("password") matches the reference README""") {
    assert(
      Hashers.hex(Hashers("sha256").hash("password".getBytes(UTF_8))) ==
        "5e884898da28047151d0e56f8dc6292773603d0d6aabbdd62a11ef721d1542d8")
  }

  test("blake3 of empty input (reference content-hash tests)") {
    assert(
      Hashers.hex(Blake3.hash(Array.emptyByteArray)) ==
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
  }

  test("blake3 multi-block and multi-chunk inputs (public test vectors)") {
    // From the official BLAKE3 test vector set: input bytes are i % 251.
    def in(n: Int): Array[Byte] = Array.tabulate(n)(i => (i % 251).toByte)
    val expected = Map(
      1024 -> "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7",
      1025 -> "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444",
      2048 -> "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a",
      3072 -> "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2"
    )
    for ((n, hex) <- expected)
      assert(Hashers.hex(Blake3.hash(in(n))) == hex, s"length $n")
  }

  test("blake3 deep-tree inputs (cross-checked vs tools/blake3_crosscheck.py)") {
    // ≥4-chunk trees exercise subtree chunk-counter offsets and the
    // power-of-two left-split that the official short vectors above don't.
    def in(n: Int): Array[Byte] = Array.tabulate(n)(i => (i % 251).toByte)
    val expected = Map(
      4096 -> "015094013f57a5277b59d8475c0501042c0b642e531b0a1c8f58d2163229e969",
      5120 -> "9cadc15fed8b5d854562b26a9536d9707cadeda9b143978f319ab34230535833",
      5121 -> "628bd2cb2004694adaab7bbd778a25df25c47b9d4155a55f8fbd79f2fe154cff",
      8192 -> "aae792484c8efe4f19e2ca7d371d8c467ffb10748d8a5a1ae579948f718a2a63",
      10000 -> "5f81f9e4ab67627b6b036d5d4e3bc40d9d3daa6fcc2b6dd07ab2bbf0a877da54",
      31744 -> "62b6960e1a44bcc1eb1a611a8d6235b6b4b78f32e7abc4fb4c6cdcce94895c47"
    )
    for ((n, hex) <- expected)
      assert(Hashers.hex(Blake3.hash(in(n))) == hex, s"length $n")
  }

  test("keccak256 of empty input (public vector)") {
    assert(
      Hashers.hex(Keccak.hash256(Array.emptyByteArray)) ==
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("ripemd160 of standard spec vectors") {
    def h(s: String) = Hashers.hex(Ripemd160.hash(s.getBytes(UTF_8)))
    assert(h("") == "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(h("abc") == "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(h("message digest") == "5d0689ef49d2fae572b881b123a85ffa21595f36")
  }

  test("keccak256 multi-block inputs (cross-checked vs tools/keccak_crosscheck.py)") {
    // Vectors produced by the independent Python implementation in
    // tools/keccak_crosscheck.py (two implementations from the public spec
    // agreeing pins the multi-block absorb + padding edges: 135 = rate-1,
    // 136 = exactly one block, 137 = first multi-block).
    def in(n: Int): Array[Byte] = Array.tabulate(n)(i => (i % 251).toByte)
    val expected = Map(
      135 -> "cbdfd9dee5faad3818d6b06f95a219fd290b0e1706f6a82e5a595b9ce9faca62",
      136 -> "7ce759f1ab7f9ce437719970c26b0a66ff11fe3e38e17df89cf5d29c7d7f807e",
      137 -> "ac73d4fae68b8453f764007c1a20ce95994187861f0c3227a3a8e99a73a3b1db",
      200 -> "bfb0aa97863e797943cf7c33bb7e880bb4543f3d2703c0923c6901c2af57b890",
      272 -> "8e2476e65823b24d96ebe239f2c1534cdf763e689e2410c3b1cb0c74e6177bfc",
      1000 -> "af692982e84a5a9688359025660a7857cd28ee7c8d867cfa1677baf2e6d1f63b"
    )
    for ((n, hex) <- expected)
      assert(Hashers.hex(Keccak.hash256(in(n))) == hex, s"length $n")
  }

  test("registry: lookup is case-insensitive, unknown rejects, order matches reference") {
    assert(Hashers("SHA256") == Hashers.Sha256)
    intercept[IllegalArgumentException](Hashers("nope"))
    assert(Hashers.names == Seq("md5", "sha1", "sha256", "sha512", "keccak256",
      "ripemd160", "blake3", "hash160", "hash256"))
  }

  test("property: digests are deterministic with declared lengths") {
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val bs = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(bs)
      Hashers.all.foreach { h =>
        val d = h.hash(bs)
        assert(d.length == h.digestLength)
        assert(java.util.Arrays.equals(d, h.hash(bs)))
      }
    }
  }
}
