package graft.core

import java.security.MessageDigest

/** The 9-algorithm digest registry, mirroring the reference's hasher trait +
  * registry surface (reference src/hasher/mod.rs:7-108): `name`, byte→byte
  * `hash`, lookup by name, and the canonical algorithm enumeration.
  *
  * All digests are deterministic, thread-safe (MessageDigest instances are
  * created per call — cheap vs. the digest itself) and total on any byte
  * input; null handling lives at the SQL layer.
  */
sealed trait Hasher extends Serializable {
  def name: String
  def digestLength: Int
  def hash(input: Array[Byte]): Array[Byte]
}

object Hashers {

  sealed class Jdk private[Hashers] (
      val name: String, algo: String, val digestLength: Int
  ) extends Hasher {
    // one MessageDigest per thread, reset between calls — getInstance per
    // row costs more than short digests themselves in the build hot loop
    @transient private lazy val local: ThreadLocal[MessageDigest] =
      ThreadLocal.withInitial(() => MessageDigest.getInstance(algo))
    def hash(input: Array[Byte]): Array[Byte] = {
      val md = local.get()
      md.reset()
      md.digest(input)
    }
  }

  object Md5 extends Jdk("md5", "MD5", 16)
  object Sha1 extends Jdk("sha1", "SHA-1", 20)
  object Sha256 extends Jdk("sha256", "SHA-256", 32)
  object Sha512 extends Jdk("sha512", "SHA-512", 64)

  case object Keccak256 extends Hasher {
    val name = "keccak256"; val digestLength = 32
    def hash(input: Array[Byte]): Array[Byte] = Keccak.hash256(input)
  }
  case object Ripemd160Hasher extends Hasher {
    val name = "ripemd160"; val digestLength = 20
    def hash(input: Array[Byte]): Array[Byte] = Ripemd160.hash(input)
  }
  case object Blake3Hasher extends Hasher {
    val name = "blake3"; val digestLength = 32
    def hash(input: Array[Byte]): Array[Byte] = Blake3.hash(input)
  }
  /** Bitcoin address hash: RIPEMD160(SHA256(x)) (reference src/hasher/mod.rs:50-61). */
  case object Hash160 extends Hasher {
    val name = "hash160"; val digestLength = 20
    def hash(input: Array[Byte]): Array[Byte] =
      Ripemd160.hash(Sha256.hash(input))
  }
  /** Bitcoin txid hash: SHA256(SHA256(x)) (reference src/hasher/mod.rs:64-75). */
  case object Hash256 extends Hasher {
    val name = "hash256"; val digestLength = 32
    def hash(input: Array[Byte]): Array[Byte] =
      Sha256.hash(Sha256.hash(input))
  }

  /** Canonical order, mirrors `available_algorithms()` (reference src/hasher/mod.rs:92-104). */
  val all: Seq[Hasher] = Seq(
    Md5, Sha1, Sha256, Sha512, Keccak256, Ripemd160Hasher, Blake3Hasher,
    Hash160, Hash256
  )

  val names: Seq[String] = all.map(_.name)

  private val byName: Map[String, Hasher] = all.map(h => h.name -> h).toMap

  /** Lookup, mirrors `get_hasher` (reference src/hasher/mod.rs:77-90). */
  def apply(name: String): Hasher =
    byName.getOrElse(
      name.toLowerCase,
      throw new IllegalArgumentException(
        s"Unknown algorithm: $name (available: ${names.mkString(", ")})")
    )

  def get(name: String): Option[Hasher] = byName.get(name.toLowerCase)

  def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
