package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashcat-style mask candidate generator — a wordlist source that
  * SYNTHESIZES its words instead of reading them (beyond the reference's
  * file/stdin/url/aspell/seclists set, but squarely its domain: mask
  * attack candidates are what hash databases get probed with).
  *
  * A mask is a sequence of positions: `?l` (a-z), `?u` (A-Z), `?d`
  * (0-9), `?s` (common symbols), `?a` (all of the above), or a literal
  * character. The expansion is the cartesian product of the position
  * charsets — generated as `spark.range(0, N)` with each position
  * decoded from the row index by stride arithmetic
  * (`charset[(id div stride) mod size]`), a pure codegen projection on
  * the range source: NO driver-side materialization, NO explode chain,
  * and `range` splits into partitions, so a 10¹⁰-candidate mask streams
  * across a cluster with per-partition work and zero shuffle. The same
  * arithmetic replays in any engine with a range table function, which
  * is what lets DuckDB oracle the expansion verbatim.
  */
object MaskSource {

  private val Classes: Map[Char, String] = Map(
    'l' -> "abcdefghijklmnopqrstuvwxyz",
    'u' -> "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    'd' -> "0123456789",
    's' -> "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ ")

  /** Parse a mask into per-position charsets. `?a` = l+u+d+s; any other
    * `?x` is an error; a bare character is a 1-char literal position.
    */
  def charsets(mask: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < mask.length) {
      if (mask(i) == '?') {
        require(i + 1 < mask.length, s"dangling '?' in mask: $mask")
        val c = mask(i + 1)
        out += (if (c == 'a') Classes('l') + Classes('u') + Classes('d') + Classes('s')
                else if (c == '?') "?"
                else Classes.getOrElse(c,
                  sys.error(s"unknown mask class ?$c in: $mask")))
        i += 2
      } else { out += mask(i).toString; i += 1 }
    }
    out.result()
  }

  /** Total candidate count for a mask (product of charset sizes). */
  def cardinality(mask: String): Long =
    charsets(mask).map(_.length.toLong).product

  /** Expand a mask into one `word` per candidate, `spark.range`-backed.
    * Position p (leftmost varying slowest) has stride = product of the
    * sizes to its right; its character is `cs[(id div stride) mod |cs|]`.
    */
  def expand(spark: SparkSession, mask: String): DataFrame = {
    val cs = charsets(mask)
    val n = cardinality(mask)
    require(n > 0, s"empty expansion for mask: $mask")
    val strides = cs.scanRight(1L)((s, acc) => s.length * acc).tail
    val chars = cs.zip(strides).map { case (set, stride) =>
      if (set.length == 1) lit(set)
      else {
        val esc = set.replace("\\", "\\\\").replace("'", "\\'")
        expr(s"substr('$esc', CAST(id DIV ${stride}L % ${set.length} AS INT) + 1, 1)")
      }
    }
    spark.range(0, n).select(concat(chars: _*).as("word"))
  }
}
