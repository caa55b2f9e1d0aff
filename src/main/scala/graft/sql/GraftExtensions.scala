package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.core.Hashers
import graft.sql.expressions.{Digest, FloatVecDot, NfcNormalize}

/** SQL-surface registration of the engine's expressions, so plain
  * `spark.sql` text can use them:
  *
  *   spark.sql("SELECT graft_keccak256(word) FROM words")
  *   spark.sql("SELECT graft_vec_dot(a.embedding, b.embedding) FROM …")
  *
  * Enable per-session via
  * `.config("spark.sql.extensions", "graft.sql.GraftExtensions")`, or on an
  * existing session with `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    (GraftExtensions.functions ++ GraftExtensions.textFunctions)
      .foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[Digest].getName, null, name, usage, "", "", "",
      "hash_funcs", "4.0.0", "", "built-in")

  private[sql] val functions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Hashers.names.map { algo =>
      val name = s"graft_$algo"
      (FunctionIdentifier(name),
        info(name, s"$name(expr) - $algo digest of a string/binary column as binary."),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name takes exactly one argument")
          Digest(children.head, algo)
        })
    } :+ {
      val name = "graft_vec_dot"
      (FunctionIdentifier(name),
        info(name, s"$name(a, b) - double dot product of two numeric arrays."),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name takes exactly two arguments")
          FloatVecDot(children.head, children(1))
        })
    } :+ {
      val name = "graft_nfc"
      (FunctionIdentifier(name),
        info(name, s"$name(text) - Unicode NFC normalization."),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name takes exactly one argument")
          NfcNormalize(children.head)
        })
    } :+ {
      val name = "graft_nfkc"
      (FunctionIdentifier(name),
        info(name, s"$name(text) - Unicode NFKC (compatibility) normalization."),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name takes exactly one argument")
          NfcNormalize(children.head, nfkc = true)
        })
    }

  /** Text-cleaning ops surfaced as SQL functions. Built from raw Catalyst
    * expression classes (Lower/StringTrim/RegExpReplace) because a
    * function builder must return a REAL expression tree — the Column API
    * produces unresolved ColumnNodes that never pass through the
    * analyzer's node converter on this path. The regex constants are the
    * same ones the Column API uses, so both surfaces stay in lockstep
    * (asserted in GraftExtensionsSpec).
    */
  private[sql] val textFunctions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
    def one(name: String, usage: String)(f: Expression => Expression) =
      (FunctionIdentifier(name), info(name, usage),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name takes exactly one argument")
          f(children.head)
        })
    Seq(
      one("graft_normalize",
        "graft_normalize(text) - canonical lowercase/whitespace-collapsed form.") { e =>
        StringTrim(RegExpReplace(
          RegExpReplace(Lower(e), Literal("[\\x00-\\x1f\\x7f]"), Literal(" ")),
          Literal(" {2,}"), Literal(" ")))
      },
      one("graft_redact_pii",
        "graft_redact_pii(text) - emails/IPv4/phones replaced by placeholders.") { e =>
        import graft.ops.TextClean.{EmailRe, Ipv4Re, PhoneRe}
        RegExpReplace(
          RegExpReplace(
            RegExpReplace(e, Literal(PhoneRe), Literal("<PHONE>")),
            Literal(EmailRe), Literal("<EMAIL>")),
          Literal(Ipv4Re), Literal("<IP>"))
      })
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    (functions ++ textFunctions).foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
