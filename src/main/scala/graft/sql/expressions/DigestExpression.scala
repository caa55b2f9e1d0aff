package graft.sql.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{Hasher, Hashers}

/** Codegen-capable digest over binary input, modeled on Spark's own
  * `org.apache.spark.sql.catalyst.expressions.Md5` so the hash projection
  * stays inside whole-stage codegen. Covers the reference's 9-algorithm
  * hasher registry (reference src/hasher/mod.rs:13-75) — including the
  * algorithms Spark has no built-in for (keccak256 / ripemd160 / blake3 /
  * hash160 / hash256).
  *
  * StringType inputs arrive via implicit cast to their UTF-8 bytes, which
  * matches the reference hashing `word.as_bytes()`.
  */
case class Digest(child: Expression, algo: String)
    extends UnaryExpression {

  @transient private lazy val hasher: Hasher = Hashers(algo)

  private def isString = child.dataType == StringType

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"graft_$algo"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string or binary input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    if (isString) hasher.hash(input.asInstanceOf[UTF8String].getBytes)
    else hasher.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("hasher", hasher, classOf[Hasher].getName)
    if (isString) defineCodeGen(ctx, ev, c => s"$h.hash($c.getBytes())")
    else defineCodeGen(ctx, ev, c => s"$h.hash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Digest =
    copy(child = newChild)
}
