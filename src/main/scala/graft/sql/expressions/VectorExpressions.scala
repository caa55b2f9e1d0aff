package graft.sql.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen dot product over two numeric arrays, accumulating left-to-right
  * in double — bitwise-identical to
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (s,x)=>s+x)` but ~50× faster:
  * higher-order-function lambdas are interpreted per element, while this
  * compiles to a tight fused loop inside whole-stage codegen. The hot inner
  * kernel of every similarity/dedup operator over embeddings.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  /** A null ELEMENT (containsNull arrays — parquet list elements are
    * nullable by default) yields a null result rather than a silently
    * wrong product: ArrayData.getFloat on a null slot returns an
    * undefined value.
    */
  override def nullable: Boolean = super.nullable || elementsNullable

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // per-element null guard only when the static type says elements can
      // be null — the common containsNull=false case keeps the tight loop
      val guard =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  $s += (double) $a.$aGet($i) * (double) $b.$bGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen matrix-vector product: `rows` dot products of the input vector
  * against a CONSTANT row-major matrix, in one expression — each row
  * accumulated left-to-right in double exactly like [[FloatVecDot]].
  *
  * This exists for plan-size reasons, not arithmetic ones: the LSH/RP
  * paths need dozens of projections per vector, and phrasing them as N
  * separate literal-array dot expressions makes Catalyst analyze and
  * whole-stage-codegen compile an N×dim-literal plan — measured ~7 s of
  * one-time cost for the 48-projection embedding-LSH pipeline. One
  * matrix expression keeps the plan a single constant-reference node:
  * same results, constant-size generated source.
  */
case class FloatMatVec(child: Expression, matrix: Array[Double], rows: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dim: Int = if (rows == 0) 0 else matrix.length / rows

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_mat_vec"

  /** Null ELEMENTS (containsNull arrays) null the whole result, exactly
    * like [[FloatVecDot]].
    */
  override def nullable: Boolean = super.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _)
        if rows > 0 && matrix.length == rows * dim =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> input and a rows-divisible " +
            s"matrix, got $t with ${matrix.length} weights / $rows rows")
    }

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val isFloat = childIsFloat
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * matrix(r * dim + i)
        i += 1
      }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (childIsFloat) "getFloat" else "getDouble"
    val m = ctx.addReferenceObj("matrix", matrix, "double[]")
    val nullable = child.dataType.asInstanceOf[ArrayType].containsNull
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val guard =
        if (nullable)
          s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows && !${ev.isNull}; $r++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $guard
         |    $s += (double) $v.$get($i) * $m[$r * $dim + $i];
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatMatVec =
    copy(child = newChild)
}
