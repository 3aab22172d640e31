package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over `array<float>` /
  * `array<double>` columns.
  *
  * Rationale (scale): the higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates an intermediate
  * array per row and evaluates a lambda per element; these expressions
  * walk the two ArrayData buffers once with primitive accumulators —
  * the hot path of the similarity-search/near-dup operators where the
  * candidate-pair count (not the table size) dominates. Accumulation is
  * double-precision and strictly sequential so results are deterministic
  * and engine-independent.
  */
abstract class VectorFoldExpression extends BinaryExpression {

  // Inputs must be array<float> or array<double>; these expressions are
  // constructed via VectorOps over known embedding columns, so the check
  // is a constructor-time require rather than an ExpectsInputTypes
  // contract (TypeCollection is private[sql] in Spark 4).
  override def dataType: DataType = DoubleType

  @inline private def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other      => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  protected def leftEt: DataType  = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightEt: DataType = right.dataType.asInstanceOf[ArrayType].elementType

  protected def fold(l: Any, r: Any)(f: (Double, Double, Double) => Double): Double = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lt, rt) = (leftEt, rightEt)
    var acc = 0d
    var i = 0
    while (i < n) { acc = f(acc, get(a, i, lt), get(b, i, rt)); i += 1 }
    acc
  }

  /** Java accessor snippet for element `i` of an ArrayData variable,
    * widened to double — element type is known at codegen time. */
  protected def accessor(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case _         => s"$arr.getDouble($i)"
  }
}

/** dot(a, b) = Σ a_i * b_i, double accumulation. Participates in
  * whole-stage codegen: the generated code is a primitive loop over the
  * two ArrayData buffers — no lambda dispatch, no intermediate array. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(l: Any, r: Any): Any = fold(l, r)((acc, x, y) => acc + x * y)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${accessor(a, i, leftEt)} * ${accessor(b, i, rightEt)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (||a|| * ||b||); 0.0 when either norm is 0.
  * Codegen: one primitive loop accumulating dot and both norms. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "cosine_sim"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${accessor(a, i, leftEt)};
         |  final double $y = ${accessor(b, i, rightEt)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lt, rt) = (leftEt, rightEt)
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = lt match {
        case FloatType => a.getFloat(i).toDouble
        case _         => a.getDouble(i)
      }
      val y = rt match {
        case FloatType => b.getFloat(i).toDouble
        case _         => b.getDouble(i)
      }
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0d || nb == 0d) 0d else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
