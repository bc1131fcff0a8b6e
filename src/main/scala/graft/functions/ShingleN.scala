package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-gram word shingles with EMPTY-if-short semantics — the
  * decontamination family's gram builder (d7's 13-grams), native replacement
  * for `CASE WHEN size(t) < n THEN array() ELSE
  * array_distinct(transform(sequence(1, size(t)-n+1),
  * i -> concat_ws(' ', slice(t, i, n)))) END`.
  *
  * Differs from [[Shingle3]] in BOTH contract points, matching the chains
  * they each replace: short docs yield an EMPTY array (a doc shorter than
  * the contamination gram cannot match, where near-dup shingling falls back
  * to whole-text), and a gram joins its tokens with `concat_ws` semantics
  * (null tokens skipped, never a null gram).
  *
  * `n` must be a foldable positive literal — the gram width is a plan-time
  * constant, not data.
  */
case class ShingleN(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shinglen expects (array<string>, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(tokens: Any, width: Any): Any =
    ShingleN.compute(tokens.asInstanceOf[ArrayData], width.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (t, n) => s"${ev.value} = graft.functions.ShingleN.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shinglen"
}

object ShingleN {
  private val SPACE = UTF8String.fromString(" ")

  def compute(arr: ArrayData, width: Int): ArrayData = {
    require(width > 0, s"shinglen gram width must be positive, got $width")
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](width)
    var i = 0
    while (i + width <= n) {
      var j = 0
      while (j < width) {
        // concat_ws semantics: null tokens are skipped, not gram-nulling
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
