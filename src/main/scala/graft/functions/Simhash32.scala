package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash signature of a token set in ONE pass — the per-doc
  * PROJECTION replacement for the explode -> groupBy(doc) -> 32 x
  * SUM(bit-term) aggregation shape: same signature, but no token fan-out row
  * stream, no shuffle, and one md5 per token instead of one per (token, bit).
  *
  * Bit semantics are identical to the aggregation chain (and the DuckDB
  * oracle's hex-lookup CTEs): bit j of a token is bit `j % 4` (MSB-first) of
  * hex digit `j / 4` of the token's lowercase-hex md5; the signature's char
  * j is '1' when the +1/-1 majority vote over tokens is >= 0 (ties -> '1').
  * Null token elements are skipped (their aggregation rows contributed
  * nothing after explode dropped... they couldn't occur; preserved for
  * safety); a NULL array yields NULL.
  *
  * At 100 TB the aggregation shape shuffles every (doc, token) pair just to
  * regroup what was already grouped — this expression keeps the signature
  * computation inside the document scan.
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    Simhash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Simhash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object Simhash32 {
  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val digest = md.digest()
        // bits come from the first 8 hex chars = first 4 digest bytes;
        // hex digit j/4 of the lowercase hex string is the high nibble of
        // byte j/8 when (j/4) is even, the low nibble otherwise; within a
        // digit, bit j%4 counts from the MSB (the hexToBits lookup order)
        var j = 0
        while (j < 32) {
          val hexDigit =
            if ((j / 4) % 2 == 0) (digest(j / 8) >> 4) & 0xf
            else digest(j / 8) & 0xf
          val bit = (hexDigit >> (3 - (j % 4))) & 1
          votes(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 32) {
      out(j) = if (votes(j) >= 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
