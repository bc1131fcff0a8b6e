package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 8 MinHash values of a shingle set in ONE pass — the single-expression
  * replacement for the 10-lambda chain
  * `transform(sh, md5) / transform(sh, md5('x'||t)) / 8 x
  * array_min(transform(h, substring(...)))`.
  *
  * Semantics are bit-identical to that chain (and therefore to the DuckDB
  * oracle's md5-slice CTEs): two lowercase-hex md5 digests per shingle
  * (`md5(t)`, `md5('x' || t)`), each digest's four 8-hex-char slices ranked
  * by lexicographic (= byte, on hex) order, minimum per slice position.
  * Output is the 8-element `array(h0..h7)`; a NULL input array yields NULL
  * and an empty one yields 8 NULL elements — exactly what `array_min` over
  * an empty `transform` result produced.
  *
  * Why an Expression and not the lambda chain: higher-order functions
  * interpret their lambdas per element and materialize three intermediate
  * arrays (two 32-char digest strings per shingle plus eight substring
  * allocations each); this loop digests each shingle once into a stack
  * buffer and keeps only eight 8-byte minima. The minhash projection is the
  * single largest CPU consumer in the dedup family (d2: ~8 task-CPU seconds
  * at sf0.1), which at 100 TB is the difference between a CPU-bound and an
  * IO-bound scan.
  */
case class MinHash8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash8 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    MinHash8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.MinHash8.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash8"
}

object MinHash8 {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private def hex32(digest: Array[Byte], out: Array[Byte]): Unit = {
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(digest(i) & 0xf)
      i += 1
    }
  }

  /** `hex[off, off+8)` vs `min` — bytewise; hex chars are ASCII so this is
    * exactly UTF8String/DuckDB lexicographic order on the slices.
    */
  private def beatsMin(hex: Array[Byte], off: Int, min: Array[Byte]): Boolean = {
    var i = 0
    while (i < 8) {
      val d = (hex(off + i) & 0xff) - (min(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](8))
    val mins = new Array[Array[Byte]](8)
    val md = MessageDigest.getInstance("MD5")
    val hexA = new Array[Byte](32)
    val hexB = new Array[Byte](32)
    var i = 0
    while (i < n) {
      // a null element cannot occur from the shingle builder, but `array_min`
      // skipped nulls, so skip here too rather than NPE
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        md.reset()
        md.update(bytes)
        hex32(md.digest(), hexA)
        md.reset()
        md.update('x'.toByte)
        md.update(bytes)
        hex32(md.digest(), hexB)
        var p = 0
        while (p < 4) {
          val off = p * 8
          if (mins(p) == null || beatsMin(hexA, off, mins(p)))
            mins(p) = java.util.Arrays.copyOfRange(hexA, off, off + 8)
          if (mins(p + 4) == null || beatsMin(hexB, off, mins(p + 4)))
            mins(p + 4) = java.util.Arrays.copyOfRange(hexB, off, off + 8)
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](8)
    var j = 0
    while (j < 8) {
      if (mins(j) != null) out(j) = UTF8String.fromBytes(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
