package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hottest scalar kernels —
  * the (b)-tier of the custom-operator preference order: the
  * higher-order-function compositions are correct but allocate
  * intermediate arrays per row (split → transform → zip_with each
  * materialize); these fuse the whole kernel into one pass over the
  * raw bytes/arrays and participate in whole-stage codegen via a
  * static helper call (the same pattern Spark's own regexp/json
  * expressions use).
  *
  * Both are bit-exact replacements for their HOF twins (asserted over
  * the full fixture corpus + edge cases in FunctionsSpec), so swapping
  * them into registered queries cannot move any oracle result.
  */

/** simhash64_native(text): 64-bit SimHash over ASCII-whitespace
  * tokens of lower(text), token hash = xxhash64(seed 42) — identical
  * semantics to the `aggregate(sequence(0,63),...)` HOF form in
  * [[graft.llm.DedupQueries.simhash64]], including Java-regex `\s+`
  * split artifacts (leading/trailing empty tokens).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  // ExpectsInputTypes needs the private[sql] AbstractDataType; manual
  // type check instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64_native requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_native"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** cosine_sim(a, b): cosine similarity of two array<double> in one
  * fused pass (dot + both norms per element). Null if either array is
  * null, lengths differ, or any element is null — matching the
  * zip_with+aggregate null semantics of
  * [[graft.llm.SimilarityQueries.cosine]].
  */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else GraftKernels.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code =
      code"""
            |${leftGen.code}
            |${rightGen.code}
            |boolean ${ev.isNull} = true;
            |double ${ev.value} = 0.0;
            |if (!${leftGen.isNull} && !${rightGen.isNull}) {
            |  Double $boxed = graft.functions.GraftKernels.cosineSim(
            |    ${leftGen.value}, ${rightGen.value});
            |  if ($boxed != null) {
            |    ${ev.isNull} = false;
            |    ${ev.value} = $boxed.doubleValue();
            |  }
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Static kernels referenced from generated code (plain object =>
  * static forwarders, Java-name-clean for janino).
  */
object GraftKernels {

  private final val Seed = 42L

  /** One-pass SimHash: scan lowercased bytes, hash each
    * ASCII-whitespace-delimited run with xxhash64(seed 42), vote per
    * bit, no token array ever materialized. Replicates Java-regex
    * `split("\\s+", -1)`: a leading whitespace run yields a leading
    * empty token; a trailing run yields a trailing empty token.
    */
  def simhash64(s: UTF8String): Long = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes // may copy; bounded by row size
    val n = bytes.length
    val votes = new Array[Int](64)

    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }

    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

    // Fields of split("\s+", -1): the text between consecutive
    // maximal whitespace runs, plus the (possibly empty) head field
    // before the first run and tail field after the last.
    var prev = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        val runStart = i
        while (i < n && isWs(bytes(i))) i += 1
        vote(hashRange(bytes, prev, runStart))
        prev = i
      } else i += 1
    }
    vote(hashRange(bytes, prev, n)) // tail field ("" for empty input)

    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long =
    XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, until - from, Seed)

  /** Fused cosine: dot + norms in one pass. Null (boxed) when lengths
    * differ or any element is null — zip_with+aggregate semantics.
    */
  def cosineSim(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
