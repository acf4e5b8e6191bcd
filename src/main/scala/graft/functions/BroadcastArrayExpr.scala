package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.GraftSqlAccess
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DataType

/** A model artifact (quantizer codebook, per-query ADC table) carried
  * as a SPARK BROADCAST instead of a plan literal.
  *
  * The IVF/PQ family's codebooks were `typedlit(...)` literals: correct
  * and join-free, but the literal bytes live INSIDE the expression
  * tree, so analysis, canonicalization, plan text, and the plan cache
  * all pay O(codebook) per query — harmless at nList=16 × 64 dims,
  * pathological at a 100 TB-grade index (10⁵–10⁶ centroids, plus PQ
  * sub-codebooks). This leaf expression keeps only a torrent-broadcast
  * HANDLE in the plan: executors fetch the value once per node via the
  * broadcast machinery (exactly how Spark ships a broadcast-hash-join
  * table), and the Catalyst conversion to [[ArrayData]] runs once per
  * deserialized expression instance, not per row.
  *
  * Semantics are identical to the literal it replaces — same scala
  * Seq → ArrayData conversion ([[GraftSqlAccess.toCatalyst]] is the
  * converter `typedlit` uses under the hood), same element order, same
  * arithmetic downstream — so swapping it into a registered query
  * cannot move any oracle result.
  *
  * Deliberately NOT foldable: foldable would invite ConstantFolding to
  * eval it into the very inline literal this exists to avoid.
  *
  * Codegen emits a mutable-state global initialized once from the
  * broadcast (`materialized()`), then references the global per row —
  * zero per-row cost, and the generated source names the artifact by
  * `desc`, never by value.
  */
case class BroadcastArrayExpr(bc: Broadcast[AnyRef], dataType: DataType, desc: String)
  extends LeafExpression {

  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_broadcast_array"

  /** Catalyst form of the broadcast value, converted once per
    * (deserialized) expression instance. Transient: the executors
    * re-derive it from the broadcast, the driver never ships it.
    */
  @transient private lazy val converted: ArrayData =
    GraftSqlAccess.toCatalyst(dataType)(bc.value).asInstanceOf[ArrayData]

  /** Entry point for generated code (public static-shaped accessor). */
  def materialized(): ArrayData = converted

  override def eval(input: InternalRow): Any = converted

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("graftBcastExpr", this,
      classOf[BroadcastArrayExpr].getName)
    val arrType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val valueTerm = ctx.addMutableState(arrType, "graftBcastArr",
      v => s"$v = ($arrType) $refTerm.materialized();")
    ExprCode(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.global(valueTerm, dataType))
  }

  // Compact, value-free rendering: the WHOLE POINT is that plan text
  // stays O(1) in codebook size.
  override def toString: String = s"graft_broadcast_array($desc)"
  override def sql: String = toString
}
