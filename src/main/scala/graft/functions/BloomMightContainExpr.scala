package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Map-side membership prefilter against a BROADCAST Bloom filter —
  * the mechanism that keeps a candidate-pruning set out of the shuffle.
  *
  * The exact-substring pair finder's cost at scale is its
  * positions-scale shuffles (one row per character position of the
  * corpus); only positions whose gram can actually PAIR (gram present
  * in ≥ 2 documents) contribute any output, and on a real corpus those
  * are a small fraction. A `left_semi` against the pairable-gram set
  * would itself shuffle the full positions frame — the very cost being
  * cut — and AQE can only broadcast that set while it fits the 10 MB
  * runtime threshold. This expression instead ships the set as an O(1)
  * plan handle (a torrent-broadcast [[BloomFilter]] — same pattern as
  * [[BroadcastArrayExpr]]) and evaluates membership INSIDE the scan
  * stage, before any exchange, at one hash probe per row inside
  * whole-stage codegen.
  *
  * CORRECTNESS CONTRACT: callers may use this ONLY as a candidate
  * prefilter whose false positives are semantically harmless (the
  * Bloom guarantees no false NEGATIVES — nothing that should pair is
  * dropped; a leaked non-member must be removed by an exact filter
  * downstream or be harmless by construction). It must never implement
  * an output-defining predicate by itself.
  *
  * Sizing: the filter is built distributedly (`df.stat.bloomFilter` —
  * only the bitmap reaches the driver) at ~9.6 bits/item for fpp 1%;
  * a 30M-gram dup set is a ~36 MB broadcast. At cluster scale the
  * caller raises fpp or skips the prefilter — the dial is theirs;
  * this expression just evaluates the handle it is given. The one
  * production caller ([[graft.llm.DedupQueries]]'s substring pair
  * finder) holds that dial since round 13:
  * `DedupQueries.substrBloomPlan` caps the bitmap at a bits budget
  * (fpp derived from budget/n) and skips past the utility point, so
  * a 10¹⁰⁺-gram corpus can no longer ask the driver for a 12–120 GB
  * allocation.
  */
case class BloomMightContainExpr(child: Expression,
                                 bc: Broadcast[BloomFilter],
                                 desc: String)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  /** Executor-local view of the broadcast bitmap — fetched once per
    * deserialized expression instance, never shipped in the plan.
    */
  @transient private lazy val bf: BloomFilter = bc.value

  /** Entry point for generated code. */
  def filter(): BloomFilter = bf

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("graftBloomExpr", this,
      classOf[BloomMightContainExpr].getName)
    val bfType = classOf[BloomFilter].getName
    val bfTerm = ctx.addMutableState(bfType, "graftBloom",
      v => s"$v = ($bfType) $refTerm.filter();")
    defineCodeGen(ctx, ev, c => s"$bfTerm.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Value-free rendering — plan text stays O(1) in set size.
  override def toString: String = s"graft_bloom_might_contain($desc, $child)"
  override def sql: String = toString
}
