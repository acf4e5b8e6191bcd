package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The register arithmetic, shared by the Catalyst aggregate below and
  * the streaming [[graft.streaming.TwsHll]] processor (whose per-key
  * ValueState IS one of these buffers): md5-derived bucket/rank,
  * bytewise-max merge, integer estimator with linear-counting
  * small-range correction — the exact math of the compositional
  * `llm_hll_distinct` query, so every consumer shares its DuckDB twin.
  */
object Hll {
  val M = 64 // registers; rank fits a byte (1..33)

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  /** Fold one md5 hex digest into the registers: first 8 hex chars →
    * bucket, next 8 → rank source (same substrings as the SQL form's
    * conv(substring(md5(x),1,8),16,10) / (...,9,8)).
    */
  def addHex(regs: Array[Byte], hex: String): Unit = {
    val bucket = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % M).toInt
    val w = java.lang.Long.parseLong(hex.substring(8, 16), 16)
    val rho =
      (if (w == 0L) 33 else java.lang.Long.numberOfLeadingZeros(w) - 31).toByte
    if (rho > regs(bucket)) regs(bucket) = rho
  }

  def add(regs: Array[Byte], value: UTF8String): Unit =
    addHex(regs, GraftKernels.md5Hex(value))

  def addString(regs: Array[Byte], value: String): Unit =
    add(regs, UTF8String.fromString(value))

  /** Bytewise max INTO `into` — order/partitioning-invariant. */
  def mergeInto(into: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > into(i)) into(i) = other(i)
      i += 1
    }
    into
  }

  def estimate(regs: Array[Byte]): Long = {
    var s = 0L
    var v = 0
    var i = 0
    while (i < M) {
      s += 1L << (33 - regs(i))
      if (regs(i) > 0) v += 1
      i += 1
    }
    val raw = (709L * 4096L * 8589934592L) / (s * 1000L)
    if (raw <= 160L && v < M)
      math.round(64.0 * math.log(64.0 / (M - v)))
    else raw
  }
}

/** hll_est(value): engine-owned HyperLogLog distinct-count AGGREGATE as
  * a native Catalyst `TypedImperativeAggregate` — the (b)-tier custom
  * operator for the sketch family, one level up from the scalar kernels:
  * where [[graft.llm.CorpusStatsQueries]]'s compositional HLL carries
  * its registers as (group, bucket) ROWS through a two-level groupBy,
  * this aggregate carries them as a fixed 64-BYTE buffer per group —
  * `update` folds a row into a register max, `merge` is bytewise max
  * (the mergeable-sketch contract expressed exactly where Catalyst
  * expects it), and the shuffled partial state per group is 64 bytes
  * regardless of input cardinality. At a high-cardinality GROUP BY
  * (per-token-per-day distinct counts over 100 TB) that is the
  * difference between shuffling 64 rows per group and one small binary.
  *
  * Arithmetic is IDENTICAL to the compositional query (md5-derived
  * bucket/rank, integer Σ2^(33−M), α·m²·2^33 DIV, linear-counting
  * small-range correction), so its result is DuckDB-oracle-checkable
  * with the same SQL twin, and CorpusStatsSpec asserts native ==
  * compositional == sequential-fold on the fixture.
  */
case class HllEstAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_est"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_est requires STRING, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllEstAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllEstAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllEstAgg =
    copy(child = newChildren.head)
}
