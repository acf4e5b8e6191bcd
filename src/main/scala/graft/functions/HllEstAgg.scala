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
  val M = 64 // default registers; rank fits a byte (1..33)

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  /** m-register buffer for the precision-knob form (`hll_est(x, m)`) —
    * the ES `precision_threshold` role: expected relative error is
    * ~1.04/√m, so m=4096 buys ~1.6% at a 4 KB partial state per group
    * (still corpus-size-independent; only the per-GROUP constant
    * grows). m must be 64 (the legacy register count whose integer
    * estimator existing oracles pin bit-for-bit) or ≥128, where the
    * standard α_m = 0.7213/(1+1.079/m) applies.
    */
  def emptyRegisters(m: Int): Array[Byte] = {
    require(m == M || (m >= 128 && m <= 65536),
      s"hll_est registers must be 64 or in [128, 65536], got $m")
    new Array[Byte](m)
  }

  /** Fold one md5 hex digest into the registers: first 8 hex chars →
    * bucket (mod the buffer's register count), next 8 → rank source
    * (same substrings as the SQL form's
    * conv(substring(md5(x),1,8),16,10) / (...,9,8)).
    */
  def addHex(regs: Array[Byte], hex: String): Unit = {
    val bucket = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % regs.length).toInt
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
    require(into.length == other.length,
      s"hll merge register-count mismatch: ${into.length} vs ${other.length}")
    var i = 0
    while (i < into.length) {
      if (other(i) > into(i)) into(i) = other(i)
      i += 1
    }
    into
  }

  /** Integer estimator, register count read from the buffer size. The
    * m=64 branch is the EXACT legacy arithmetic (709/1000·m²·2^33 DIV)
    * that llm_hll_distinct/llm_hll_native's DuckDB twins pin; m ≥ 128
    * uses the standard α_m = 0.7213/(1+1.079/m) as the exact rational
    * 7213·m / (10·(1000m+1079)) through BigInt (the numerator
    * overflows a long at m=4096 — its DuckDB twin runs in HUGEINT).
    * Small-range linear counting cuts in below 5m/2 (=160 at m=64,
    * the legacy threshold) with v < m.
    */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var s = 0L
    var v = 0
    var i = 0
    while (i < m) {
      s += 1L << (33 - regs(i))
      if (regs(i) > 0) v += 1
      i += 1
    }
    val raw =
      if (m == M) (709L * 4096L * 8589934592L) / (s * 1000L)
      else (BigInt(7213) * m * m * m * BigInt(8589934592L) /
        (BigInt(10) * (1000L * m + 1079) * s)).toLong
    if (raw <= (5L * m) / 2 && v < m)
      math.round(m.toDouble * math.log(m.toDouble / (m - v)))
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
  *
  * The optional second argument is the REGISTER COUNT m (the ES
  * `precision_threshold` role): a foldable int, 64 (default — the
  * legacy estimator existing oracles pin) or 128..65536, buying
  * ~1.04/√m expected relative error for an m-byte partial state per
  * group. `search_facets_cardinality`/`rel_approx_agg` run m=4096
  * (~1.6%, 4 KB/group), still corpus-size-independent.
  */
case class HllEstAgg(
    child: Expression,
    registers: Expression =
      org.apache.spark.sql.catalyst.expressions.Literal(64),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child, registers)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_est"

  private lazy val m: Int = registers.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"hll_est requires STRING, got ${child.dataType.sql}")
    else if (!registers.foldable ||
      !Seq[DataType](IntegerType, LongType, ShortType, ByteType)
        .contains(registers.dataType))
      TypeCheckResult.TypeCheckFailure(
        "hll_est register count must be a foldable integer literal")
    // A foldable NULL (hll_est(x, CAST(NULL AS INT))) passes the two
    // checks above; guard before `m` dereferences it or the analyzer
    // surfaces an NPE instead of a type error.
    else if (registers.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "hll_est register count must be a non-NULL integer literal")
    else if (m != 64 && (m < 128 || m > 65536))
      TypeCheckResult.TypeCheckFailure(
        s"hll_est register count must be 64 or in [128, 65536], got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters(m)

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
    copy(child = newChildren(0), registers = newChildren(1))
}
