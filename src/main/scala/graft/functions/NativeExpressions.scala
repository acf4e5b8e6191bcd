package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** simhash_md5(text): two-half (32+32 bit) SimHash over the
  * whitespace tokens of edge-trimmed lower(text), token hash = the 64
  * bits the first 16 hex characters of md5(token) expose. MD5 is the
  * one 64-bit-quality hash BOTH engines compute identically (DuckDB
  * has no xxhash64), which makes the banded near-dup query built on
  * this signature fully DuckDB-oracle-checkable — and the 4×16-bit
  * banding's pigeonhole recall guarantee at hamming ≤ 3 is
  * hash-agnostic, so nothing is lost moving off xxhash64 for this
  * query (the xxhash64 kernel remains the registered fast path for
  * signature-only uses). Packed as [lo, hi] with 32 bits per BIGINT
  * so no half ever sets the sign bit — both engines stay in ordinary
  * non-overflowing BIGINT arithmetic (the llm_ann_binary_topk rule).
  */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.simhashMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
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

/** minhash32_native(shingles): the 32 salted minhashes of an
  * array<string> in ONE pass over the array — hash_i(sh) =
  * xxhash64(sh ++ "#" ++ i, seed 42), exactly the HOF twin
  * `transform(sequence(0,31), i -> array_min(transform(shingles,
  * sh -> xxhash64(concat(sh,'#',i)))))` used by the banded-MinHash
  * dedup, which walks the shingle array 32 times and materializes 32
  * hash arrays per row. Null elements contribute the seed (Spark's
  * xxhash64(NULL) = unchanged seed, which array_min then considers);
  * an empty array yields 32 nulls (array_min of empty). This is the
  * signature pass that streams over the whole corpus at 100 TB — the
  * one worth fusing.
  */
case class MinHash32Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash32_native requires ARRAY<STRING>, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash32_native"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.minhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.minhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash32Expr =
    copy(child = newChild)
}

/** winnow_fps(text): the per-document winnowing fingerprint set
  * (Schleimer/Wilkerson/Aiken SIGMOD'03) — distinct minima of w=4
  * windows over base-31 polynomial hashes of the k=8 char-grams of
  * lower(text). One pass over the raw bytes, no intermediate arrays.
  * A native expression rather than a HOF chain for a load-bearing
  * reason beyond allocation: the HOF form must reference the char
  * array from inside transform() lambdas, and the optimizer inlines
  * that alias into every lambda element (lambda-internal references
  * evade CollapseProject's multi-reference cost check), re-running
  * split() per element — measured 7 min vs 4 s at sf0.01. The twin
  * HOF form lives in [[graft.llm.DedupQueries.winnowFpsHof]] as the
  * semantics spec only (FunctionsSpec pins set-equality).
  * ASCII contract: hashes use the BYTE value, which equals the code
  * point the DuckDB oracle's unicode() sees for ASCII text (the
  * fixture is all-ASCII; non-ASCII would hash UTF-8 bytes instead —
  * still a valid fingerprint, just not oracle-comparable).
  */
case class WinnowFpsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.winnowFps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.winnowFps($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

/** winnow_cfps(text): composite winnowing fingerprints — see
  * [[GraftKernels.winnowCfps]] for the why and the packing contract.
  * Same kernel-over-HOF rationale as [[WinnowFpsExpr]]; the HOF twin
  * is [[graft.llm.DedupQueries.winnowCfpsHof]] (FunctionsSpec pins
  * element equality).
  */
case class WinnowCfpsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_cfps requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_cfps"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.winnowCfps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.winnowCfps($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowCfpsExpr =
    copy(child = newChild)
}

/** cdc_chunks(text): content-defined chunking (the LBFS/rsync cut-point
  * scheme, Muthitacharoen et al. SOSP'01) of lower(text) — a cut after
  * every byte position whose trailing 8-gram base-31 hash ≡ 0 (mod 64),
  * giving ~64-byte expected chunks whose boundaries move WITH the
  * content: an insertion resynchronizes at the next unchanged gram,
  * unlike fixed-size blocks where one insert shifts every later block.
  * Cut decisions depend only on the local gram (no min/max-length
  * guards), so the boundary set is position-independent and the DuckDB
  * oracle mirrors it term-for-term in exact BIGINT arithmetic. Texts
  * shorter than one gram are a single chunk. Same one-pass /
  * no-intermediate-arrays / ASCII-contract rationale as
  * [[WinnowFpsExpr]] (the HOF form would hit the same lambda-inlining
  * trap).
  */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.cdcChunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.cdcChunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** cell_dists(emb, codebook): squared-L2 distance from an
  * array<double> to EVERY centroid of an array<array<double>>
  * codebook, in one fused pass — the quantizer-assignment kernel
  * under every IVF/PQ family member. The HOF twin
  * (`transform(sequence(0,k−1), c => aggregate(zip_with(emb,
  * element_at(cb,c+1), (x,y)=>(x−y)²), 0.0, _+_))`, kept as
  * [[graft.llm.SimilarityQueries.cellDistancesHof]] for the spec
  * twin-pin) allocates a zip_with array per CELL per row — k·dim
  * boxed doubles each assignment — and evaluates the nested lambdas
  * interpreted; this runs the k×dim multiply-adds over the unsafe
  * array data directly. Identical null semantics: a null/short/long
  * centroid or a null element yields a null distance for that cell;
  * summation order is element order, so results are bit-exact vs the
  * HOF fold.
  */
case class CellDistsExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cell_dists requires (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), got " +
          s"(${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "cell_dists"

  override protected def nullSafeEval(emb: Any, cb: Any): Any =
    GraftKernels.cellDists(emb.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, c) => s"graft.functions.GraftKernels.cellDists($e, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellDistsExpr =
    copy(left = newLeft, right = newRight)
}

/** jaro_winkler(a, b): Jaro-Winkler similarity of two strings in one
  * fused pass ([[GraftKernels.jaroWinkler]] — standard parameters,
  * matching DuckDB's `jaro_winkler_similarity` so queries built on it
  * stay oracle-checkable). The dynamic-programming match scan has no
  * reasonable HOF form (two mutable match-flag arrays), so the native
  * kernel IS the primary implementation; FunctionsSpec pins it against
  * an independent sequential reference and published test vectors.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** pq_encode(emb, codebooks): product-quantization encode — for each
  * subspace j of the array<array<array<double>>> codebook, the index
  * of the centroid nearest (squared L2) to emb's j-th sub-vector
  * (elements j·subDim … (j+1)·subDim−1, subDim = the codebook's
  * centroid width). One fused pass per row; the HOF twin
  * ([[graft.llm.SimilarityQueries.pqCodesHof]] — transform over
  * subspaces, aggregate-argmin over centroids, zip_with fold per
  * distance) evaluates m×nCent interpreted lambda folds per row and
  * measured 4× the whole-query cost at sf0.1. Matching the twin's
  * null/edge semantics: a null/width-mismatched centroid or a null
  * emb element skips that centroid (its HOF distance folds to null),
  * a subspace with no valid centroid encodes −1, ties keep the
  * first (lowest-index) centroid.
  */
case class PqEncodeExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDouble2(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), r) if isDouble2(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (ARRAY<DOUBLE>, ARRAY<ARRAY<ARRAY<DOUBLE>>>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(emb: Any, cb: Any): Any =
    GraftKernels.pqEncode(emb.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, c) => s"graft.functions.GraftKernels.pqEncode($e, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** pair_structs(ids): all ordered in-list pairs of an array<bigint> —
  * for each element x, a struct(a = x, b = y) for every y in the array
  * with y > x, in the array's own (outer, inner) order. The kernel
  * behind the posting-list pair expansion in the near-dup family
  * (scoredPairs / winnowPairs): the HOF twin
  * (`flatten(transform(ids, x => transform(filter(ids, y => y > x),
  * y => struct(x, y))))`, kept as
  * [[graft.llm.DedupQueries.pairStructsHof]] for the spec twin-pin)
  * allocates a filtered copy of the list per element — O(df²) array
  * copies — plus interpreted nested-lambda evaluation per pair; this
  * emits each pair once into one output buffer. Null elements cannot
  * occur on the query path (collect_list of a non-null key), but the
  * HOF semantics are matched anyway: a null x contributes no pairs
  * (its filter predicate is never true) and a null y never passes
  * y > x.
  */
case class PairStructsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pair_structs requires ARRAY<BIGINT>, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_structs"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.pairStructs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.pairStructs($c)")

  override protected def withNewChildInternal(newChild: Expression): PairStructsExpr =
    copy(child = newChild)
}

/** ngrams_ws(text, n): ALL word n-grams of lower(text), in order —
  * tokens are the fields of Java-regex `split("\\s+", -1)` (leading/
  * trailing whitespace runs yield empty edge tokens, same artifact
  * contract as [[SimHash64Expr]]), grams join n consecutive tokens
  * with single spaces exactly like `concat_ws(" ", t[i], …)`; fewer
  * than n tokens (or NULL text/n) yields the EMPTY array, matching
  * the `when(size(t) >= n, …).otherwise(array())` guard every HOF
  * call site wraps around the transform (Spark's `sequence` counts
  * down when start > stop, and `size(NULL)` is −1, so the guard's
  * empty-array branch is the semantics to preserve). One pass over
  * the raw bytes: the HOF twin
  * (`transform(sequence(1, size(t)−(n−1)), i => concat_ws(" ",
  * element_at(t,i), …))`, kept on each call site's *Hof spec twin)
  * pays a regex split plus n element_at probes and a UTF8String
  * build per gram, per CONSUMER — and the gram passes are the
  * corpus-streaming stages of the boilerplate/decontaminate/near-dup
  * family. The byte walk is exact for any input, not just ASCII:
  * java.util.regex `\s` is [ \t\n\x0B\f\r] (no Unicode classes by
  * default) and ASCII bytes never occur inside multi-byte UTF-8
  * sequences, so byte-level whitespace scanning finds exactly the
  * code-point boundaries the UTF-16 regex sees.
  */
case class NgramsWsExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngrams_ws requires (STRING, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_ws"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    val n = right.eval(input)
    if (t == null || n == null) GraftKernels.emptyStringArray()
    else GraftKernels.ngramsWs(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code =
      code"""
            |${leftGen.code}
            |${rightGen.code}
            |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            |  (${leftGen.isNull} || ${rightGen.isNull})
            |    ? graft.functions.GraftKernels.emptyStringArray()
            |    : graft.functions.GraftKernels.ngramsWs(
            |        ${leftGen.value}, ${rightGen.value});
          """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramsWsExpr =
    copy(left = newLeft, right = newRight)
}

/** Static kernels referenced from generated code (plain object =>
  * static forwarders, Java-name-clean for janino).
  */
object GraftKernels {

  private final val Seed = 42L

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private final val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase md5 hex of the UTF-8 bytes — byte-identical to Spark's
    * `md5(string)` and DuckDB's `md5(varchar)` (the cross-engine hash
    * convention every sketch rides). Thread-local digest: expression
    * eval runs on executor task threads concurrently.
    */
  def md5Hex(s: UTF8String): String = {
    val d = Md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private final val WinnowK = 8
  private final val WinnowW = 4

  /** One-pass winnowing: rolling base-31 hash of each k-gram of the
    * lowercased bytes (h = Σ byte·31^(k−1−j) — exact BIGINT, bounded
    * < 2⁴⁵, mirrored term-for-term by the DuckDB oracle), then the
    * minimum of each w-window of consecutive hashes, deduplicated.
    * Texts with fewer than k + w − 1 chars yield no full window —
    * empty set (the query also pre-filters them so both engines
    * agree by construction).
    */
  def winnowFps(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val m = bytes.length - WinnowK + 1
    if (m < WinnowW)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < WinnowK) { h = h * 31L + (bytes(i + j) & 0xff); j += 1 }
      hs(i) = h
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var p = 0
    val lastWin = m - WinnowW
    while (p <= lastWin) {
      var mn = hs(p)
      var q = 1
      while (q < WinnowW) { if (hs(p + q) < mn) mn = hs(p + q); q += 1 }
      if (seen.add(mn)) out += mn
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  /** Composite-fingerprint knobs: pair each window minimum with the
    * minimum [[WinnowSkip]] windows later, packed collision-tolerantly
    * into one BIGINT as (m₁ mod P)·P + (m₂ mod P) with P = the largest
    * prime below 2³⁰ (product < 2⁶⁰). The pack is NOT collision-free —
    * it doesn't need to be: the DuckDB twin computes the identical
    * arithmetic, so both engines see the same composite identity and
    * the pair join stays hash-exact; a collision merely adds the same
    * spurious shared fingerprint to both.
    */
  private[graft] final val WinnowSkip = 8
  private[graft] final val WinnowP = 1073741789L

  /** winnow_cfps(text): COMPOSITE winnowing fingerprints — the distinct
    * packed (minimum, minimum-8-windows-later) pairs of the winnow
    * minima SEQUENCE. Single k=8-gram minima stop discriminating on
    * template-heavy corpora (at sf0.1 the fixture's 60k docs share so
    * much template text that every fingerprint the dup clusters share
    * exceeds any sane df cap and the single-gram pair finder returns
    * NOTHING); the composite spans ~k+w−1+skip ≈ 19 chars of context,
    * which restores specificity (measured at sf0.1: 78% of postings
    * fall under df 50, pair precision 1.0, recall 0.93 vs the Jaccard
    * truth) while keeping the exact-BIGINT oracle property. Same
    * one-pass / ASCII-byte contract as [[WinnowFpsExpr]].
    */
  def winnowCfps(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val m = bytes.length - WinnowK + 1
    if (m < WinnowW)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long])
    val nWin = m - WinnowW + 1
    if (nWin <= WinnowSkip)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < WinnowK) { h = h * 31L + (bytes(i + j) & 0xff); j += 1 }
      hs(i) = h
      i += 1
    }
    val ms = new Array[Long](nWin)
    var p = 0
    while (p < nWin) {
      var mn = hs(p)
      var q = 1
      while (q < WinnowW) { if (hs(p + q) < mn) mn = hs(p + q); q += 1 }
      ms(p) = mn
      p += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    p = 0
    while (p + WinnowSkip < nWin) {
      val c = (ms(p) % WinnowP) * WinnowP + (ms(p + WinnowSkip) % WinnowP)
      if (seen.add(c)) out += c
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  private final val CdcK = 8
  private final val CdcMask = 64L

  /** One-pass content-defined chunking of the lowercased bytes: rolling
    * base-31 hash of each k-gram (h = Σ byte·31^(k−1−j), exact BIGINT,
    * < 2⁴⁵ — mirrored term-for-term by the DuckDB oracle); a gram whose
    * hash ≡ 0 (mod 64) cuts the chunk after the gram's LAST byte. Cut
    * ends are strictly increasing, so chunks partition the text; a text
    * shorter than k is one chunk.
    */
  def cdcChunks(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    if (n < CdcK) {
      out += UTF8String.fromBytes(bytes, 0, n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        out.toArray[Any])
    }
    var start = 0
    var i = 0
    val m = n - CdcK + 1
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < CdcK) { h = h * 31L + (bytes(i + j) & 0xff); j += 1 }
      if (h % CdcMask == 0L) {
        val end = i + CdcK
        out += UTF8String.fromBytes(bytes, start, end - start)
        start = end
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromBytes(bytes, start, n - start)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** [[SimHashMd5Expr]] kernel. Tokenization = whitespace fields of
    * the EDGE-TRIMMED lowered text (edge trim, unlike simhash64's raw
    * split fields, because the DuckDB twin's regexp_split keeps a
    * TRAILING empty field where Java's split drops it — trimming both
    * sides removes the asymmetry); an all-whitespace/empty text yields
    * the single empty token both engines then hash. "Whitespace" is
    * RE2's `\s` = [\t\n\f\r ] EXACTLY (the class the DuckDB twin's
    * regexp_split uses — notably NO vertical tab, which Java's
    * Character.isWhitespace would accept), and lowering is
    * locale-independent (ASCII fast path; Locale.ROOT otherwise —
    * never the JVM default locale, whose Turkish-İ case mapping would
    * silently diverge the engine signature from the oracle's). Bit b
    * of a token's hash = bit (7 − b%8) of md5 digest byte b/8 —
    * exactly the bit the b-th hex-nibble character of md5's hex form
    * exposes, which is what the SQL twin reads via
    * substr(md5(tok), b/4+1, 1).
    */
  def simhashMd5(s: UTF8String): ArrayData = {
    val lowered =
      if (s.isFullAscii) s.toLowerCaseAscii
      else UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
    val bytes = lowered.getBytes
    val votes = new Array[Int](64)
    val md = md5Local.get()

    def vote(from: Int, until: Int): Unit = {
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      var b = 0
      while (b < 64) {
        if (((d(b >> 3) >>> (7 - (b & 7))) & 1) == 1) votes(b) += 1
        else votes(b) -= 1
        b += 1
      }
    }

    // RE2 \s = [\t\n\f\r ] exactly — NO 0x0B vertical tab (unlike
    // simhash64's Java-regex \s, which keeps it).
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

    var lo0 = 0
    var hi0 = bytes.length
    while (lo0 < hi0 && isWs(bytes(lo0))) lo0 += 1
    while (hi0 > lo0 && isWs(bytes(hi0 - 1))) hi0 -= 1
    var prev = lo0
    var i = lo0
    while (i < hi0) {
      if (isWs(bytes(i))) {
        val runStart = i
        while (i < hi0 && isWs(bytes(i))) i += 1
        vote(prev, runStart)
        prev = i
      } else i += 1
    }
    vote(prev, hi0) // tail token ("" for empty/all-ws input)

    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= (1L << b)
      if (votes(b + 32) > 0) hi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](lo, hi))
  }

  private final val MinHashK = 32

  /** One-pass 32-way minhash: per shingle, the "sh#i" salt suffix is
    * written into a single reused buffer (shingle bytes copied once,
    * only the 2-3 salt digits rewritten per i) — no per-(shingle,i)
    * string allocation, no intermediate hash arrays. A NULL element
    * contributes the seed itself for every salt, because Spark's
    * xxhash64(NULL) returns the unchanged seed (42) rather than NULL —
    * the HOF twin therefore folds 42 into the min, and so do we.
    */
  def minhash32(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) // array_min over an empty array => 32 nulls
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](MinHashK))
    val mins = new Array[Long](MinHashK)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < MinHashK) {
          if (Seed < mins(i)) mins(i) = Seed
          i += 1
        }
      } else {
        val shBytes = arr.getUTF8String(j).getBytes
        val base = shBytes.length
        val buf = new Array[Byte](base + 3) // "#" + up to 2 digits
        System.arraycopy(shBytes, 0, buf, 0, base)
        buf(base) = '#'
        var i = 0
        while (i < MinHashK) {
          var len = base + 1
          if (i < 10) { buf(len) = ('0' + i).toByte; len += 1 }
          else {
            buf(len) = ('0' + i / 10).toByte
            buf(len + 1) = ('0' + i % 10).toByte
            len += 2
          }
          val h = XXH64.hashUnsafeBytes(buf,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, Seed)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Fused cosine: dot + norms in one pass. Null (boxed) when lengths
    * differ or any element is null — zip_with+aggregate semantics.
    */
  /** See [[CellDistsExpr]]: per-cell Σ(x−y)² in element order; null
    * cell distance on null/length-mismatched centroid or null element
    * (zip_with pads the shorter side with null, nulling the fold).
    */
  def cellDists(emb: ArrayData, cb: ArrayData): ArrayData = {
    val k = cb.numElements()
    val n = emb.numElements()
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      if (!cb.isNullAt(c)) {
        val cent = cb.getArray(c)
        if (cent.numElements() == n) {
          var d = 0.0; var i = 0; var ok = true
          while (ok && i < n) {
            if (emb.isNullAt(i) || cent.isNullAt(i)) ok = false
            else {
              val t = emb.getDouble(i) - cent.getDouble(i)
              d += t * t; i += 1
            }
          }
          if (ok) out(c) = java.lang.Double.valueOf(d)
        }
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[PqEncodeExpr]]: per-subspace argmin centroid index over the
    * emb slice [j·subDim, (j+1)·subDim), subDim = width of the first
    * centroid of the first subspace (codebooks are rectangular by
    * construction — trained from fixed-width sub-vector samples). A
    * centroid that is null, width-mismatched, or compared against a
    * null/short emb slice contributes no distance (the HOF fold nulls
    * out); a subspace with no valid centroid encodes −1. Strict `<`
    * argmin: ties keep the first centroid, like the twin's
    * `when(dist < acc.d, …)`.
    */
  def pqEncode(emb: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    val n = emb.numElements()
    val subDim =
      if (m > 0 && !cb.isNullAt(0) && cb.getArray(0).numElements() > 0 &&
          !cb.getArray(0).isNullAt(0))
        cb.getArray(0).getArray(0).numElements()
      else 0
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = -1
      var bd = Double.MaxValue
      val off = j * subDim
      if (!cb.isNullAt(j) && subDim > 0 && off + subDim <= n) {
        val cbJ = cb.getArray(j)
        val nCent = cbJ.numElements()
        var c = 0
        while (c < nCent) {
          if (!cbJ.isNullAt(c)) {
            val cent = cbJ.getArray(c)
            if (cent.numElements() == subDim) {
              var d = 0.0; var i = 0; var ok = true
              while (ok && i < subDim) {
                if (emb.isNullAt(off + i) || cent.isNullAt(i)) ok = false
                else {
                  val t = emb.getDouble(off + i) - cent.getDouble(i)
                  d += t * t; i += 1
                }
              }
              if (ok && d < bd) { bd = d; best = c }
            }
          }
          c += 1
        }
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

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

  /** Jaro-Winkler similarity (the record-linkage classic: Jaro '89,
    * Winkler '90) with the standard parameters every implementation —
    * including DuckDB's `jaro_winkler_similarity`, the oracle twin —
    * ships: match window max(|a|,|b|)/2 − 1, transpositions counted
    * over matched sequences, prefix boost p = 0.1 on up to 4 shared
    * leading chars applied only above the 0.7 threshold. Either
    * string empty ⇒ 0 (DuckDB's convention, even for two empties).
    * Operates on UTF-16 code units — identical to byte-wise for the
    * ASCII name data this engine matches on.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString; val s2 = ub.toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + md + 1)
      var j = math.max(0, i - md)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val lim = math.min(4, math.min(l1, l2))
      var q = 0
      while (q < lim && s1.charAt(q) == s2.charAt(q)) { p += 1; q += 1 }
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  private val EmptyStrArr = new GenericArrayData(Array.empty[Any])

  /** Shared empty result for [[NgramsWsExpr]]'s null/short branches —
    * GenericArrayData is immutable, one instance serves every row.
    */
  def emptyStringArray(): ArrayData = EmptyStrArr

  /** [[NgramsWsExpr]] kernel: tokenize the lowered bytes by maximal
    * ASCII-whitespace runs (Java `\s` set, `split(-1)` edge-field
    * semantics: possibly-empty head and tail fields), then emit each
    * window of n consecutive tokens joined by single spaces into one
    * exactly-sized byte buffer per gram. The only per-gram allocation
    * is the output UTF8String itself.
    */
  def ngramsWs(s: UTF8String, n: Int): ArrayData = {
    if (n < 1) return EmptyStrArr
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length

    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    def push(st: Int, en: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = st; ends(nTok) = en; nTok += 1
    }
    var prev = 0
    var i = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        push(prev, i)
        while (i < len && isWs(bytes(i))) i += 1
        prev = i
      } else i += 1
    }
    push(prev, len) // tail field ("" after a trailing whitespace run)
    if (nTok < n) return EmptyStrArr
    val out = new Array[Any](nTok - n + 1)
    var g = 0
    while (g <= nTok - n) {
      var glen = n - 1 // the single-space separators
      var j = 0
      while (j < n) { glen += ends(g + j) - starts(g + j); j += 1 }
      val buf = new Array[Byte](glen)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val l = ends(g + j) - starts(g + j)
        System.arraycopy(bytes, starts(g + j), buf, pos, l)
        pos += l
        j += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** All ordered in-list pairs (see [[PairStructsExpr]]): two passes —
    * count, then fill an exactly-sized array — so the only per-pair
    * allocation is the 2-field output row itself. List length is
    * bounded by the callers' df cap (≤ MaxShingleDf/MaxWinnowDf), so
    * the O(n²) scan is a few thousand long-compares per list.
    */
  def pairStructs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val vals = new Array[Long](n)
    val ok = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      ok(i) = !ids.isNullAt(i)
      if (ok(i)) vals(i) = ids.getLong(i)
      i += 1
    }
    var count = 0
    i = 0
    while (i < n) {
      if (ok(i)) {
        var j = 0
        while (j < n) {
          if (ok(j) && vals(j) > vals(i)) count += 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (ok(i)) {
        var j = 0
        while (j < n) {
          if (ok(j) && vals(j) > vals(i)) {
            out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](vals(i), vals(j)))
            k += 1
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
