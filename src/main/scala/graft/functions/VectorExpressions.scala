package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{array_distinct, col, lit}

/** Native Catalyst expressions for vector similarity and content
  * hashing (SURVEY §4.3). Each generates a single static call into
  * `GraftHash` so the row loop stays inside whole-stage codegen — no
  * UDF boxing/serialization on the 100 TB hot path.
  */
object VectorExpressions {
  private val FloatArray = ArrayType(FloatType)

  /** Is an input a numeric vector the kernels can read, and through
    * which accessor? Reading a double-backed column vector with
    * getFloat is an executor NPE (OnHeapColumnVector keeps per-type
    * arrays), so the element WIDTH is resolved here at plan time and
    * passed to the kernel as a codegen-constant — and anything that is
    * not array<float|double> is rejected at ANALYSIS, not as a
    * ClassCastException three stages into a 100 TB job.
    */
  private def vecWidth(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }

  abstract class VecBinary extends BinaryExpression {
    protected def kernel: String // static method on GraftHash
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (vecWidth(left).isDefined && vecWidth(right).isDefined)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$kernel expects array<float> or array<double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    // resolved by checkInputDataTypes before any evaluation
    @transient protected lazy val leftIsDouble: Boolean = vecWidth(left).get
    @transient protected lazy val rightIsDouble: Boolean = vecWidth(right).get
    override def nullSafeEval(l: Any, r: Any): Any = kernelEval(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    protected def kernelEval(a: ArrayData, b: ArrayData): Double
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.GraftHash.$kernel($a, $b, " +
          s"$leftIsDouble, $rightIsDouble);")
  }

  case class CosineSim(left: Expression, right: Expression) extends VecBinary {
    override protected def kernel = "cosine"
    override protected def kernelEval(a: ArrayData, b: ArrayData): Double =
      GraftHash.cosine(a, b, leftIsDouble, rightIsDouble)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class DotProduct(left: Expression, right: Expression) extends VecBinary {
    override protected def kernel = "dot"
    override protected def kernelEval(a: ArrayData, b: ArrayData): Double =
      GraftHash.dot(a, b, leftIsDouble, rightIsDouble)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class L2Dist(left: Expression, right: Expression) extends VecBinary {
    override protected def kernel = "l2"
    override protected def kernelEval(a: ArrayData, b: ArrayData): Double =
      GraftHash.l2(a, b, leftIsDouble, rightIsDouble)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** MinHash signature: array<string> tokens → array<long> of k minima. */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      GraftHash.minhashSig(v.asInstanceOf[ArrayData], k)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.minhashSig($c, $k);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** LSH band keys from a minhash signature. */
  case class LshBands(child: Expression, rowsPerBand: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      GraftHash.lshBands(v.asInstanceOf[ArrayData], rowsPerBand)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.lshBands($c, $rowsPerBand);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a token array. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      GraftHash.simhash64(v.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.simhash64($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 60-bit SimHash with md5 token hashes (oracle-recomputable). */
  case class SimHashMd5(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      GraftHash.simhashMd5(v.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.simhashMd5($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowing fingerprint of raw text → array<long>. */
  case class Fingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      GraftHash.fingerprint(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.fingerprint($c, $k, $w);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Multi-probe bucket list for a float vector: the base bucket plus
    * `nFlips` neighbors from flipping the lowest-margin sign bits
    * (Lv '07). Probe-side only — the corpus keeps one bucket per table.
    */
  case class HyperplaneProbes(child: Expression, nBits: Int, table: Int, nFlips: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (vecWidth(child).isDefined)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_probes expects array<float> or array<double>, got ${child.dataType.sql}")
    @transient private lazy val vD: Boolean = vecWidth(child).get
    override def nullSafeEval(v: Any): Any =
      GraftHash.hyperplaneProbes(v.asInstanceOf[ArrayData], nBits, table, nFlips, vD)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.hyperplaneProbes($c, $nBits, $table, $nFlips, $vD);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Greedy LTR non-overlapping BPE pair-merge rewrite (a, b) → ab
    * over a symbol array — O(len), single output buffer (the kernel
    * loop the O(len²) `aggregate` fold could not express: the greedy
    * skip-after-merge is a sequential recurrence, so it belongs in a
    * native expression, not a per-position HOF whose accumulator
    * copies the prefix each step). `a`/`b` are driver constants per
    * training round, baked in as codegen references.
    */
  case class BpeMerge(child: Expression, a: String, b: String)
      extends UnaryExpression {
    // the kernel passes input null ELEMENTS straight through (a null
    // never equals the merge pair), so the output's element
    // nullability is exactly the child's — declaring containsNull =
    // false unconditionally would hand codegen consumers a schema
    // promise a nullable-element input silently breaks
    override def dataType: DataType = child.dataType match {
      case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
      case _ => ArrayType(StringType, containsNull = false)
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"bpe_merge expects array<string>, got ${other.sql}")
      }
    @transient private lazy val ua =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
    @transient private lazy val ub =
      org.apache.spark.unsafe.types.UTF8String.fromString(b)
    @transient private lazy val uab =
      org.apache.spark.unsafe.types.UTF8String.fromString(a + b)
    override def nullSafeEval(v: Any): Any =
      GraftHash.bpeMerge(v.asInstanceOf[ArrayData], ua, ub, uab)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = "org.apache.spark.unsafe.types.UTF8String"
      val aRef = ctx.addReferenceObj("bpeA", ua, cls)
      val bRef = ctx.addReferenceObj("bpeB", ub, cls)
      val abRef = ctx.addReferenceObj("bpeAb", uab, cls)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.bpeMerge($c, $aRef, $bRef, $abRef);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Random-hyperplane LSH bucket id for a float vector; `table`
    * selects an independent plane set (multi-table LSH).
    */
  case class HyperplaneBucket(child: Expression, nBits: Int, table: Int = 0) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (vecWidth(child).isDefined)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket expects array<float> or array<double>, got ${child.dataType.sql}")
    @transient private lazy val vD: Boolean = vecWidth(child).get
    override def nullSafeEval(v: Any): Any =
      GraftHash.hyperplaneBucket(v.asInstanceOf[ArrayData], nBits, table, vD)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.hyperplaneBucket($c, $nBits, $table, $vD);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Order-preserving long image of a double ([[GraftHash.doubleSortBits]]):
    * monotone in Spark SQL's double ordering (NaN greatest, -0.0 == 0.0).
    * Building block for packing a lexicographic (double, id) aggregation
    * ordering into one numeric so `max_by`/`min_by` stay hash-aggregatable
    * (a struct-typed ordering demotes the aggregate to SortAggregate —
    * struct buffers are not UnsafeRow-mutable).
    */
  case class DoubleSortBits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"double_sort_bits expects double, got ${child.dataType.sql}")
    override def nullSafeEval(v: Any): Any =
      GraftHash.doubleSortBits(v.asInstanceOf[Double])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.GraftHash.doubleSortBits($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column API (Spark 4: Column no longer wraps Expression; use the
  // classic bridge) ----
  import org.apache.spark.sql.graft.bridge.{toColumn => toCol, toExpression => toExpr}
  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))
  def dot_product(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
  def l2_dist(a: Column, b: Column): Column = toCol(L2Dist(toExpr(a), toExpr(b)))
  def minhash_sig(tokens: Column, k: Int): Column = toCol(MinHashSig(toExpr(tokens), k))
  def lsh_bands(sig: Column, rowsPerBand: Int): Column = toCol(LshBands(toExpr(sig), rowsPerBand))
  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))
  def simhash_md5(tokens: Column): Column = toCol(SimHashMd5(toExpr(tokens)))
  def fingerprint(text: Column, k: Int = 7, w: Int = 10): Column = toCol(Fingerprint(toExpr(text), k, w))
  def hyperplane_bucket(v: Column, nBits: Int, table: Int = 0): Column =
    toCol(HyperplaneBucket(toExpr(v), nBits, table))
  def hyperplane_probes(v: Column, nBits: Int, table: Int, nFlips: Int): Column =
    toCol(HyperplaneProbes(toExpr(v), nBits, table, nFlips))
  def bpe_merge(syms: Column, a: String, b: String): Column =
    toCol(BpeMerge(toExpr(syms), a, b))
  def double_sort_bits(x: Column): Column = toCol(DoubleSortBits(toExpr(x)))

  /** Pack a lexicographic two-component aggregation ordering into ONE
    * decimal(38,0): `major * 2^63 + minor`. Monotone in (major, minor)
    * lexicographic order for any signed-long `major` and `minor` in
    * [0, 2^63) — |major|·2^63 + minor < 2^126 < 10^38, so the decimal
    * arithmetic is exact and never overflows. The point: a decimal
    * ordering keeps `max_by`/`min_by` inside HashAggregate (decimal
    * aggregation buffers are UnsafeRow-mutable at every precision),
    * where a struct(major, minor) ordering demotes the whole aggregate
    * to SortAggregate — a per-task sort of the full input at scale.
    * Descending minors encode as `lit(Long.MaxValue) - id` (id ≥ 0),
    * the same comparisons as struct(major, -id). Doubles enter through
    * [[double_sort_bits]].
    */
  def pack_ord(major: Column, minorNonNeg: Column): Column = {
    val b63 = lit(new java.math.BigDecimal("9223372036854775808")) // 2^63
    major.cast(DecimalType(38, 0)) * b63 + minorNonNeg.cast(DecimalType(38, 0))
  }

  /** Exact jaccard over token sets, composed from codegen'd built-ins. */
  def jaccard_tokens(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{array_intersect, array_union, size, when}
    val da = array_distinct(a); val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = size(array_union(da, db)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}
