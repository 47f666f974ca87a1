package graft.catalog

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expressions.{TextExprUtil, VectorExprUtil}

/** V2 FunctionCatalog functions — the COMPILED-native SQL function
  * surface (q59 covered declarative SQL UDFs; this registers the repo's
  * native kernels so a pure-SQL user calls them BY NAME with codegen'd
  * dispatch): each BoundFunction carries the magic `invoke` method over
  * Catalyst physical types (long/double/UTF8String/ArrayData), so
  * V2 function resolution plans an Invoke expression — compiled by
  * whole-stage codegen straight onto the same static kernels the
  * DataFrame API's native expressions use (CosineSim, TokenCount). No
  * ScalaUDF, no ApplyFunctionExpression row-boxing fallback
  * (PlanSpec-gated), and bit-identical results to the expression forms
  * because the kernel IS the same code. */
object CatalogFunctions {
  val names: Seq[String] =
    Seq("cosine_sim", "hamming64", "token_count", "sig_majority")

  def load(name: String): Option[UnboundFunction] = name match {
    case "cosine_sim"   => Some(CosineSimUnbound)
    case "hamming64"    => Some(Hamming64Unbound)
    case "token_count"  => Some(TokenCountUnbound)
    case "sig_majority" => Some(SigMajorityUnbound)
    case _              => None
  }

  // bind() sees the CALL-SITE types; Spark implicit-casts arguments to
  // the bound function's inputTypes() AFTER bind succeeds — so bind only
  // vets arity + coercible kind, and inputTypes() pins the exact types
  private def require2FloatArrays(args: StructType): Unit = {
    val ok = args.fields.length == 2 && args.fields.forall(_.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _                            => false
    })
    if (!ok) throw new UnsupportedOperationException(
      s"cosine_sim expects (array<float>, array<float>), got ${args.simpleString}")
  }

  object CosineSimUnbound extends UnboundFunction {
    override def name(): String = "cosine_sim"
    override def description(): String =
      "cosine_sim(array<float>, array<float>) -> double: fused one-pass cosine"
    override def bind(inputType: StructType): BoundFunction = {
      require2FloatArrays(inputType)
      new CosineSimBound
    }
  }
  class CosineSimBound extends ScalarFunction[Double] {
    override def name(): String = "cosine_sim"
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(FloatType), ArrayType(FloatType))
    override def resultType(): DataType = DoubleType
    override def isDeterministic: Boolean = true
    // magic method: resolution plans Invoke(this, "invoke", ...) —
    // codegen'd, null-safe via inputTypes nullability handling
    def invoke(a: ArrayData, b: ArrayData): Double = VectorExprUtil.cosine(a, b)
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Double =
      VectorExprUtil.cosine(input.getArray(0), input.getArray(1))
  }

  object Hamming64Unbound extends UnboundFunction {
    override def name(): String = "hamming64"
    override def description(): String =
      "hamming64(lo_a, hi_a, lo_b, hi_b) -> int: Hamming distance of two " +
        "64-bit signatures carried as two BIGINT words each"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 4 &&
        inputType.fields.forall(f => f.dataType == LongType ||
          f.dataType == IntegerType || f.dataType == ShortType ||
          f.dataType == ByteType)
      if (!ok) throw new UnsupportedOperationException(
        s"hamming64 expects 4 integral args, got ${inputType.simpleString}")
      new Hamming64Bound
    }
  }
  class Hamming64Bound extends ScalarFunction[Int] {
    override def name(): String = "hamming64"
    override def inputTypes(): Array[DataType] =
      Array(LongType, LongType, LongType, LongType)
    override def resultType(): DataType = IntegerType
    override def isDeterministic: Boolean = true
    def invoke(loA: Long, hiA: Long, loB: Long, hiB: Long): Int =
      java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Int =
      invoke(input.getLong(0), input.getLong(1), input.getLong(2), input.getLong(3))
  }

  object TokenCountUnbound extends UnboundFunction {
    override def name(): String = "token_count"
    override def description(): String =
      "token_count(string) -> int: count of maximal [A-Za-z]+|[0-9]+ runs"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 1 &&
        inputType.fields.head.dataType == StringType
      if (!ok) throw new UnsupportedOperationException(
        s"token_count expects one STRING arg, got ${inputType.simpleString}")
      new TokenCountBound
    }
  }
  class TokenCountBound extends ScalarFunction[Int] {
    override def name(): String = "token_count"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = IntegerType
    override def isDeterministic: Boolean = true
    def invoke(s: UTF8String): Int = TextExprUtil.tokenCount(s)
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Int =
      TextExprUtil.tokenCount(input.getUTF8String(0))
  }

  // ---- V2 AggregateFunction (q73 — the last FunctionCatalog face after
  // q64's ScalarFunctions): a CUSTOM aggregate callable by name from
  // pure SQL, with the full partial-aggregation protocol —
  // newAggregationState per partition, update per row, MERGE across
  // partitions (map-side partials survive, the 100 TB contract: what
  // crosses the shuffle is one 49-long state per group per partition,
  // never rows), produceResult at the end. The kernel: per-bit MAJORITY
  // vote over 48-bit signatures — the cluster-representative
  // fingerprint op a perceptual-dedup pipeline runs to elect one
  // signature per near-dup family (d25's natural companion).
  object SigMajorityUnbound extends UnboundFunction {
    override def name(): String = "sig_majority"
    override def description(): String =
      "sig_majority(sig BIGINT) -> BIGINT: per-bit majority vote over " +
        "48-bit signatures (ties -> 0, the deterministic convention)"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 1 &&
        (inputType.fields.head.dataType == LongType ||
          inputType.fields.head.dataType == IntegerType)
      if (!ok) throw new UnsupportedOperationException(
        s"sig_majority expects one BIGINT arg, got ${inputType.simpleString}")
      new SigMajorityBound
    }
  }

  /** counts(0..47) = ones per bit, counts(48) = rows seen. */
  final class SigMajorityState(val counts: Array[Long]) extends Serializable

  class SigMajorityBound extends
      org.apache.spark.sql.connector.catalog.functions.AggregateFunction[SigMajorityState, java.lang.Long] {
    override def name(): String = "sig_majority"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isDeterministic: Boolean = true
    override def newAggregationState(): SigMajorityState =
      new SigMajorityState(new Array[Long](49))
    override def update(state: SigMajorityState,
        input: org.apache.spark.sql.catalyst.InternalRow): SigMajorityState = {
      if (!input.isNullAt(0)) {
        val v = input.getLong(0)
        val c = state.counts
        var b = 0
        while (b < 48) {
          c(b) += (v >>> b) & 1L
          b += 1
        }
        c(48) += 1
      }
      state
    }
    override def merge(a: SigMajorityState, b: SigMajorityState): SigMajorityState = {
      var i = 0
      while (i < 49) { a.counts(i) += b.counts(i); i += 1 }
      a
    }
    override def produceResult(state: SigMajorityState): java.lang.Long = {
      val c = state.counts
      val n = c(48)
      var out = 0L
      var b = 0
      while (b < 48) {
        if (c(b) * 2 > n) out |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(out)
    }
  }
}
