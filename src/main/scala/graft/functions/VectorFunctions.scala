package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float] columns via codegen'd higher-order
  * functions. All arithmetic is promoted to double element-wise and
  * accumulated left-to-right, so results are bit-reproducible across
  * engines (the oracle mirrors the same expression shape).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² in double precision. */
  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity: dot / sqrt(|a|²·|b|²). Routed through the native
    * CosineSim expression (codegen'd fused loop); requires a session
    * built via GraftSession.configure (function registry). Value is
    * identical to the declarative dot/norm composition. */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)
}
