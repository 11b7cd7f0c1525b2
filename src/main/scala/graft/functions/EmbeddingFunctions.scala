package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column (Array[Float]) similarity primitives for ANN search and
  * near-duplicate detection (SURVEY.md §7.2 step 7).
  *
  * Determinism contract: every float is cast to double BEFORE any
  * arithmetic, and every reduction is a strict left fold over the array
  * order — the exact same IEEE-754 operation sequence the DuckDB oracle
  * runs (`list_reduce(list_prepend(0.0, …))`), so doubles are
  * bit-identical across engines. Per-row folds also make results
  * independent of partitioning — stable under cluster re-planning.
  */
object EmbeddingFunctions {

  /** Strict left-fold sum of a double array: ((0+x₁)+x₂)+… */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0d), (acc, x) => acc + x)

  /** Dot product of two double arrays (element products, then left fold). */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x * y))

  /** Codegen dot product — same left-fold IEEE semantics as [[dot]] but a
    * generated Java loop (see [[DotProductExpr]]); use on hot paths. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(DotProductExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(a),
      org.apache.spark.sql.GraftArrowBridge.expression(b)))

  /** Codegen max-abs — same semantics as
    * `array_max(transform(a, x => abs(x)))` on NaN-free vectors but a
    * generated Java loop (see [[MaxAbsExpr]]); the quantization scale
    * probe of the int8 index build (q82/q90). */
  def maxAbsNative(a: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(MaxAbsExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(a)))

  /** Codegen symmetric int8 quantization — bit-identical to
    * `transform(a, x => floor((x * (lit(127.0d) / mx)) + lit(0.5d))
    * .cast("double"))` (see [[QuantizeExpr]]); the full-corpus stage-1
    * pass of the quantized ANN family. */
  def quantizeNative(a: Column, mx: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(QuantizeExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(a),
      org.apache.spark.sql.GraftArrowBridge.expression(mx)))

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(foldSum(transform(a, x => x * x)))

  /** Cosine similarity: dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 random-hyperplane table for sign-LSH: `bits` planes
    * of dimension `dim`. LCG over the flat index — reproducible anywhere,
    * inlined as literals into both the Spark plan and the oracle SQL. */
  def hyperplanes(bits: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(bits) { b =>
      Seq.tabulate(dim) { i =>
        val x = (b.toLong * dim + i) * 2654435761L + 1013904223L
        if ((((x & 0xffffffffL) >> 16) & 1L) == 1L) 1.0 else -1.0
      }
    }

  /** SQL literal of one hyperplane for the DuckDB oracle. */
  def planeSqlLiteral(p: Seq[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]::double[]")
}
