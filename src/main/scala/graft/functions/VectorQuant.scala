package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage: a
  * 100 TB float32 vector table becomes ~25 TB of codes + one scale per
  * vector, and cosine rankings survive to within quantization error
  * (spec-bounded). All pure codegen'd expressions; the arithmetic is
  * floor(x/scale + 0.5) — NOT round(), whose half-even/half-up
  * behavior differs across engines — so the codes are engine-checkable
  * integers.
  */
object VectorQuant {

  /** Per-vector scale: max|x| / 127 (0.0 for the zero vector). */
  def quantScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** int8-range codes in [-127, 127] (0 for the zero vector). */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / scale + lit(0.5)).cast("int")))

  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Order-weighted checksum of the codes (sum of q_i * i, 1-based) —
    * collapses the code array to one engine-comparable BIGINT without
    * emitting array columns.
    */
  def codeChecksum(codes: Column): Column =
    // empty-array guard: Spark's sequence(1, 0) DESCENDS to [1, 0]
    // (zip_with would null-pad → NULL checksum) where the oracle's
    // generate_series(1, 0) is empty → 0
    when(size(codes) === 0, lit(0L)).otherwise(
      aggregate(
        zip_with(codes, sequence(lit(1), size(codes)), (q, i) => q.cast("long") * i.cast("long")),
        lit(0L),
        (acc, x) => acc + x))
}
