package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns (north star:
  * similarity search at 100 TB). All builtins — `zip_with` + `aggregate`
  * compile to codegen'd loops over the unsafe array data, no UDF, no
  * serialization of the vectors.
  *
  * Determinism contract: floats are cast to double BEFORE any arithmetic and
  * folds are strict left-to-right with a 0.0 seed, giving bit-identical IEEE
  * results to a sequential SQL `list_reduce` over the same element order.
  */
object Vectors {

  /** `array<float>` → `array<double>` (exact; float values are a subset). */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold sum of an array<double>. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two double vectors. */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine with PRE-COMPUTED norms — bit-identical to [[cosine]] (sqrt is
    * exact IEEE, so computing it once per vector instead of once per pair
    * changes nothing numerically) but does 1 array fold per pair instead
    * of 3. Use whenever one side participates in many pairs.
    */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Squared L2 distance (centroid assignment metric for IVF). */
  def l2sq(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => (x - y) * (x - y)))
}
