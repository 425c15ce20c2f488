package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-normalization columns for the LLM-pipeline operators.
  * Every expression here must have an exact DuckDB twin (the oracle SQL
  * spells the same normalization), so: plain `functions._` only, no UDFs,
  * and all arithmetic over exact integers until the final division.
  */
object Text {

  /** Whitespace-collapsed, trimmed, lowercased text. DuckDB twin:
    * `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`.
    */
  def norm(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Word tokens of the normalized text. */
  def words(text: Column): Column = split(norm(text), " ")

  /** Distinct 3-word shingles. 1-based `element_at` mirrors DuckDB's
    * 1-based list indexing; `sequence(1, n-2)` = DuckDB `range(1, n-1)`.
    * Caller must filter `size(words) >= 3`.
    */
  def shingles3(wordsCol: Column): Column =
    array_distinct(
      transform(sequence(lit(1), size(wordsCol) - 2), i =>
        concat_ws(" ",
          element_at(wordsCol, i),
          element_at(wordsCol, i + 1),
          element_at(wordsCol, i + 2))))

  /** Exact Jaccard numerator/denominator over two distinct-element
    * arrays: (|A∩B|, |A|+|B|-|A∩B|) as integer columns — threshold
    * comparisons stay in exact integer cross-multiplication.
    */
  def jaccardParts(a: Column, b: Column): (Column, Column) = {
    val inter = size(array_intersect(a, b))
    (inter, size(a) + size(b) - inter)
  }
}
