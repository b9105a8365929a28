package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers shared by the dedup / text-analysis operators.
  *
  * Everything here composes built-in codegen'd expressions (split, regexp,
  * transform, aggregate) — no UDFs — so whole-stage codegen stays intact
  * across the pipelines that use them. Definitions are deliberately simple
  * enough to re-express in ANSI SQL for the DuckDB oracles.
  */
object Text {

  /** Lowercased alphanumeric tokens; empty strings filtered out. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct word n-gram shingles (space-joined); documents shorter than
    * n tokens collapse to a single whole-document shingle.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    array_distinct(
      when(size(toks) >= n, grams).otherwise(array(array_join(toks, " "))))
  }

  /** Cosine similarity of two numeric arrays, accumulated in array order
    * in double precision (so the result is bit-deterministic).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }
}
