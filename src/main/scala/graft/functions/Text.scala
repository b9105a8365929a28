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

  /** Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    * array column. Callers must project `tokens(text)` into a named
    * column first: passing `tokens(text)` directly inlines the tokenizer
    * expression into every `element_at` reference (~3n copies), which
    * re-runs the regex split per shingle element — measured >10× slower
    * on the near-dup pipelines.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    array_distinct(
      when(size(toks) >= n, grams).otherwise(array(array_join(toks, " "))))
  }

  /** Convenience one-shot form — only for small inputs / tests; hot paths
    * must use the two-step projection (see [[shinglesOfTokens]]).
    */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  /** Cosine similarity of two numeric arrays, accumulated in array order
    * in double precision (bit-deterministic). Backed by the native
    * [[DotProduct]] codegen expression; callers on hot pair-join paths
    * should precompute norms with [[VectorOps.norm]] before the join.
    */
  def cosine(a: Column, b: Column): Column =
    VectorOps.dot(a, b) / (VectorOps.norm(a) * VectorOps.norm(b))
}
