package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: for a query's ANALYZED logical plan, which
  * (source_table, source_column) pairs does each output column derive
  * from? This is the governance surface a 100 TB curation pipeline
  * needs — impact analysis ("which curated outputs move if this raw
  * column changes?"), audit ("did PII columns reach this sink?"), and
  * column-pruning review all start from exactly this relation.
  *
  * Mechanics: one bottom-up fold over the analyzed `LogicalPlan`,
  * accumulating `ExprId → {(table, column)}`. Leaves seed the map
  * (parquet relations are named by their file/directory basename);
  * every `Alias` definition unions the lineage of the attributes it
  * references; `Union` merges children positionally; `Expand`
  * (rollup/cube/grouping sets) unions across its projection rows;
  * `Generate` (explode) maps generator outputs to the generator's
  * inputs; subquery expressions contribute the lineage of their plan's
  * output. Window expressions deliberately include partition/order key
  * columns as sources — they determine the output VALUE, which is what
  * impact analysis must catch.
  *
  * Scale note: this walks the PLAN, not the data — driver-side by
  * nature, output is schema-sized (≤ columns × sources rows). It runs
  * identically against a plan over 100 TB because it never touches an
  * executor.
  */
object Lineage {

  private def stripExt(name: String): String =
    if (name.endsWith(".parquet")) name.dropRight(".parquet".length) else name

  /** Session temp-parquet sever boundaries (the Graph family's
    * materialized results) carry a per-JVM sequence number in their
    * basename — call-order-dependent, so the raw name would make
    * LINEAGE.tsv nondeterministic. Collapse them to one stable marker:
    * lineage legitimately ENDS at a severed boundary (same contract as
    * `rdd`-leaf plans).
    */
  private def normalize(name: String): String =
    if (name.startsWith("graft_sever_")) "(severed)" else name

  private def tableOf(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(p => normalize(stripExt(p.getName)))
          .getOrElse("(files)")
      case other => other.getClass.getSimpleName
    }
    case _: LocalRelation => "(local)"
    case other => other.nodeName
  }

  private type Sources = Map[ExprId, Set[(String, String)]]

  /** Lineage of one expression under an accumulated source map: union
    * over its attribute references plus any embedded subquery outputs.
    */
  private def ofExpr(e: Expression, m: Sources): Set[(String, String)] = {
    val direct = e.references.iterator
      .flatMap(a => m.getOrElse(a.exprId, Set.empty[(String, String)])).toSet
    val fromSubqueries = e.collect { case sq: SubqueryExpression =>
      val sub = ofPlan(sq.plan)
      sq.plan.output.flatMap(a => sub.getOrElse(a.exprId,
        Set.empty[(String, String)])).toSet ++
        // correlated outer references resolve against the enclosing map
        sq.references.iterator.flatMap(a =>
          m.getOrElse(a.exprId, Set.empty[(String, String)])).toSet
    }.flatten.toSet
    direct ++ fromSubqueries
  }

  private def ofPlan(plan: LogicalPlan): Sources = plan match {
    case leaf: LeafNode =>
      val t = tableOf(leaf)
      leaf.output.map(a => a.exprId -> Set((t, a.name))).toMap

    case u: Union =>
      val childMaps = u.children.map(ofPlan)
      val merged = childMaps.foldLeft(Map.empty: Sources)(_ ++ _)
      merged ++ u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(childMaps)
          .map { case (c, m) => ofExpr(c.output(i), m) }
          .foldLeft(Set.empty[(String, String)])(_ ++ _)
      }.toMap

    case e: Expand =>
      val base = ofPlan(e.child)
      base ++ e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections
          .map(row => ofExpr(row(i), base))
          .foldLeft(Set.empty[(String, String)])(_ ++ _)
      }.toMap

    case g: Generate =>
      val base = ofPlan(g.child)
      base ++ g.generatorOutput.map(a =>
        a.exprId -> ofExpr(g.generator, base)).toMap

    case node =>
      val base = node.children.map(ofPlan)
        .foldLeft(Map.empty: Sources)(_ ++ _)
      // inside an Aggregate, a reference-free expression — count(*),
      // count(lit(1)), grouping flags — still depends on the child's ROW
      // SET: it traces to every source table as a table-level (t, "*")
      // dependency rather than vanishing (impact analysis must see that
      // dropping the table changes the count)
      val tableLevel: Set[(String, String)] = node match {
        case _: Aggregate =>
          node.collectLeaves().collect { case l: LeafNode => (tableOf(l), "*") }.toSet
        case _ => Set.empty
      }
      // every Alias anywhere in this node's expressions defines a new
      // attribute (Project, Aggregate, Window, ...)
      val defined = node.expressions.flatMap(_.collect {
        case al: Alias =>
          val srcs = ofExpr(al.child, base)
          al.exprId -> (if (srcs.isEmpty) tableLevel else srcs)
      })
      base ++ defined
  }

  /** The lineage relation for a query: one row per (output column,
    * source table, source column), ordered. Output columns whose
    * sources cannot be traced (none in practice for relational plans)
    * surface as a `(unknown)` source rather than disappearing.
    */
  def report(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val sources = ofPlan(plan)
    val rows = plan.output.flatMap { a =>
      val srcs = sources.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "(unknown)", a.name))
      else srcs.toSeq.map { case (t, c) => (a.name, t, c) }
    }.sorted
    df.sparkSession.createDataFrame(rows)
      .toDF("output_col", "source_table", "source_col")
  }
}
