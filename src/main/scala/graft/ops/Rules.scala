package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** I10: declarative field-ops / rules engine — predicate + actions applied
  * to session rows before the sink (reference: capture/rules.c:403-427
  * rule types, field-set ops rules.c:1128+).
  *
  * A rule is `when <Column predicate> then <set field / add tag / drop>`;
  * rules compose into one `withColumn` chain, so the whole rule set stays
  * inside codegen — no per-rule pass over the data.
  */
object Rules {

  sealed trait Action
  /** Set a column to a literal/expression when the rule fires. */
  final case class SetField(name: String, value: Column) extends Action
  /** Append a tag to the `tags` array column. */
  final case class AddTag(tag: String) extends Action
  /** Drop the row entirely (reference `dontSaveSPI`). */
  case object DropSession extends Action

  final case class Rule(name: String, predicate: Column, actions: Seq[Action])

  /** Rule predicated on a BPF filter string — the reference's per-rule
    * `bpf:` field (capture/rules.c:380): the filter text compiles to
    * the same codegen'd Column as any field expression, so BPF rules
    * ride the single withColumn chain like every other rule.
    */
  def bpfRule(name: String, bpf: String, fields: graft.etl.Bpf.Fields,
      actions: Seq[Action]): Rule =
    Rule(name, graft.etl.Bpf.column(bpf, fields), actions)

  /** Apply rules in order. Tag actions accumulate; set-field later rules
    * win; drop removes rows after all sets/tags.
    */
  def apply(df0: DataFrame, rules: Seq[Rule]): DataFrame = {
    val withTags =
      if (df0.columns.contains("tags")) df0
      else df0.withColumn("tags", array().cast("array<string>"))
    val applied = rules.foldLeft(withTags) { (df, rule) =>
      rule.actions.foldLeft(df) { (d, action) =>
        action match {
          case SetField(name, value) =>
            val prev = if (d.columns.contains(name)) col(name) else lit(null)
            d.withColumn(name, when(rule.predicate, value).otherwise(prev))
          case AddTag(tag) =>
            d.withColumn("tags",
              when(rule.predicate, array_union(col("tags"), array(lit(tag))))
                .otherwise(col("tags")))
          case DropSession => d // handled below
        }
      }
    }
    val dropPreds = rules.collect {
      case Rule(_, p, actions) if actions.contains(DropSession) => p
    }
    if (dropPreds.isEmpty) applied
    else applied.filter(!coalesce(dropPreds.reduce(_ || _), lit(false)))
  }
}
