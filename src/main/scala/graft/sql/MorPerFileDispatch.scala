package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge

/** Per-file deletion-vector dispatch for SQL reads of a graft-manifest
  * table (r17 verdict task 1).
  *
  * Without this rule, ANY live merge-on-read deletion vector makes the
  * DSv2 scan serve the ENTIRE pinned snapshot through the row-based
  * dv-applying scan ([[org.apache.spark.sql.graft.SnapshotScanBuilder]]
  * `hasDv` fallback — still correct, still the safety net when the
  * extensions are not installed). At 100 TB that is a table-wide
  * vectorization loss for one trickle-deleted file, between the delete
  * and the next `CALL system.compact(only_dv => true)`.
  *
  * This optimizer rule makes the SQL path match what the programmatic
  * read core ([[graft.ops.Layout.readManifestLines]]) always did:
  * rewrite the relation into
  *
  * {{{
  *   Union(
  *     DataSourceV2Relation(snapshot restricted to dv-FREE files),
  *              // untouched vectorized parquet BatchScan: filter
  *              // pushdown, column pruning, manifest skipping
  *     maskedDvRead(dv-CARRYING files))
  *              // (grp, pos) anti-join of exactly the dv'd files
  * }}}
  *
  * so the vectorization (and scan cost) penalty is ∝ the dv'd files,
  * never the table. It runs in the operator-optimization batch — BEFORE
  * `V2ScanRelationPushDown`, so Catalyst still pushes filters/projection
  * through the Union into both branches.
  *
  * Guards:
  *   - plans requesting `_file`/`_pos` keep the single row-based scan
  *     (row-level group/ordinal semantics need one file universe);
  *   - row-level command targets never match (the analyzer has already
  *     rewritten them over `RowLevelOperationTable`, a different class);
  *   - the rewrite converges because the dv-free branch view reports
  *     `hasLiveDvs = false`.
  */
object MorPerFileDispatch extends Rule[LogicalPlan] {

  private val MetaCols = Set(GraftRowLevel.FileColumnName,
    GraftRowLevel.PosColumnName)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2Relation if eligible(r) =>
      val t = r.table.asInstanceOf[GraftTable]
      val spark = SparkSession.active
      // the masked branch: dv-applying read of ONLY the dv'd files,
      // columns aligned to the relation's output order
      val masked = ColumnBridge.logicalPlan(
        graft.ops.Layout.maskedDvRead(spark, t.tableDir, t.pinnedV)
          .select(r.output.map(a => col(a.name)): _*))
      val twin = t.dvFreeTwin
      if (twin.hasDvFreeFiles)
        // first child keeps the relation's attribute ids, so parent
        // operators resolve against the Union untouched
        Union(r.copy(table = twin), masked)
      else
        // every file carries a dv — no vectorized branch; preserve the
        // relation's output ids through an aliasing projection
        Project(r.output.zip(masked.output).map { case (o, m) =>
          Alias(m, o.name)(exprId = o.exprId)
        }, masked)
  }

  private def eligible(r: DataSourceV2Relation): Boolean = r.table match {
    case t: GraftTable =>
      !r.output.exists(a => MetaCols(a.name)) && t.hasLiveDvs
    case _ => false
  }
}
