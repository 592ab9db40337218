package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: installs graft's native SQL
  * functions. Enable with
  * `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`
  * (done by `graft.GraftSession.builder`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => RewriteIntervalJoin)
    ext.injectOptimizerRule(_ => RewriteRangeJoin)
    ext.injectOptimizerRule(_ => InjectBloomJoinFilter)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL DELETE/UPDATE/MERGE on graft tables: replace the resolved
    // node with the CoW command before planning refuses v1 DML
    ext.injectPostHocResolutionRule(session => GraftDmlRule(session))
    // OPTIMIZE / VACUUM — maintenance statements Spark's grammar lacks;
    // everything else delegates to the session parser untouched
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
