package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions`. Registers the
  * engine's native expressions (currently `cosine_sim`) into every session
  * built against the extension — the supported mechanism for shipping
  * custom Catalyst expressions with a library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
      graft.functions.GraftFunctions.cosineSimBuilder))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(
        classOf[graft.functions.TopKByScore].getName, "topk_by_score"),
      graft.functions.GraftFunctions.topKBuilder))
    ext.injectFunction((
      FunctionIdentifier("theta_sketch"),
      new ExpressionInfo(
        classOf[graft.functions.ThetaSketchAgg].getName, "theta_sketch"),
      graft.functions.GraftFunctions.thetaBuilder))
    ext.injectFunction((
      FunctionIdentifier("squared_l2"),
      new ExpressionInfo(
        classOf[graft.functions.SquaredL2].getName, "squared_l2"),
      graft.functions.GraftFunctions.squaredL2Builder))
  }
}
