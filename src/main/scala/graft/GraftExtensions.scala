package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AudioMetaExpr, AudioPcmExpr, DotProductExpr, Hash60Expr, ImageMetaExpr, MaxAbsExpr, QuantizeExpr, ShinglesExpr, UnaccentExpr, VideoMetaExpr}

/** SparkSessionExtensions entry point — registers graft's native Catalyst
  * expressions as SQL functions. Two deployment paths:
  *
  *   - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *   - live session: `GraftExtensions.register(spark)`
  *
  * Both routes share one function table, so SQL and the Column API expose
  * identical semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** (name, info, builder) triples for every graft SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot expects 2 arguments, got ${children.length}")
        DotProductExpr(children.head, children(1))
      }),
    (FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "graft_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_hash60 expects 1 argument, got ${children.length}")
        Hash60Expr(children.head)
      }),
    (FunctionIdentifier("graft_max_abs"),
      new ExpressionInfo(classOf[MaxAbsExpr].getName, "graft_max_abs"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_max_abs expects 1 argument, got ${children.length}")
        MaxAbsExpr(children.head)
      }),
    (FunctionIdentifier("graft_quantize"),
      new ExpressionInfo(classOf[QuantizeExpr].getName, "graft_quantize"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_quantize expects 2 arguments, got ${children.length}")
        QuantizeExpr(children.head, children(1))
      }),
    (FunctionIdentifier("graft_unaccent"),
      new ExpressionInfo(classOf[UnaccentExpr].getName, "graft_unaccent"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_unaccent expects 1 argument, got ${children.length}")
        UnaccentExpr(children.head)
      }),
    (FunctionIdentifier("graft_image_meta"),
      new ExpressionInfo(classOf[ImageMetaExpr].getName, "graft_image_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_image_meta expects 1 argument, got ${children.length}")
        ImageMetaExpr(children.head)
      }),
    (FunctionIdentifier("graft_audio_meta"),
      new ExpressionInfo(classOf[AudioMetaExpr].getName,
        "graft_audio_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_audio_meta expects 1 argument, got ${children.length}")
        AudioMetaExpr(children.head)
      }),
    (FunctionIdentifier("graft_audio_pcm"),
      new ExpressionInfo(classOf[AudioPcmExpr].getName,
        "graft_audio_pcm"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_audio_pcm expects 1 argument, got ${children.length}")
        AudioPcmExpr(children.head)
      }),
    (FunctionIdentifier("graft_video_meta"),
      new ExpressionInfo(classOf[VideoMetaExpr].getName,
        "graft_video_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_video_meta expects 1 argument, got ${children.length}")
        VideoMetaExpr(children.head)
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_shingles expects 2 arguments, got ${children.length}")
        ShinglesExpr(children.head, children(1))
      }))

  /** Register into an already-running session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
