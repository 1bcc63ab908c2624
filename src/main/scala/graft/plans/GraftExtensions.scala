package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration for the engine's native expressions,
  * so they are first-class SQL functions:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions      (config route)
  *   GraftExtensions.register(spark)                        (live session)
  *
  * Functions: float_vec_dot(a,b), simhash64(tokens),
  * minhash_sig(shingles, k), word_shingles(text, k),
  * lsh_buckets(vec, nBits, seed...).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // any graft session gets the WindowExec-warning demotion: the two
    // deliberate bounded global passes otherwise spam every log while
    // ScaleLint below is the actual (plan-aware) unbounded-window alarm
    LogHygiene.suppressBoundedWindowWarn()
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // read-only scale guardrails (spark.graft.scalelint=off|warn|fail):
    // logical shapes (global windows, accidental cartesians) at optimize
    // time; vector-payload shuffles at the physical level via BOTH hooks —
    // query-stage prep (AQE) and columnar-rule preparations (non-AQE and
    // streaming micro-batches), so the check runs wherever the plan does
    ext.injectOptimizerRule(ScaleLintRule)
    ext.injectQueryStagePrepRule(ScaleLintShuffleRule)
    ext.injectColumnar(ScaleLintColumnarRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "numHashes"))),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), intLit(args(1), "k"))),
    ("lsh_buckets",
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (args: Seq[Expression]) => LshBuckets(args(0), intLit(args(1), "nBits"),
        args.drop(2).map(intLit(_, "seed")).toArray)))

  /** Register into an already-running session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
