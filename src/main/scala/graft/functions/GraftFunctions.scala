package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.col

import graft.expressions.{CosineSimilarity, DotProduct, MinHashSignature}

/** SQL surface for the graft function library: every engine function a
  * pipeline author needs is callable from `spark.sql(...)`, not only from
  * the Scala DSL — the reference's users write their transformation logic
  * as SQL (`fetch.definition`), so SQL reachability is part of API parity.
  *
  * Two registration paths, same builders:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (cluster-wide, survives session cloning);
  *   - [[GraftFunctions.register]] for an already-running session.
  *
  * The vector/minhash entries resolve to the native codegen expressions in
  * `graft.expressions` — SQL callers get the same single-pass generated
  * kernels as the Scala API, not UDF wrappers.
  */
object GraftFunctions {

  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def e(col: Column): Expression = GraftColumnBridge.expressionNow(col)

  private def intArg(args: Seq[Expression], i: Int, name: String): Int =
    args(i) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$name expects a literal integer at argument $i, got $other")
    }

  /** name → (arity description, builder). Column-composed helpers go
    * through the bridge; config-bearing ones read literal arguments. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot"    -> (args => DotProduct(args(0), args(1))),
    "graft_cosine" -> (args => CosineSimilarity(args(0), args(1))),
    "graft_minhash" -> { args =>
      // graft_minhash(text, shingleSize, k): full signature pipeline —
      // tokenize then the one-pass generated kernel (empty-text convention
      // included via the same coalesce as the Scala API)
      val sh = intArg(args, 1, "graft_minhash")
      val k  = intArg(args, 2, "graft_minhash")
      e(graft.ops.ApproxDedup.minhashSignature(c(args(0)), sh, k))
    },
    "graft_tokens"      -> (args => e(TextFns.tokens(c(args(0))))),
    "graft_token_count" -> (args => e(TextFns.tokenCount(c(args(0))))),
    "graft_quality"     -> (args => e(TextFns.qualityScore(c(args(0))))),
    "graft_langid"      -> (args => e(TextFns.langId(c(args(0))))),
    "graft_fingerprint" -> (args => e(TextFns.fingerprint(c(args(0))))),
    "graft_redact_pii"  -> (args => e(TextFns.redactPii(c(args(0))))),
    "graft_nfc"         -> (args => graft.expressions.UnicodeNormalize(args(0), "NFC")),
    "graft_char_entropy" -> (args => e(TextFns.charEntropy(c(args(0))))),
    "graft_winnow" -> { args =>
      // graft_winnow(text, k, w): winnowing fingerprints, one kernel pass
      val k = intArg(args, 1, "graft_winnow")
      val w = intArg(args, 2, "graft_winnow")
      graft.expressions.WinnowFingerprints(
        e(org.apache.spark.sql.functions.lower(c(args(0)))), k, w)
    },
    "graft_round_time" -> { args =>
      val unit = args(1) match {
        case Literal(u, _) if u != null => u.toString
        case other => throw new IllegalArgumentException(
          s"graft_round_time expects a literal unit string, got $other")
      }
      e(graft.dsl.RoundTime.floor(c(args(0)), unit))
    },
    "graft_split_label" -> { args =>
      // graft_split_label(id, trainPct, valPct, testPct)
      val tr = intArg(args, 1, "graft_split_label")
      val va = intArg(args, 2, "graft_split_label")
      val te = intArg(args, 3, "graft_split_label")
      e(graft.ops.Sampling.splitLabel(c(args(0)),
        Seq("train" -> tr, "val" -> va, "test" -> te)))
    },
    "graft_simhash" -> (args => graft.expressions.SimHashRow(args(0), 63)),
    "graft_html_to_text" -> (args => e(TextFns.htmlToText(c(args(0))))),
    "graft_strip_tracking" ->
      (args => e(TextFns.stripTrackingParams(c(args(0))))),
    "graft_normalize_url" -> (args => e(TextFns.normalizeUrl(c(args(0))))))

  /** Register into a live session (temp functions, this session only).
    * Idempotent registration is skipped: createOrReplaceTempFunction on an
    * already-registered name WARNs once per function, and a bench pass
    * re-running the registering query floods the captured tail with 18
    * "replaced a previously registered function" lines. The builders are
    * immutable, so an existing registration is always the same function. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      val reg = spark.sessionState.functionRegistry
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        b))
    }
}
