package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for graft's custom Catalyst expressions: the same operators
  * the Column API exposes ([[exprs]]), callable from `spark.sql(...)` — a
  * user of the engine's SQL face gets fingerprinting, simhash, cosine,
  * normalization and z-ordering without touching Scala.
  *
  * Two registration paths, one builder table:
  *  - [[GraftExtensions]]: the standard `spark.sql.extensions` injector for
  *    sessions the deployment builds;
  *  - [[GraftFunctions.register]]: runtime registration into an EXISTING
  *    session's function registry — the driver owns session construction in
  *    this harness (and in most notebooks), where the config path is out of
  *    reach.
  */
object GraftFunctions {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$what must be a string literal")
  }
  private def int(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be an integer literal")
  }

  /** (name, builder) for every SQL-exposed function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> { args =>
      require(args.length == 1, "rolling_hash(text)")
      RollingHash(args.head)
    },
    "simhash64" -> { args =>
      require(args.length == 1, "simhash64(tokens)")
      SimHash64(args.head)
    },
    "cosine_sim" -> { args =>
      require(args.length == 2, "cosine_sim(a, b)")
      CosineSim(args(0), args(1))
    },
    "dot_prod" -> { args =>
      require(args.length == 2, "dot_prod(a, b)")
      DotProd(args(0), args(1))
    },
    "shingle_hashes" -> { args =>
      require(args.length == 2, "shingle_hashes(text, n)")
      ShingleHashes(args(0), int(args(1), "n"))
    },
    "minhash_sig" -> { args =>
      require(args.length == 2, "minhash_sig(hashes, k)")
      MinHashSig(args(0), int(args(1), "k"))
    },
    "unicode_normalize" -> { args =>
      require(args.length >= 1 && args.length <= 3,
        "unicode_normalize(text[, form[, strip_accents]])")
      val form = if (args.length >= 2) str(args(1), "form") else "NFC"
      val strip = args.length >= 3 && (args(2) match {
        case Literal(b: Boolean, _) => b
        case _ => throw new IllegalArgumentException(
          "strip_accents must be a boolean literal")
      })
      NormalizeText(args.head, form, strip)
    },
    "z_value" -> { args =>
      require(args.length == 2, "z_value(bucket_array, bits_per_dim)")
      ZValue(args(0), int(args(1), "bits_per_dim"))
    })

  private def info(name: String) = new ExpressionInfo(
    "graft.functions", null, name, s"graft custom expression $name", "")

  /** Register every builder into an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = org.apache.spark.sql.GraftShim.functionRegistry(spark)
    builders.foreach { case (name, b) =>
      registry.registerFunction(FunctionIdentifier(name), info(name), b)
    }
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * [[GraftFunctions.builders]] table at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name,
          s"graft custom expression $name", ""), b))
    }
}
