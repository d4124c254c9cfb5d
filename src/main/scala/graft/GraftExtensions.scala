package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Library entry point for SQL users: register every graft expression
  * through the standard extensions mechanism —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder). After
  * that, `SELECT char_fold(text), format_bytes(bytes) ...` works in
  * plain SQL in every session of the application, with the same
  * codegen'd expressions the DataFrame API uses — no session-local
  * `register()` calls needed. Integer-literal arities (shingle width,
  * n-gram size, window, plane count) are exposed as fixed-arg SQL
  * forms taking the literal as a foldable second argument.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    // reject out-of-range instead of truncating: bloom_build(v, 2^32+4096, 5)
    // would otherwise silently build a 4096-bit filter
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) if v.isValidInt =>
      v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      throw new IllegalArgumentException(s"$what out of Int range: $v")
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))

    inject("format_bytes", es => FormatBytes(es.head))
    inject("char_fold", es => CharFold(es.head))
    inject("char_fold_array", es => CharFoldArray(es.head))
    inject("tokenize", es => Tokenize(es.head))
    inject("simhash16", es => SimHash16(es.head))
    inject("simhash64", es => SimHash64(es.head))
    inject("subword_count", es => SubwordCount(es.head))
    inject("dot_long", es => DotLong(es(0), es(1)))
    inject("log_bucket", es => LogBucket(es.head))
    inject("bpe_merge_step", {
      case Seq(e, l, r) =>
        BpeMergeStep(e, strLit(l, "bpe left symbol"), strLit(r, "bpe right symbol"))
      case es => throw new IllegalArgumentException(
        s"bpe_merge_step takes (syms, left, right), got ${es.length} args")
    })
    inject("shingle_hashes", es => ShingleHashes(es(0), intLit(es(1), "shingle width")))
    inject("token_ngrams", es => TokenNgrams(es(0), intLit(es(1), "n-gram size")))
    inject("winnow", es => Winnow(es(0), intLit(es(1), "window")))
    inject("hyperplane_bucket", es =>
      HyperplaneBucket(es(0), intLit(es(1), "plane count")))
    inject("bloom_build", {
      case Seq(e, bits, k) =>
        BloomBuild(e, intLit(bits, "bloom bits"), intLit(k, "bloom hashes"))
          .toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"bloom_build takes (value, bits, hashes), got ${es.length} args")
    })
    inject("bloom_probe", es => BloomProbe(es(0), es(1)))
    inject("freq_candidates", {
      case Seq(e, kLit) =>
        FreqCandidates(e, intLit(kLit, "candidate count")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"freq_candidates takes (value, k), got ${es.length} args")
    })
    inject("hll_distinct", {
      case Seq(e) => HllDistinct(e).toAggregateExpression()
      case Seq(e, pLit) =>
        HllDistinct(e, intLit(pLit, "hll precision")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"hll_distinct takes (value [, precision]), got ${es.length} args")
    })
    inject("hll_sketch", {
      case Seq(e) => HllSketchAgg(e).toAggregateExpression()
      case Seq(e, pLit) =>
        HllSketchAgg(e, intLit(pLit, "hll precision")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"hll_sketch takes (value [, precision]), got ${es.length} args")
    })
    inject("hll_merge", {
      case Seq(e) => HllMergeAgg(e).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"hll_merge takes (sketch), got ${es.length} args")
    })
    inject("hll_estimate", es => HllEstimate(es.head))
    inject("lb_hist", {
      case Seq(e) => LbHistAgg(e).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"lb_hist takes (value), got ${es.length} args")
    })
    inject("lb_merge", {
      case Seq(e) => LbMergeAgg(e).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"lb_merge takes (sketch), got ${es.length} args")
    })
    inject("lb_quantile", {
      case Seq(e, n0, d0) =>
        LbQuantile(e, intLit(n0, "quantile numerator"), intLit(d0, "quantile denominator"))
      case es => throw new IllegalArgumentException(
        s"lb_quantile takes (sketch, num, den), got ${es.length} args")
    })
    inject("cms_build", {
      case Seq(e, w, d) =>
        CmsBuild(e, intLit(w, "cms width"), intLit(d, "cms depth"))
          .toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"cms_build takes (value, width, depth), got ${es.length} args")
    })
    inject("cms_query", {
      case Seq(sketch, v) => CmsQuery(sketch, v)
      case es => throw new IllegalArgumentException(
        s"cms_query takes (sketch, value), got ${es.length} args")
    })
    inject("cms_inner", {
      case Seq(a, b) => CmsInner(a, b)
      case es => throw new IllegalArgumentException(
        s"cms_inner takes (sketch, sketch), got ${es.length} args")
    })
    inject("topk_keys", {
      case Seq(key, ord, kLit) =>
        TopKKeys(key, ord, intLit(kLit, "top-k count")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"topk_keys takes (key, ord, k), got ${es.length} args")
    })
  }
}
