package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.{GraftFunctionBridge => B, LongArrayDot}
import graft.functions.{ShopifyFunctions => SF, TextFunctions => TF, VectorFunctions => VF}

/** SQL surface of the engine: every graft function registered for
  * `spark.sql(...)` use, either at session build time via
  * `spark.sql.extensions=graft.GraftExtensions` or post-hoc with
  * [[GraftExtensions.register]].
  *
  * Column-combinator functions are exposed by wrapping their Column
  * trees back into expressions (no UDFs — the SQL surface gets the same
  * codegen'd plans as the Scala API). `long_array_dot` is the native
  * codegen Expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((B.ident(name), B.info(name, usage), e => builder(e)))
    }
    // whole-operator extension: plans graft's TopKPerKeyPlan logical
    // node as a two-phase bounded-heap physical operator
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
    // optimizer rewrite: inequality-only range joins → bin equi-joins
    ext.injectOptimizerRule(s => org.apache.spark.sql.graft.RangeBinJoinRule(s))
  }
}

object GraftExtensions {
  private def c(e: Expression): Column = B.toColumn(e)
  private def x(col: Column): Expression = B.toExpression(col)

  /** (name, usage, builder) for every SQL-exposed function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("long_array_dot", "exact integer dot product of two array<long>",
      (e: Seq[Expression]) => new LongArrayDot(e(0), e(1))),
    ("graft_clean_id", "strip a Shopify GID to its trailing id, with prefix",
      (e: Seq[Expression]) => x(SF.cleanId(c(e(0)), c(e(1))))),
    ("graft_money", "money-set struct to double (shopMoney chain)",
      (e: Seq[Expression]) => x(SF.money(c(e(0))))),
    ("graft_py_str", "Python str() of a boolean: True/False/None",
      (e: Seq[Expression]) => x(SF.pyStr(c(e(0))))),
    ("graft_norm_key", "UPPER(TRIM(x)) join/dedup key",
      (e: Seq[Expression]) => x(SF.normKey(c(e(0))))),
    ("graft_join_tags", "comma-join a tag array, null-safe",
      (e: Seq[Expression]) => x(SF.joinTags(c(e(0))))),
    ("graft_tokens", "whitespace tokens of a text column",
      (e: Seq[Expression]) => x(TF.tokens(c(e(0))))),
    ("graft_token_count", "whitespace token count",
      (e: Seq[Expression]) => x(TF.tokenCount(c(e(0))))),
    ("graft_lang_id", "stopword-vote language id",
      (e: Seq[Expression]) => x(TF.langId(c(e(0))))),
    ("graft_stopword_ratio", "stopword share of tokens",
      (e: Seq[Expression]) => x(TF.stopwordRatio(c(e(0))))),
    ("graft_simhash32", "32-bit SimHash of the token multiset",
      (e: Seq[Expression]) => x(TF.simhash32(c(e(0))))),
    ("graft_word_shingles", "word k-shingles: graft_word_shingles(text, k)",
      (e: Seq[Expression]) =>
        new org.apache.spark.sql.graft.WordShingles(e(0), B.litInt(e(1), "k"))),
    ("graft_minhash_signature",
      "n-hash MinHash signature of a shingle array: graft_minhash_signature(shingles, n)",
      (e: Seq[Expression]) => x(TF.minhashSignature(c(e(0)), B.litInt(e(1), "n")))),
    ("graft_fingerprint", "md5 content fingerprint of trimmed text",
      (e: Seq[Expression]) => x(TF.fingerprint(c(e(0))))),
    ("graft_hash32", "portable 32-bit hash (md5 prefix)",
      (e: Seq[Expression]) => x(TF.portableHash(c(e(0))))),
    ("graft_cosine", "cosine similarity of two float/double arrays",
      (e: Seq[Expression]) => x(VF.cosine(c(e(0)), c(e(1))))),
    ("graft_quantize", "floor(x*1e6) integer quantization of a vector",
      (e: Seq[Expression]) => x(VF.quantize(c(e(0))))),
    ("graft_domain", "https? host of a url ('' when no match)",
      (e: Seq[Expression]) => x(graft.operators.QualityOps.extractDomain(c(e(0))))),
    ("graft_canon_url", "canonical URL (dedup key): lowercased scheme/host, " +
      "default port/fragment/trackers dropped, params sorted",
      (e: Seq[Expression]) => new org.apache.spark.sql.graft.UrlCanonicalize(e(0))),
    ("graft_quality_score", "composite [0,1] text quality heuristic",
      (e: Seq[Expression]) => x(TF.qualityScore(c(e(0))))),
    ("graft_nfc", "Unicode NFC normalization (compiled, fast no-op path)",
      (e: Seq[Expression]) =>
        new org.apache.spark.sql.graft.UnicodeNormalize(e(0), "NFC")),
    ("graft_clean_text", "full cleaning pipeline: NFC, control strip, ws collapse",
      (e: Seq[Expression]) => x(graft.operators.CleanOps.cleanText(c(e(0))))),
    ("graft_strip_html", "tag strip + one-level HTML entity decode",
      (e: Seq[Expression]) => x(graft.operators.CleanOps.stripHtml(c(e(0))))),
    ("graft_deletion_neighborhood",
      "edit-distance blocking keys: identity + delete-k variants, " +
        "graft_deletion_neighborhood(s[, radius 1|2])",
      (e: Seq[Expression]) => new org.apache.spark.sql.graft.DeletionNeighborhood(
        e(0), if (e.size > 1) B.litInt(e(1), "radius") else 1)),
    ("graft_bpe_encode",
      "BPE subword tokens with a literal merge table: " +
        "graft_bpe_encode(text, array('t h', 'th e', ...)) — each entry " +
        "'left right' (symbols never contain whitespace)",
      (e: Seq[Expression]) => new org.apache.spark.sql.graft.BpeEncode(
        e(0), parseMerges(B.litStringSeq(e(1), "merges")))),
    ("graft_bpe_encode_ids",
      "BPE token ids: graft_bpe_encode_ids(text, merges, vocab[, unk_id]) " +
        "— literal merge table + literal vocabulary, OOV → unk_id (default -1)",
      (e: Seq[Expression]) => new org.apache.spark.sql.graft.BpeEncodeIds(
        e(0), parseMerges(B.litStringSeq(e(1), "merges")),
        B.litStringSeq(e(2), "vocab"),
        if (e.size > 3) B.litInt(e(3), "unk_id") else -1)))

  private def parseMerges(entries: Seq[String]): Seq[(String, String)] =
    entries.map { m =>
      val i = m.indexOf(' ')
      require(i > 0 && m.indexOf(' ', i + 1) < 0,
        s"merge '$m' must be 'left right' with exactly one space")
      (m.substring(0, i), m.substring(i + 1))
    }

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      B.registerTemp(spark, name, builder)
    }
    org.apache.spark.sql.graft.TopKPerKey.ensureStrategy(spark)
    val rule = org.apache.spark.sql.graft.RangeBinJoinRule(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[org.apache.spark.sql.graft.RangeBinJoinRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
