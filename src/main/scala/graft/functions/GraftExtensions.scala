package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Production registration route: inject the engine's native expressions
  * into every session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the
  * per-session `GraftFunctions.ensureRegistered` covers ad-hoc sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("md5num"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5num"),
      exprs => Md5Prefix60(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("extract_custom_id"),
      new ExpressionInfo(classOf[ExtractCustomId].getName, "extract_custom_id"),
      exprs => ExtractCustomId(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => MinHashSig(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      exprs => JaccardSim(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("min_shingle_hash"),
      new ExpressionInfo(classOf[MinShingleHash].getName, "min_shingle_hash"),
      exprs => MinShingleHash(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      exprs => ShingleHashes(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("bigram_logit"),
      new ExpressionInfo(classOf[BigramLogit].getName, "bigram_logit"),
      exprs => BigramLogit(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("term_counts"),
      new ExpressionInfo(classOf[TermCounts].getName, "term_counts"),
      exprs => TermCounts(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      exprs => SimHash16(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      exprs => SimHash60(exprs.head)))
    e.injectOptimizerRule(_ => RewriteJaccard)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
