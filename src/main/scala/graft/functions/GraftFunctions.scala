package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions, so they compose
  * inside `expr(...)` strings and `spark.sql` alongside built-ins.
  */
object GraftFunctions {

  private val registered = new java.util.HashSet[String]()

  def ensureRegistered(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val key = System.identityHashCode(classic).toString
    // The whole check-and-register runs under one lock so that concurrent
    // callers (Verify's query pool) block until registration completes —
    // an early return on a mere membership test would let a losing thread
    // analyze a query before md5num/kll_sketch_agg/... exist.
    registered.synchronized {
      if (registered.add(key)) {
      val reg = classic.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("md5num",
        exprs => Md5Prefix60(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("extract_custom_id",
        exprs => ExtractCustomId(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("dot_product",
        exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("minhash_sig",
        exprs => MinHashSig(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("jaccard_sim",
        exprs => JaccardSim(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("min_shingle_hash",
        exprs => MinShingleHash(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("shingle_hashes",
        exprs => ShingleHashes(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("bigram_logit",
        exprs => BigramLogit(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("term_counts",
        exprs => TermCounts(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("vocab_tokenize",
        exprs => VocabTokenize(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("char_gram_counts",
        exprs => CharGramCounts(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("norm_text",
        exprs => NormText(exprs.head), "scala_udf")
      // bare decimal literals (0.7) eval to Decimal, not a java Number
      def litD(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        e.eval() match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue
        }
      reg.createOrReplaceTempFunction("mmr_select",
        exprs => MmrSelect(exprs.head, litD(exprs(1)),
          exprs(2).eval().asInstanceOf[Number].intValue), "scala_udf")
      reg.createOrReplaceTempFunction("simhash16",
        exprs => SimHash16(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("simhash60",
        exprs => SimHash60(exprs.head), "scala_udf")
      def litK(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue
        else 200
      reg.createOrReplaceTempFunction("kll_sketch_agg",
        exprs => KllSketchAgg(exprs.head, litK(exprs)), "scala_udf")
      reg.createOrReplaceTempFunction("kll_merge_agg",
        exprs => KllMergeAgg(exprs.head, litK(exprs)), "scala_udf")
      reg.createOrReplaceTempFunction("kll_sketch_quantile",
        exprs => KllQuantile(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("kll_sketch_rank",
        exprs => KllRank(exprs(0), exprs(1)), "scala_udf")
      def litMap(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue
        else 128
      reg.createOrReplaceTempFunction("freq_sketch_agg",
        exprs => FreqSketchAgg(exprs.head, litMap(exprs)), "scala_udf")
      reg.createOrReplaceTempFunction("freq_merge_agg",
        exprs => FreqMergeAgg(exprs.head, litMap(exprs)), "scala_udf")
      reg.createOrReplaceTempFunction("freq_sketch_estimate",
        exprs => FreqEstimate(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("freq_sketch_lb",
        exprs => FreqLowerBound(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("freq_sketch_ub",
        exprs => FreqUpperBound(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("freq_sketch_top1",
        exprs => FreqTop1(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("gram_agg",
        exprs => GramAgg(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue), "scala_udf")
      // Engine-owned Bloom sketch: persistable stable format + union
      // aggregate, for suppression ledgers that accrue across runs
      // (Spark's internal one below is transient and conf-capped)
      def litL(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        e.eval().asInstanceOf[Number].longValue
      reg.createOrReplaceTempFunction("bloom_agg",
        exprs => BloomAgg(exprs.head, litL(exprs(1)).toInt,
          litL(exprs(2)).toInt), "scala_udf")
      reg.createOrReplaceTempFunction("bloom_merge_agg",
        exprs => BloomMergeAgg(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("bloom_contains",
        exprs => BloomContains(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("z_value",
        exprs => ZValue(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("hilbert_value",
        exprs => HilbertValue(exprs.head), "scala_udf")
      // Spark's Bloom machinery is internal (used by automatic runtime
      // filters); exposing it lets queries apply the semi-join-reduction
      // pattern explicitly at any scale
      reg.createOrReplaceTempFunction("bloom_filter_agg",
        exprs =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "scala_udf")
      reg.createOrReplaceTempFunction("might_contain",
        exprs => org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
      if (!classic.experimental.extraOptimizations.contains(RewriteJaccard)) {
        classic.experimental.extraOptimizations =
          classic.experimental.extraOptimizations :+ RewriteJaccard
      }
      if (!classic.experimental.extraStrategies
          .contains(graft.plans.AsOfJoinStrategy)) {
        classic.experimental.extraStrategies =
          classic.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      }
      }
    }
  }
}
