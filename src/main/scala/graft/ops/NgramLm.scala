package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantized bigram language-model quality filter — the CCNet-style
  * "perplexity filter" of an LLM data pipeline (train a small LM on the
  * corpus, score every document, gate on bits-per-token), re-expressed so
  * the score is EXACT cross-engine.
  *
  * Why quantized: true perplexity needs `ln`, and libm/JVM transcendentals
  * are not guaranteed to round identically — a hash-match oracle would be
  * flaky at the last ulp. Instead each add-one-smoothed bigram probability
  * p = (c+1)/(cu+V) (an IEEE-exact division of exact integers) is
  * quantized to q = max(1, floor(p·2^30)) (power-of-two scaling and floor
  * are exact), and the token cost is its integer bit-cost
  * 30 − floor(log2 q) = 31 − length(bin(q)) — derived from the binary
  * string length, never from a floating log. Every intermediate is
  * bit-identical in any IEEE engine, so DuckDB can replay training AND
  * scoring exactly; the price is that the score is the integer-bit
  * envelope of −log2 p rather than its real value, which for a
  * keep/drop gate is the same decision boundary family.
  *
  * Scale shape: training is ONE shuffle (bigram groupBy with map-side
  * combine — the reduce side holds distinct bigrams, not corpus tokens);
  * context totals and vocabulary size are aggregates of that small frame.
  * Scoring broadcasts the model (bigram counts + context totals + |V|)
  * and is otherwise map-side until the per-document sum. On a 100 TB
  * corpus the model must be capped (top-V vocabulary, top-B bigrams by
  * count — rare bigrams fall through to the unseen leg, which is exactly
  * what add-one smoothing models); the cap keeps the broadcast bounded
  * while the scoring plan is unchanged.
  */
object NgramLm {

  /** 2^30 — the probability quantization grid. */
  val Scale: Long = 1073741824L

  final case class Model(bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** Consecutive-pair (doc_id-ish idCol, u, v) rows; the pair array is
    * built locally with zip_with over two slices — no shuffle, no UDF.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> struct(a AS u, b AS v))")).as("p"))
      .select(col(idCol), col("p.u").as("u"), col("p.v").as("v"))

  /** Train: bigram counts, per-context totals, vocabulary size. */
  def train(docs: DataFrame, idCol: String, textCol: String): Model = {
    val pe = pairs(docs, idCol, textCol)
    // Measured and deliberately NOT cached (r15 optimization pass): the
    // `bigrams`/`contexts` broadcasts are two exchanges whose shared
    // scan→explode→aggregate subtree runs twice, and persisting `big` to
    // share it was tried — it LOST (~17% on q_lm_perplexity at sf0.1):
    // on natural text the distinct-bigram frame is close to pair-count
    // sized, so the cache write+read costs more than the second columnar
    // scan + map-side-combined shuffle it saves. At 100 TB the model is
    // capped (top-B bigrams) BEFORE broadcast, which re-bounds this
    // frame; revisit the cache only together with that cap.
    val big = pe.groupBy("u", "v").agg(count(lit(1)).as("c"))
    val ctx = big.groupBy("u").agg(sum("c").as("cu"))
    val voc = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct("tok").as("v_size"))
    Model(big, ctx, voc)
  }

  /** Per-pair integer bit-cost rows (idCol, bits) for a (possibly
    * streaming) pair frame. All model joins are broadcast against static
    * frames — on a streaming input this is a stateless stream-static
    * plan (no state store); the 1-row vocabulary joins on a constant key
    * so the streaming planner sees an equi-join, not a cross join.
    */
  /** Integer bit-cost of one smoothed, quantized probability. */
  private def bitsOf(c: Column, cu: Column, vSize: Column): Column = {
    val q = greatest(lit(1L), floor(
      (coalesce(c, lit(0L)) + lit(1L)).cast("double")
        / (coalesce(cu, lit(0L)) + vSize).cast("double")
        * lit(Scale.toDouble)))
    (lit(31) - length(bin(q))).cast("long")
  }

  /** Join one model's broadcast frames onto a pair frame, with the
    * model's count columns renamed by `suffix` so two models can ride
    * the same pass. The vocabulary row joins on a constant key so the
    * streaming planner sees an equi-join, not a cross join.
    */
  private def joinModel(pe: DataFrame, m: Model, suffix: String): DataFrame =
    pe.join(broadcast(
        m.bigrams.select(col("u"), col("v"), col("c").as(s"c$suffix"))),
        Seq("u", "v"), "left")
      .join(broadcast(
        m.contexts.select(col("u"), col("cu").as(s"cu$suffix"))),
        Seq("u"), "left")
      .join(broadcast(m.vocab.select(col("v_size").as(s"vs$suffix"))
        .withColumn("_k", lit(1))), Seq("_k"))

  private def pairBits(pe: DataFrame, idCol: String, m: Model): DataFrame =
    joinModel(pe.withColumn("_k", lit(1)), m, "")
      .select(col(idCol),
        bitsOf(col("c"), col("cu"), col("vs")).as("bits"))

  /** Score: per-document (n_bigrams, bits_sum, bits_per_token). The model
    * frames are broadcast; the only exchange is the per-document sum.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, m: Model): DataFrame =
    pairBits(pairs(docs, idCol, textCol), idCol, m)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("bits_sum"))
      .select(col(idCol), col("n_bigrams"), col("bits_sum"),
        round(col("bits_sum").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("bits_per_token"))

  /** Streaming scoring: the same per-pair bit-cost over a STREAMING
    * corpus against a static broadcast model — stateless (no watermark,
    * no state store), the inline shape of the batch filter. Per-document
    * aggregation is the caller's `foreachBatch` side of the contract
    * (micro-batch `groupBy` over complete documents), mirroring
    * [[Decontaminate.streamGramFlags]].
    */
  def streamBits(corpusStream: DataFrame, idCol: String, textCol: String,
      m: Model): DataFrame =
    pairBits(pairs(corpusStream, idCol, textCol), idCol, m)

  /** DSIR-style importance weights (Xie et al.: data selection via
    * importance resampling, here with the quantized bigram LM as the
    * feature model): every corpus document is scored under a TARGET
    * model (trained on the in-domain slice) and a RAW model (trained on
    * the corpus itself); the importance weight is the integer bit saving
    * `bits_raw − bits_target` — positive means the target distribution
    * finds the document more probable, i.e. select it. Both models are
    * broadcast; the per-document score frames join on the id (one small
    * aggregate-sized shuffle).
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val mT = train(target, idCol, textCol)
    val mR = train(corpus, idCol, textCol)
    // both models ride ONE pass over the corpus pairs (one explode, six
    // broadcast probes, one per-document aggregate) — no second corpus
    // scan, no score-frame join
    val pe = pairs(corpus, idCol, textCol).withColumn("_k", lit(1))
    joinModel(joinModel(pe, mT, "_t"), mR, "_r")
      .select(col(idCol),
        bitsOf(col("c_t"), col("cu_t"), col("vs_t")).as("bt"),
        bitsOf(col("c_r"), col("cu_r"), col("vs_r")).as("br"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("bt").as("_bt"),
        sum("br").as("_br"))
      .select(col(idCol), col("n_bigrams"), (col("_br") - col("_bt")).as("w"))
  }
}
