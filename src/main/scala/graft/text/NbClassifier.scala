package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.ScopedStorage.Ops

/** Multinomial Naive Bayes text classifier with fully deterministic
  * training — the oracle-replayable analog of the fastText linear
  * classifiers real cleaning pipelines train for quality/domain routing
  * (CCNet's LM-vs-web filter, GPT-3's WebText-vs-CommonCrawl quality
  * classifier). NB training IS aggregation: per-class token counts and
  * class priors, both exact integer group-bys — so unlike SGD-trained
  * models the learned weights are bit-identical across partitionings,
  * cluster shapes, and engines, and a SQL oracle can replay training AND
  * inference term-for-term.
  *
  * Determinism: per-(class, term) conditional log-probabilities quantize
  * to micro-nats (×1e6, half-up longs) at MODEL BUILD, as do the class
  * priors; a document's per-class score is then an exact integer sum
  * (token count × micro log-prob), and argmax ties break on class name
  * asc — total-ordered, replayable.
  *
  * Scale shape: training is one (class, term) aggregation over the
  * labeled corpus (map-side combined; output is vocabulary-sized) plus a
  * 1-row-per-class prior table. The model — vocab × classes micro-nat
  * longs — is bounded by the `vocabSize` cut and broadcast to scorers.
  * Scoring joins each document's (term, count) pairs against the
  * broadcast model (scan-side, no wide shuffle carries text) and sums by
  * (doc, class); the argmax is a per-document window over `C` rows.
  * Train-once/score-many ([[train]] → [[predict]]) is the production
  * shape — the model frames are small enough to persist as tables and
  * reuse across batches or a stream; [[predict]] is STATELESS given the
  * model, so it applies unchanged to a streaming micro-batch.
  */
object NbClassifier {

  /** A trained model: `conditionals` = (__cls, __t, __lp micro-nat) over
    * the dense vocab × class grid; `priors` = (__cls, __prior micro-nat).
    * Both are small bounded frames (vocabSize × classes rows).
    */
  final case class NbModel(conditionals: DataFrame, priors: DataFrame)

  private def toks(df: DataFrame, textCol: String, keep: Column*): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(keep :+
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"): _*)
      .filter(col("__t") =!= "")

  private val microOf = (p: Column) => round(log(p) * 1e6, 0).cast("long")

  /** Train on `labeled` (labelCol = class): exact integer count tables,
    * Laplace smoothing over the top-`vocabSize` vocabulary, micro-nat
    * quantization at build. The returned frames are deterministic — a
    * retrain on any partitioning yields identical rows.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      vocabSize: Int = 50000): NbModel = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val classTok = toks(labeled, textCol, col(labelCol).as("__cls"))
      .groupBy("__cls", "__t").agg(count(lit(1)).as("__c"))
      .scopedCheckpoint(false) // vocab cut + per-class totals + model join
    val vocab = classTok.groupBy("__t").agg(sum(col("__c")).as("__tot"))
      .orderBy(col("__tot").desc, col("__t")).limit(vocabSize)
      .select("__t")
    val classTotals = classTok.groupBy("__cls").agg(sum(col("__c")).as("__ct"))
    val vocabN = vocab.count()
    // Laplace-smoothed conditionals over the vocab cut, quantized at
    // build. The vocab × class grid is built dense (cross join vocab ×
    // classes, left join observed counts) so unseen (class, term) cells
    // carry the floor explicitly — scorers then need no per-class
    // fallback arithmetic.
    val model = vocab.crossJoin(classTotals)
      .join(classTok, Seq("__cls", "__t"), "left")
      .select(col("__cls"), col("__t"),
        microOf((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
          (col("__ct") + lit(vocabN)).cast("double")).as("__lp"))
    // Priors from document counts (not token counts).
    val nDocs = labeled.filter(col(textCol).isNotNull).count()
    require(nDocs > 0, "NB training corpus is empty")
    val priors = labeled.filter(col(textCol).isNotNull)
      .groupBy(col(labelCol).as("__cls")).agg(count(lit(1)).as("__nd"))
      .select(col("__cls"),
        microOf(col("__nd").cast("double") / lit(nDocs.toDouble)).as("__prior"))
    NbModel(model, priors)
  }

  /** Score `docs` under a trained model, returning (idCol, predicted
    * class, micro-exact winning score). Out-of-vocabulary tokens are
    * ignored (standard feature restriction); a document with no vocab
    * tokens falls back to priors alone — it still gets a prediction,
    * ties breaking on class name asc. Stateless given the model: works
    * identically on a batch frame or a streaming micro-batch.
    */
  def predict(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docTerms = toks(docs, textCol, col(idCol).as("__id"))
      .groupBy("__id", "__t").agg(count(lit(1)).as("__n"))
    val perClass = docTerms.join(broadcast(model.conditionals), Seq("__t"))
      .groupBy("__id", "__cls")
      .agg(sum(col("__n") * col("__lp")).as("__ts"))
    // Cross the id set with priors so zero-vocab-token documents keep
    // every class row.
    val ids = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id")).distinct()
    val scores = ids.crossJoin(broadcast(model.priors))
      .join(perClass, Seq("__id", "__cls"), "left")
      .select(col("__id"), col("__cls"),
        (col("__prior") + coalesce(col("__ts"), lit(0L))).as("__s"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__s").desc, col("__cls").asc)
    scores.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("__id").as(idCol), col("__cls").as("predicted"),
        (col("__s") / 1e6).as("score"))
  }

  /** Train on `labeled` and score `docs` in one call — the gate shape. */
  def trainPredict(labeled: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, vocabSize: Int = 50000): DataFrame =
    predict(train(labeled, textCol, labelCol, vocabSize), docs, idCol, textCol)
}
