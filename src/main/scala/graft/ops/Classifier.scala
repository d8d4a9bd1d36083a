package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Learned document-quality classification: logistic regression on hashed
  * bag-of-words features — the Spark-first analog of the fastText
  * wiki-vs-CommonCrawl quality filters used to curate pretraining data
  * (Joulin et al. 2016 "Bag of Tricks"; the GPT-3/LLaMA quality-filter
  * recipe). Linear model, hashed unigram features (md5 bucket, the
  * engine-portable draw every sampler here uses), L1-normalized term
  * frequencies, trained by full-batch gradient descent.
  *
  * Scale design (100 TB):
  *  - the corpus is TOKENIZED ONCE into sparse per-doc bucket counts and
  *    persisted; each GD iteration is one `treeAggregate` over that
  *    (much smaller) featurized form — the standard distributed-LR
  *    shape: O(buckets) driver state, broadcast weights down, partial
  *    gradients up a tree, never a per-row shuffle
  *  - `buckets` bounds everything: the weight vector, the per-task
  *    gradient accumulator (B+1 doubles ≈ 256 KB at the 2^15 default),
  *    and the broadcast — independent of corpus size
  *  - scoring is scan-side: the weight vector rides the plan as a dense
  *    array literal (O(1) per-token lookup) and the score is one narrow
  *    Column pass, no shuffle, no RDD round-trip (same shape as
  *    [[TextAnalysis.dsirWeights]] scoring)
  */
object Classifier {

  /** Two dense slots appended after the hashed buckets: inverse length
    * and saturating length — document-length signals that L1-normalized
    * term frequencies cannot express (they sum to 1 at any length), yet
    * every practical quality heuristic depends on. Slot layout:
    * `[0, buckets)` hashed tf, `buckets` = 1/(1+n), `buckets+1` =
    * min(n,512)/512.
    */
  private[ops] val ExtraFeats = 2

  /** Trained model: `weights(b)` per feature slot (hashed buckets +
    * [[ExtraFeats]] length slots) + `bias`; a plain case class so it
    * serializes into closures/broadcasts cheaply and persists as a tiny
    * DataFrame ([[modelDf]]).
    */
  final case class LinearTextModel(weights: Array[Double], bias: Double) {
    def buckets: Int = weights.length - ExtraFeats
  }

  /** md5-bucket of one token — identical arithmetic to the Column-side
    * `conv(substring(md5(tok),1,8),16,10) % B` used across the engine,
    * so features are engine-portable and test-reproducible.
    */
  private[ops] def bucketOf(tok: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    (h % buckets).toInt
  }

  /** Sparse L1-normalized hashed term frequencies + the two dense length
    * slots, from an already-tokenized word list. A token-less document
    * still emits the length slots (1/(1+0) = 1, 0), so "empty" is itself
    * a learnable signal. Tokenization happens Spark-side
    * ([[TextAnalysis.tokens]]) so the trainer and the Column scorer see
    * identical words under any JVM default locale — there is only one
    * lowercasing mechanism, Spark's `lower()`.
    */
  private[ops] def featurizeWords(words: Seq[String],
                                  buckets: Int): Array[(Int, Double)] = {
    val ws = if (words == null) Seq.empty[String] else words
    val n = ws.length.toDouble
    val m = scala.collection.mutable.HashMap.empty[Int, Double]
    ws.foreach { w =>
      val b = bucketOf(w, buckets)
      m.update(b, m.getOrElse(b, 0.0) + 1.0)
    }
    val tf = m.iterator.map { case (b, c) => (b, c / n) }.toArray.sortBy(_._1)
    tf ++ Array((buckets, 1.0 / (1.0 + n)), (buckets + 1, math.min(n, 512.0) / 512.0))
  }

  /** Train by full-batch gradient descent with L2 regularization.
    * `labelCol` must be 0/1 (castable to double). Deterministic for a
    * fixed input partitioning (treeAggregate merge order is fixed), and
    * the spec pins separable-data behavior; floors — not exact weights —
    * are the cross-run contract, as for every iterative fit here.
    */
  def trainHashedLR(docs: DataFrame, textCol: String, labelCol: String,
                    buckets: Int = 1 << 15, iters: Int = 30,
                    lr: Double = 1.0, l2: Double = 1e-6): LinearTextModel = {
    require(buckets > 0 && iters > 0, s"buckets/iters positive: $buckets/$iters")
    val sc = docs.sparkSession.sparkContext
    val b = buckets
    // featurize once; iterations re-scan this, not the text. Words are
    // split Spark-side with the exact expression the Column scorer uses,
    // so train/score tokenization agree by construction.
    val feats = docs.select(
        TextAnalysis.nonEmptyTokens(col(textCol)),
        col(labelCol).cast("double"))
      .rdd.map { r =>
        val ws: Seq[String] = if (r.isNullAt(0)) Seq.empty else r.getSeq[String](0)
        (featurizeWords(ws, b), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = feats.count().toDouble
    require(n > 0, "trainHashedLR: empty training set")
    val d = b + ExtraFeats
    var w = new Array[Double](d)
    val gsq = new Array[Double](d + 1)
    var bias = 0.0
    var it = 0
    while (it < iters) {
      val wB = sc.broadcast((w, bias))
      // gradient of mean log-loss: one dense (D+1)-slot accumulator per
      // task, summed up a tree — no shuffle of per-row data
      val grad = feats.treeAggregate(new Array[Double](d + 1))(
        seqOp = { (acc, row) =>
          val (wv, bv) = wB.value
          val (xs, y) = row
          var dot = bv
          xs.foreach { case (i, v) => dot += wv(i) * v }
          val p = 1.0 / (1.0 + math.exp(-dot))
          val res = p - y
          xs.foreach { case (i, v) => acc(i) += res * v }
          acc(d) += res
          acc
        },
        combOp = { (a, c) => var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a })
      wB.destroy()
      // AdaGrad per-coordinate steps (Duchi et al. 2011): the hashed tf
      // features are ~100× smaller than the dense length slots, so a
      // single global step either crawls on the tf weights or diverges on
      // the dense ones; the accumulated-squared-gradient scaling
      // equalizes them. Driver-side O(D) state, deterministic.
      val wNew = new Array[Double](d)
      var i = 0
      while (i < d) {
        val g = grad(i) / n + l2 * w(i)
        gsq(i) += g * g
        wNew(i) = w(i) - lr * g / (math.sqrt(gsq(i)) + 1e-8)
        i += 1
      }
      w = wNew
      val gb = grad(d) / n
      gsq(d) += gb * gb
      bias -= lr * gb / (math.sqrt(gsq(d)) + 1e-8)
      it += 1
    }
    feats.unpersist()
    LinearTextModel(w, bias)
  }

  /** Score every document: adds `quality_score` = σ(w·x + bias) in
    * (0, 1). A scan-side Column projection ([[scoreColumn]]): the
    * (bounded) weight vector rides the plan as a dense array literal —
    * no shuffle, no RDD round-trip, streaming-safe; token-less docs
    * score the length-slot prior.
    */
  def scoreHashedLR(docs: DataFrame, textCol: String,
                    model: LinearTextModel): DataFrame = {
    require(!docs.columns.contains("quality_score"),
      "scoreHashedLR reserves output column quality_score")
    docs.withColumn("quality_score", scoreColumn(col(textCol), model))
  }

  /** Pure-Column scorer: σ(w·x + bias) as a Column expression — usable in
    * Structured Streaming transforms (no RDD access) and inside
    * whole-stage codegen; [[scoreHashedLR]] is this plus the column name.
    * The (bounded) weight vector rides in the plan as a dense array
    * literal with O(1) per-token indexing; each lookup recomputes the
    * identical md5 bucket as the trainer's [[bucketOf]]. Scores match a driver-side
    * [[featurizeWords]] reference dot product to within float-association
    * tolerance (per-token vs per-bucket summation orders differ by
    * ~1 ulp; asserted < 1e-12 in ClassifierSpec).
    */
  def scoreColumn(text: Column, model: LinearTextModel): Column = {
    import org.apache.spark.sql.functions.{typedlit, aggregate => arrAgg}
    // DENSE array literal, not a map: Catalyst's GetMapValue (element_at
    // on a map) is a LINEAR key scan, which at buckets = 2^15 turns each
    // token lookup into a 32k-entry sweep — O(tokens · buckets) per doc.
    // GetArrayItem is O(1), and the zeros cost only plan bytes.
    val wArr = typedlit(model.weights.take(model.buckets).toSeq)
    val toks = coalesce(
      TextAnalysis.nonEmptyTokens(text), typedlit(Seq.empty[String]))
    val n = size(toks).cast("double")
    def bucket(t: Column): Column =
      conv(substring(md5(t), 1, 8), 16, 10).cast("long") % model.buckets
    val tfDot = arrAgg(toks, lit(0.0),
      (acc, t) => acc + element_at(wArr, (bucket(t) + 1).cast("int")))
    val dot = when(n > 0, tfDot / n).otherwise(lit(0.0)) +
      lit(model.weights(model.buckets)) * (lit(1.0) / (lit(1.0) + n)) +
      lit(model.weights(model.buckets + 1)) * (least(n, lit(512.0)) / 512.0) +
      lit(model.bias)
    lit(1.0) / (lit(1.0) + exp(-dot))
  }

  /** Persistable model frame: (bucket, weight) rows + a (-1, bias) row. */
  def modelDf(spark: org.apache.spark.sql.SparkSession,
              model: LinearTextModel): DataFrame = {
    import spark.implicits._
    (model.weights.zipWithIndex.map { case (v, i) => (i.toLong, v) } :+
      (-1L, model.bias)).toSeq.toDF("bucket", "weight")
  }

  /** Rehydrate [[modelDf]] output. */
  def modelFromDf(df: DataFrame): LinearTextModel = {
    val rows = df.select("bucket", "weight").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val bias = rows.find(_._1 == -1L).map(_._2).getOrElse(0.0)
    val wRows = rows.filter(_._1 >= 0)
    val w = new Array[Double](wRows.map(_._1).max.toInt + 1)
    wRows.foreach { case (i, v) => w(i.toInt) = v }
    LinearTextModel(w, bias)
  }

  /** Convenience verdict column threshold. */
  def keepAbove(scored: DataFrame, threshold: Double): DataFrame =
    scored.filter(col("quality_score") >= threshold)

  /** Classification quality report — the evaluation leg of the filter
    * family (a quality/langid/PII classifier gates millions of
    * documents; this measures the gate): one row per class with
    * support (true count), predicted (predicted count), tp, precision,
    * recall, F1, plus one `__all__` row whose precision/recall/F1 slots
    * all carry micro accuracy (for single-label classification micro
    * P = micro R = accuracy). Null labels/predictions report as the
    * class `__null__` rather than vanishing from the counts. Doubles
    * round at 9.
    *
    * Scale shape: ONE (label, pred) hash aggregate over the corpus —
    * the confusion matrix, classes² tiny rows — localCheckpointed once
    * and fanned into the per-class joins and the accuracy scalar; no
    * window, no corpus-sized join.
    */
  def classificationReport(scored: DataFrame, labelCol: String,
                           predCol: String): DataFrame = {
    val cm = scored.select(
        coalesce(col(labelCol).cast("string"), lit("__null__")).as("label"),
        coalesce(col(predCol).cast("string"), lit("__null__")).as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val byLabel = cm.groupBy(col("label").as("cls"))
      .agg(sum("n").as("support"))
    val byPred = cm.groupBy(col("pred").as("cls"))
      .agg(sum("n").as("predicted"))
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val prec = when(col("predicted") > 0,
      col("tp").cast("double") / col("predicted")).otherwise(lit(0.0))
    val rec = when(col("support") > 0,
      col("tp").cast("double") / col("support")).otherwise(lit(0.0))
    val per = byLabel.join(byPred, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("cls"), col("support"), col("predicted"), col("tp"),
        round(prec, 9).as("precision"), round(rec, 9).as("recall"),
        round(when(prec + rec > 0, lit(2.0) * prec * rec / (prec + rec))
          .otherwise(lit(0.0)), 9).as("f1"))
    val acc = when(col("support") > 0,
      col("tp").cast("double") / col("support")).otherwise(lit(0.0))
    val all = cm.agg(sum("n").as("support"),
        sum(when(col("label") === col("pred"), col("n")).otherwise(0L))
          .as("tp"))
      .select(lit("__all__").as("cls"), col("support"),
        col("support").as("predicted"), col("tp"),
        round(acc, 9).as("precision"), round(acc, 9).as("recall"),
        round(acc, 9).as("f1"))
    per.unionByName(all)
  }
}
