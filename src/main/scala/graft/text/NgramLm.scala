package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring with stupid backoff
  * (Brants et al., "Large Language Models in Machine Translation",
  * EMNLP 2007 — the score used for web-scale LM data filtering, e.g.
  * CCNet-style perplexity pruning, re-expressed relationally).
  *
  * Training IS aggregation: unigram and bigram counts over the train
  * partition of the corpus (map-side-combined groupBys — the model "fit"
  * is two count tables, nothing iterative). Scoring is a projection of
  * each document's bigram stream through two LEFT joins against those
  * tables:
  *
  *   S(w2 | w1) = c(w1 w2) / c(w1)            if the bigram was seen
  *              = 0.4 * (c(w2)+1) / (N+U)     otherwise (backoff to an
  *                                            add-one unigram score)
  *
  * with N = train token count, U = train vocabulary size; the document
  * score is the mean ln S over its bigram positions. Stupid backoff
  * deliberately skips normalization (the scores are not a probability
  * distribution) — that is what makes it embarrassingly parallel at
  * corpus scale, and Brants et al. show it matches Kneser-Ney for
  * ranking/filtering purposes at large N.
  *
  * Scale shape: count tables are vocabulary-sized (shuffle join on the
  * token keys; at real corpora both sides partial-aggregate map-side
  * first), the per-position score stream never materializes per-doc
  * state beyond one row, and the per-document reduction sums in pinned
  * POSITION ORDER (sorted collect + left-fold) so the result is
  * bit-identical across any partitioning — and across engines: the
  * DuckDB oracle folds the same ordered list with the same IEEE ops.
  *
  * No reference analog (centimators has no text layer); greenfield
  * SURVEY.md §7.6 scope.
  */
object NgramLm {

  /** (doc_id, n_bigrams, avg_logprob) for EVERY document in `docs`;
    * the model counts come from the hashSplit "train" partition only,
    * so val/test documents genuinely exercise the backoff path.
    * Documents shorter than two tokens score null. */
  def scoreStupidBackoff(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w: Column = CorpusOps.words(col(textCol))
    val train = docs
      .where(CorpusSplit.hashSplit(col(idCol)) === "train")
      .select(w.as("__w"))

    // BOTH count tables from ONE tokenize pass and ONE shuffle: the
    // unigram and bigram streams explode together tagged by kind, and
    // the combined vocabulary-sized table localCheckpoints — its five
    // consumers (totals scalar, bigram join, two unigram joins, and
    // the eager head below) would otherwise each re-run the train
    // tokenization and count shuffle (measured: the LM build was the
    // corpus family's dominant repeated stage). Counts are integers,
    // so the split-back tables are exactly the two-aggregation form.
    val counts = train.select(explode(concat(
        transform(col("__w"),
          t => struct(lit(0).as("k"), t.as("key"))),
        transform(CorpusOps.wordNgrams(col("__w"), 2),
          g => struct(lit(1).as("k"), g.as("key"))))).as("e"))
      .groupBy(col("e.k").as("__k"), col("e.key").as("__key"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val uni = counts.where(col("__k") === 0)
      .select(col("__key").as("t"), col("__c").as("c1"))
    val bi = counts.where(col("__k") === 1)
      .select(col("__key").as("bg"), col("__c").as("c12"))
    // N (train tokens) + U (train vocabulary): one bounded scalar row
    val totals = uni.agg(sum("c1").cast("double").as("n"),
      count(lit(1)).cast("double").as("u")).head()
    val nPlusU = totals.getDouble(0) + totals.getDouble(1)

    val positions = docs.select(col(idCol), col(textCol))
      .withColumn("__w", w)
      .select(col(idCol), col("__w"),
        posexplode(CorpusOps.wordNgrams(col("__w"), 2))
          .as(Seq("pos", "bg")))
      .select(col(idCol), col("pos"), col("bg"),
        element_at(col("__w"), col("pos") + 1).as("w1"),
        element_at(col("__w"), col("pos") + 2).as("w2"))

    val scored = positions
      .join(bi, Seq("bg"), "left")
      .join(uni.withColumnRenamed("t", "w1")
        .withColumnRenamed("c1", "__cw1"), Seq("w1"), "left")
      .join(uni.withColumnRenamed("t", "w2")
        .withColumnRenamed("c1", "__cw2"), Seq("w2"), "left")
      .select(col(idCol), col("pos"),
        when(col("c12").isNotNull, log(col("c12") / col("__cw1")))
          .otherwise(log(lit(0.4) * (coalesce(col("__cw2"), lit(0L)) + 1)
            / lit(nPlusU))).as("lp"))

    val agg = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      aggregate(
        sort_array(collect_list(struct(col("pos"), col("lp")))),
        lit(0d), (acc, x) => acc + x.getField("lp")).as("__s"))

    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("__s") / col("n_bigrams")).as("avg_logprob"))
  }
}
