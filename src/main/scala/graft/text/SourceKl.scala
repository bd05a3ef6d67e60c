package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source unigram KL divergence — the domain-shift / drift
  * diagnostic a mixture pipeline runs before (and after) reweighting:
  * KL(P_s ‖ P) = Σ_w p_s(w)·ln(p_s(w)/p(w)), each source's token
  * distribution against the corpus-wide one. High-KL sources are the
  * outliers to inspect; near-zero means the source matches the blend.
  * (The unigram form of the domain-relevance weighting in e.g. DSIR,
  * Xie et al. 2023, arXiv:2302.03169 — public literature.)
  *
  * Shapes: (source, token) counts are ONE map-side-combined groupBy;
  * source totals and corpus token counts derive from that frame (no
  * second corpus scan); the corpus total is a broadcast scalar. The
  * final per-source sum folds a token-SORTED list (the
  * [[NgramLm]] deterministic-sum pattern — bit-reproducible and
  * mirrored by the oracle's `list_reduce(list(... ORDER BY t))`); its
  * group size is VOCABULARY-bounded (a language's unigram vocabulary,
  * not the corpus), the same bounded-group contract as the LM count
  * tables.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.6).
  */
object SourceKl {

  private val liveCaches =
    graft.operators.GraftTransformer.newCacheQueue()

  /** One row per source: (sourceCol, n_tokens, n_distinct, kl). */
  def unigramKl(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    liveCaches.release()
    // the ONE corpus-sized pass (tokenize + (source, token) counts) is
    // persisted: source totals, corpus token counts and the final join
    // all derive from this vocabulary-sized frame instead of
    // re-scanning the corpus per consumer
    val st = liveCaches.keep(docs
      .select(col(sourceCol), explode(CorpusOps.words(col(textCol)))
        .as("__t"))
      .groupBy(col(sourceCol), col("__t"))
      .agg(count(lit(1)).as("__cst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val perSource = st.groupBy(col(sourceCol))
      .agg(sum(col("__cst")).cast("double").as("__ns"))
    val perToken = st.groupBy(col("__t"))
      .agg(sum(col("__cst")).cast("double").as("__ct"))
    val total = perToken.agg(sum(col("__ct")).as("__n"))
    val ps = col("__cst").cast("double") / col("__ns")
    val term = ps * log(ps / (col("__ct") / col("__n")))
    st.join(broadcast(perSource), Seq(sourceCol))
      .join(perToken, Seq("__t"))
      .crossJoin(broadcast(total))
      .select(col(sourceCol), col("__t"), col("__cst"), term.as("__term"))
      .groupBy(col(sourceCol))
      .agg(sum(col("__cst")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        aggregate(
          sort_array(collect_list(struct(col("__t"), col("__term")))),
          lit(0d), (acc, x) => acc + x.getField("__term")).as("kl"))
  }
}
