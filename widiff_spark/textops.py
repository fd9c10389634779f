"""Text analysis operators for large-scale training-data pipelines.

All four operators are pure JVM-side column algebra (no Python in the hot
path): language-ID (stopword-membership heuristic), quality scoring,
token counting, and document fingerprinting.  Each has an exact ANSI-SQL
oracle in ``__spark_entry__.oracle_sql`` — the implementations deliberately
use only engine-portable primitives (md5, ascii, regexp splits) so DuckDB
reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from widiff_spark.spread import spread_small_scan

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# deterministic and mirrored into the SQL oracle
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "es"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist"],
}


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic,
    the standard budget approximation for byte-level BPE vocabularies)."""
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.ceil(F.length("text") / 4).cast("long").alias("n_bpe_est"),
    )


def _quality_exprs():
    """The per-document quality signal expressions (pure column algebra,
    map-only) — shared by quality_score and the aggregating consumers
    (source_stats, sampling.curriculum_buckets) so they can compute the
    score inline in their own single scan instead of joining the
    quality frame back on doc_id (an avoidable full-corpus shuffle).
    Returns (n_tokens, punct_ratio, stop_ratio, mean_word_len, score)."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    stop_list = sorted(set(w for ws in STOPWORDS.values() for w in ws))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(stop_list)))
    mean_word_len = F.round((n_chars - (n_tokens - F.lit(1)))
                            / F.greatest(n_tokens, F.lit(1)), 4)
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4)
    score = F.round(
        F.when((n_tokens >= 5) & (n_tokens <= 1000), 0.4).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.3).otherwise(0.0)
        + F.least(stop_ratio * 2, F.lit(0.3)), 4)
    return n_tokens, punct_ratio, stop_ratio, mean_word_len, score


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length band + punctuation ratio +
    stopword ratio + mean word length (rounded for cross-engine stability)."""
    (n_tokens, punct_ratio, stop_ratio, mean_word_len,
     score) = _quality_exprs()
    return docs.select("doc_id", n_tokens.alias("n_tokens"),
                       punct_ratio.alias("punct_ratio"),
                       stop_ratio.alias("stopword_ratio"),
                       mean_word_len.alias("mean_word_len"),
                       score.alias("quality"))


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-membership language ID: explode tokens, broadcast-join the
    stopword dim, argmax hits per doc (ties -> lexicographically first
    language; zero hits -> 'und')."""
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
        "cand_lang string, word string")
    toks = docs.select("doc_id",
                       F.explode(_tokens(F.lower("text"))).alias("word"))
    hits = (toks.join(F.broadcast(dim), "word")
            .groupBy("doc_id", "cand_lang").agg(F.count("*").alias("hits")))
    # argmax as ONE partially-aggregated min_by over (-hits, cand_lang) —
    # max hits, ties to the lexicographically first language — instead of
    # a row_number window's sort-exchange (the knn_ivf / canonical_corpus
    # house pattern; r7 verdict ask #9)
    best = (hits.groupBy("doc_id")
            .agg(F.min_by(F.struct("cand_lang", "hits"),
                          F.struct((-F.col("hits")).alias("_nh"),
                                   F.col("cand_lang"))).alias("_b"))
            .select("doc_id", F.col("_b.cand_lang").alias("lang_pred"),
                    F.col("_b.hits").alias("lang_hits")))
    return (docs.select("doc_id").join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
                    F.coalesce("lang_hits", F.lit(0)).alias("lang_hits")))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Canonical document fingerprint: md5 of the whitespace-normalized,
    lowercased text (the rolling-hash analog, engine-portable)."""
    norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def pack_documents(docs: DataFrame, token_budget: int = 512,
                   n_shards: int = 16) -> DataFrame:
    """Greedy sequence packing for training batches: assign each document
    to a pack so packs fill up to ``token_budget`` whitespace tokens.

    Scale shape: docs shard by ``doc_id % n_shards`` (embarrassingly
    parallel — at 100 TB raise n_shards to the cluster width); within a
    shard the packing is the deterministic greedy first-fit over doc_id
    order, run as ONE applyInPandas group pass (packing is inherently
    sequential *within* a pack stream, so the parallel unit is the shard,
    not the row).  A doc larger than the budget still opens its own pack.

    Deterministic: same corpus -> same packs on any partitioning/cluster;
    the DuckDB oracle replays the identical greedy fold with a recursive
    CTE (query ``text_pack_documents``).

    Returns (doc_id, shard, pack_id, n_tokens) — pack_id is per-shard,
    1-based.
    """
    import pandas as pd

    base = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, acc, cur = [], 0, 0
        for n in pdf["n_tokens"]:
            if cur == 0 or acc + n > token_budget:
                cur += 1
                acc = n
            else:
                acc += n
            pack_ids.append(cur)
        pdf["pack_id"] = pack_ids
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard int, pack_id int, n_tokens int")


def _norm(col="text"):
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def ngram_set(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """Distinct token n-grams of the normalized text, one row per gram
    (posexplode over a JVM slide — the dedup.shingles shape generalized
    to any width).  Documents shorter than ``n`` tokens emit no grams."""
    toks = F.split(_norm(), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(toks, i, n)))
    return (df.filter(F.size(toks) >= n)
            .select(id_col, F.explode(F.array_distinct(grams))
                    .alias("gram")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  min_fraction: float = 0.1) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing token
    ``n``-grams with an evaluation set (the PaLM/GPT-3-style n-gram
    collision rule every production training pipeline runs before a
    dump ships).

    Scale shape: the benchmark side is DISTINCT grams of the eval set —
    eval suites are MBs against a 100 TB corpus, so its gram set is
    broadcast and the corpus-side probe is a map-side hash join: the
    corpus is never shuffled, only the (rare) collision rows move into
    the per-doc count, and per-doc totals (``n_grams``) are computed as
    a column expression without exploding.  At a benchmark too large to
    broadcast, drop the hint and the same plan runs as a shuffle join.

    Returns (doc_id, n_grams, n_hits, contamination, is_contaminated):
    contamination = colliding / total distinct grams of the doc; docs
    shorter than ``n`` tokens have n_grams = 0 and are never flagged.
    """
    docs = spread_small_scan(docs)
    bench_grams = F.broadcast(
        ngram_set(benchmark, "bench_id", n).select("gram").distinct())
    doc_grams = ngram_set(docs, "doc_id", n)
    hits = (doc_grams.join(bench_grams, "gram", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    toks = F.split(_norm(), " ")
    totals = docs.select(
        "doc_id",
        F.when(F.size(toks) >= n,
               F.size(F.array_distinct(F.transform(
                   F.sequence(F.lit(1), F.size(toks) - n + 1),
                   lambda i: F.concat_ws(" ", F.slice(toks, i, n))))))
        .otherwise(F.lit(0)).alias("n_grams"))
    out = (totals.join(hits, "doc_id", "left")
           .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
           .withColumn("contamination",
                       F.when(F.col("n_grams") > 0,
                              F.round(F.col("n_hits")
                                      / F.col("n_grams"), 4))
                       .otherwise(F.lit(0.0)))
           .withColumn("is_contaminated",
                       F.col("contamination") >= min_fraction))
    return out.select("doc_id", "n_grams", "n_hits", "contamination",
                      "is_contaminated")


def vocabulary(docs: DataFrame, top_k: int = 200) -> DataFrame:
    """Corpus vocabulary: term frequency + document frequency, top-k by
    (tf DESC, token ASC) with a 1-based rank — the tokenizer-training /
    BPE-seed statistic every corpus pipeline computes.

    Scale shape: the tf side is canonical wordcount — one narrow explode
    feeding a hash aggregate with map-side partial combine; adding
    ``df`` (docs containing the token) makes it a two-phase distinct
    aggregate (one extra exchange over (token, doc_id) — the price of an
    exact df; swap in approx_count_distinct at 100 TB if 2% error is
    acceptable).  The top-k is ordered-limit (TakeOrdered — no global
    sort shuffle), and ranking happens on the k survivors only.
    """
    from pyspark.sql import Window

    docs = spread_small_scan(docs)
    tok = docs.select("doc_id",
                      F.explode(F.split(_norm(), " ")).alias("token"))
    vocab = (tok.groupBy("token")
             .agg(F.count("*").alias("tf"),
                  F.countDistinct("doc_id").alias("df")))
    top = vocab.orderBy(F.desc("tf"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document mean unigram log10-probability under the corpus's OWN
    unigram LM — the CCNet/Gopher-style fluency dial for corpus
    filtering, self-contained (no external LM): a document of rare
    tokens scores low, boilerplate scores high; cut both tails.

    Scale shape: the LM is the wordcount aggregate (map-side combine);
    the total-token normalizer joins in as a broadcast 1-row frame (no
    collect); scoring joins tokens to the LM on token — at 100 TB the LM
    is ~vocabulary-sized, so AQE picks broadcast vs shuffle join by its
    actual size (no hint) — and the per-doc mean is one partial+final
    aggregate.  Returns (doc_id, n_tokens, mean_logprob)."""
    docs = spread_small_scan(docs)
    tok = docs.select("doc_id",
                      F.explode(F.split(_norm(), " ")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("_total"))
    lm = (vocab.crossJoin(F.broadcast(total))
          .select("token",
                  F.log10(F.col("tf") / F.col("_total")).alias("logp")))
    return (tok.join(lm, "token")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg("logp"), 4).alias("mean_logprob")))


def bigram_logprob(docs: DataFrame, backoff: float = 0.4) -> DataFrame:
    """Per-document mean log10-probability under the corpus's OWN bigram
    LM with Stupid Backoff (Brants 2007) — the next fluency dial above
    ``unigram_logprob``: S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})
    when the bigram was seen, else ``backoff`` x c(w_i) / N; the first
    token scores c(w_1) / N.  Degenerate repetition scores HIGH here and
    normal prose in the middle band, so the filter cut is two-sided,
    same as the unigram dial.

    Scale shape: both count tables are wordcount aggregates (map-side
    combine); scoring joins each token position to the unigram LM and
    each bigram position LEFT to the bigram LM — joins keyed by gram,
    where a hot gram is a hot hash-join key against a 1-row count,
    never a pair explosion — and the per-doc mean is one partial+final
    aggregate on doc_id.  The predecessor token comes from the SAME ROW
    (posexplode carries the token array; prev = element_at(toks, p)),
    not a lag window — a window would sort the full token stream per
    subtree reference, and this plan references the position stream
    three times (plan-asserted window-free).  At 100 TB both LMs are
    ~vocabulary-sized; AQE picks broadcast vs shuffle join by actual
    size (no hint).

    Returns (doc_id, n_tokens, mean_logprob), one row per doc with >= 1
    token."""
    docs = spread_small_scan(docs)
    toks = F.split(_norm(), " ")
    pos = (docs.select("doc_id", toks.alias("_toks"))
           .select("doc_id", F.posexplode("_toks").alias("p", "token"),
                   F.col("_toks"))
           .select("doc_id", "token",
                   F.when(F.col("p") > 0,
                          F.element_at("_toks", F.col("p"))).alias("prev")))
    uni = pos.groupBy("token").agg(F.count("*").alias("uc"))
    total = uni.agg(F.sum("uc").alias("_total"))
    big = (pos.filter(F.col("prev").isNotNull())
           .groupBy("prev", "token").agg(F.count("*").alias("bc")))
    scored = (pos
              .join(uni, "token")
              .join(big, ["prev", "token"], "left")
              .crossJoin(F.broadcast(total))
              .join(uni.select(F.col("token").alias("prev"),
                               F.col("uc").alias("prev_uc")),
                    "prev", "left")
              .withColumn("logp", F.when(
                  F.col("prev").isNull(),
                  F.log10(F.col("uc") / F.col("_total")))
                  .when(F.col("bc").isNotNull(),
                        F.log10(F.col("bc") / F.col("prev_uc")))
                  .otherwise(F.log10(F.lit(backoff) * F.col("uc")
                                     / F.col("_total"))))
              )
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_tokens"),
                 F.round(F.avg("logp"), 4).alias("mean_logprob")))


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition battery, token-based: type-token ratio,
    the share of bigram occurrences taken by the single most frequent
    bigram, and the share of bigram occurrences that are duplicates
    (bigrams appearing more than once).  High dup/top fractions flag
    boilerplate and degenerate repetition; near-zero type-token ratio
    flags keyword stuffing.  Cut on all three in corpus filtering.

    Scale shape: the distinct/size signals are per-row array algebra
    (zero shuffle); the bigram counts are wordcount shape — explode,
    partial-aggregated groupBy(doc_id, gram), then one per-doc rollup
    on doc_id.  Both shuffles are keyed by doc_id(+gram): no skew axis
    beyond pathological single-doc size, and no cross-doc state.

    Returns (doc_id, n_tokens, type_token_ratio, top_bigram_frac,
    dup_bigram_frac); docs under 2 tokens report 0 bigram fractions."""
    docs = spread_small_scan(docs)
    toks = F.split(_norm(), " ")
    base = docs.select("doc_id", toks.alias("toks"))
    per_row = base.select(
        "doc_id", F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"))
    grams = base.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.slice("toks", i, 2)))).alias("gram"))
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    rollup = counts.groupBy("doc_id").agg(
        F.max("c").alias("_top"),
        F.sum("c").alias("_n_bi"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"))
    return (per_row.join(rollup, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                F.round(F.col("n_distinct")
                        / F.greatest("n_tokens", F.lit(1)), 4)
                .alias("type_token_ratio"),
                F.round(F.coalesce(F.col("_top") / F.col("_n_bi"),
                                   F.lit(0.0)), 4).alias("top_bigram_frac"),
                F.round(F.coalesce(F.col("_dup") / F.col("_n_bi"),
                                   F.lit(0.0)), 4).alias("dup_bigram_frac")))


# (name, pattern, replacement): patterns restricted to the Java-regex /
# RE2 common subset (no lookaround, ASCII \b) so the DuckDB oracle runs
# them verbatim; applied in order, counting on the CURRENT text so
# overlapping matches are never double-counted
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub before a corpus ships: replace emails, IPv4 addresses,
    and phone-shaped numbers with typed sentinels, reporting how many of
    each were redacted per document.  Sequential per-pattern passes
    (email first, so address domains never feed the later numeric
    patterns); counts are taken on the text as each pass sees it.

    Pure JVM regexp_count + regexp_replace over one narrow projection —
    map-only, zero shuffle, whole-stage codegen at any corpus size."""
    cur = F.col(text_col)
    cols = [F.col(c) for c in docs.columns if c != text_col]
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat))
                      .cast("int").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(*cols, *counts, cur.alias(text_col))


def _hashed_bigrams(docs: DataFrame, n_buckets: int) -> DataFrame:
    """Token-bigram occurrences hashed into ``n_buckets`` (md5-prefix
    mod, portable to any engine); one row per occurrence."""
    toks = F.split(_norm(), " ")
    grams = F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
    return (docs.filter(F.size(toks) >= 2)
            .select("doc_id", F.explode(grams).alias("gram"))
            .select("doc_id",
                    (F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
                     .cast("long") % n_buckets).alias("bucket")))


def dsir_logratio(raw: DataFrame, target: DataFrame,
                  n_buckets: int = 1024) -> DataFrame:
    """DSIR-style importance score (Xie et al. 2023, Data Selection via
    Importance Resampling): per-document log-likelihood ratio of a
    hashed-bigram bag under the TARGET corpus's feature distribution vs
    the RAW corpus's, add-1 smoothed:

        score(d) = sum_{g in d} [ ln p_target(bucket(g))
                                  - ln p_raw(bucket(g)) ]

    High scores mark raw documents that look like the target domain;
    resample raw proportionally to exp(score) (or top-k) to shift the
    mix.  Bigrams only (the paper uses uni+bi; one width keeps the
    oracle exact without changing the selection behavior on word-soup).

    Scale shape: both corpora stream through the wordcount-shaped bucket
    count (partial aggregated, B rows out); the two LMs full-outer-merge
    into ONE B-row frame that broadcasts onto the raw gram stream — so
    the only data-sized shuffles are the two bucket counts and the final
    per-doc sum, all keyed by bucket/doc_id.  At 10^12 docs raise
    ``n_buckets`` (10^5-10^6 rows still broadcasts in MBs).

    Returns (doc_id, n_grams, dsir_score); gram-less docs score 0."""
    raw = spread_small_scan(raw)
    rg = _hashed_bigrams(raw, n_buckets)
    tg = _hashed_bigrams(target, n_buckets)
    rc = rg.groupBy("bucket").agg(F.count("*").alias("c_raw"))
    tc = tg.groupBy("bucket").agg(F.count("*").alias("c_tgt"))
    totals = (rc.agg(F.sum("c_raw").alias("_tr"))
              .crossJoin(tc.agg(F.sum("c_tgt").alias("_tt"))))
    lm = (rc.join(tc, "bucket", "full_outer")
          .select("bucket", F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
                  F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"))
          .crossJoin(F.broadcast(totals))
          .select("bucket",
                  (F.log((F.col("c_tgt") + 1)
                         / (F.col("_tt") + n_buckets))
                   - F.log((F.col("c_raw") + 1)
                           / (F.col("_tr") + n_buckets))).alias("lr")))
    per_doc = (rg.join(F.broadcast(lm), "bucket")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_grams"),
                    F.sum("lr").alias("_score")))
    return (raw.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).cast("int")
                    .alias("n_grams"),
                    F.round(F.coalesce("_score", F.lit(0.0)), 4)
                    .alias("dsir_score")))


def corpus_filter(docs: DataFrame, min_tokens: int = 15,
                  lang: str = "en", max_dup_bigram_frac: float = 0.2,
                  min_type_token_ratio: float = 0.25,
                  min_stopword_ratio: float = 0.01) -> DataFrame:
    """The composed C4/Gopher-style document filter — the keep/drop
    decision a corpus actually ships with, with the FIRST failing rule
    recorded (fixed order, so the reason column is deterministic):

        1. too_short        n_tokens < min_tokens
        2. wrong_lang       language-ID != lang
        3. too_repetitive   dup_bigram_frac > max_dup_bigram_frac
        4. low_diversity    type_token_ratio < min_type_token_ratio
        5. no_stopwords     stopword_ratio < min_stopword_ratio  (Gopher:
                            real prose contains stop words)

    Composes quality_score + language_id + repetition_signals; all three
    signal frames are doc_id-keyed aggregates, so the composition is
    doc_id-partitioned joins with no new skew axis — the filter costs
    the sum of its signals, not a new pass over the text."""
    docs = spread_small_scan(docs)
    sig = (quality_score(docs)
           .select("doc_id", "n_tokens", "stopword_ratio")
           .join(language_id(docs).select("doc_id", "lang_pred"), "doc_id")
           .join(repetition_signals(docs)
                 .select("doc_id", "type_token_ratio", "dup_bigram_frac"),
                 "doc_id"))
    reason = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("lang_pred") != lang, "wrong_lang")
        .when(F.col("dup_bigram_frac") > max_dup_bigram_frac,
              "too_repetitive")
        .when(F.col("type_token_ratio") < min_type_token_ratio,
              "low_diversity")
        .when(F.col("stopword_ratio") < min_stopword_ratio, "no_stopwords")
        .otherwise("kept"))
    return sig.select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens"),
        "lang_pred", "dup_bigram_frac", "type_token_ratio",
        "stopword_ratio", (reason == "kept").alias("keep"),
        reason.alias("reason"))


def source_stats(docs: DataFrame) -> DataFrame:
    """Per-source curation rollup — the domain-level view web pipelines
    filter on (C4 blocklists domains; RefinedWeb and Dolma score and
    cap them): document count, token volume, mean quality, language
    spread, and the within-source exact-duplicate count (docs minus
    distinct normalized fingerprints).

    Returns (source, n_docs, total_tokens, mean_quality, n_langs,
    dup_docs), one row per source.

    Scale shape: one map-only pass computes per-doc signals (token
    count, 4-dec quality, md5 fingerprint — all JVM column algebra),
    then ONE hash aggregate keyed by source with map-side partial
    aggregation; count_distinct(fingerprint) expands to a two-phase
    partial-distinct aggregate, never a per-source row collect.  The
    source key is domain-cardinality (millions at web scale, each
    group a hot COUNT), so no skew salting is needed — a viral domain
    is a big count, not a big shuffle partition of raw text.  Quality
    is computed inline via the shared _quality_exprs (NOT a join back
    on doc_id), so the whole operator is scan -> project -> one
    aggregate.  The scan is spread-guarded (weight 1): a one-file
    corpus would otherwise tokenize serially at any core count — the
    curate/linking scaling root cause."""
    docs = spread_small_scan(docs)
    *_rest, score = _quality_exprs()
    base = docs.select("source", "lang",
                       F.size(_tokens(F.col("text"))).alias("_nt"),
                       F.md5(_norm()).alias("_fp"),
                       score.alias("quality"))
    return (base
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("_nt").cast("long").alias("total_tokens"),
                 F.round(F.avg("quality"), 4).alias("mean_quality"),
                 F.count_distinct("lang").cast("long").alias("n_langs"),
                 (F.count("*") - F.count_distinct("_fp")).cast("long")
                 .alias("dup_docs")))


def chunk_windows(docs: DataFrame, width: int = 64,
                  stride: int = 48) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the converse of
    ``pack_documents``: split each document into training-sequence
    chunks of ``width`` whitespace tokens every ``stride`` tokens
    (overlap = width - stride), the standard pre-tokenization step for
    context-window-bounded training and for embedding long documents.

    One row per (doc, window start): (doc_id, chunk_id, chunk,
    n_tokens); the final chunk is short (n_tokens < width) rather than
    padded, and an empty/whitespace document yields one empty chunk
    (chunk_id 0) so no document silently vanishes.

    Scale shape: map-only — tokenize, build the per-document chunk
    structs inside ``transform`` over the start sequence, explode.
    Zero shuffle at ANY corpus size (plan-asserted exchange-free); each
    exploded row carries only its own <= width tokens, never the whole
    document, so memory per row is bounded by the chunk, and the
    overlap factor bounds output volume at width/stride x input.
    """
    if stride <= 0 or width <= 0:
        raise ValueError("width and stride must be positive")
    # parquet text compresses ~10x and scans split by BYTES: a small-file
    # corpus would tokenize+explode near-serially at any core count (the
    # round-7 10x rehearsal measured 19 s for a 2-split 50k-doc scan);
    # the probe is identity for wide scans and tiny corpora
    docs = spread_small_scan(docs)
    toks = _tokens(F.col("text"))
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / F.lit(stride)).cast("long").alias("chunk_id"),
            F.slice(toks, s + 1, width).alias("toks")))
    return (docs
            .select("doc_id", F.explode(chunks).alias("_c"))
            .select("doc_id",
                    F.col("_c.chunk_id").alias("chunk_id"),
                    F.array_join("_c.toks", " ").alias("chunk"),
                    F.size("_c.toks").alias("n_tokens")))


def perplexity_buckets(docs: DataFrame,
                       probs: tuple = (0.3333, 0.6667)) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): label every
    document head / middle / tail by which corpus-wide fluency third it
    falls in under the corpus's own Stupid-Backoff bigram LM
    (``bigram_logprob``) — the signature CCNet curation step (keep the
    head, inspect the middle, drop the tail).

    Perplexity is monotone in -mean_logprob, so bucketing on
    ``mean_logprob`` directly avoids the exponentiation: tail = lowest
    mean log-prob third (highest perplexity), head = highest.  Same
    no-global-sort shape as ``sampling.curriculum_buckets``: the score
    is 4-dec rounded so ONE exact-percentile aggregate has bounded
    state, the 1-row threshold frame broadcasts, and the label is a
    map-only CASE — the LM build (two wordcount aggregates) is the only
    wide work.
    """
    if len(probs) != 2:
        raise ValueError("probs must be the two head/tail cutpoints")
    lp = bigram_logprob(docs).select("doc_id", "mean_logprob")
    pcts = ", ".join(repr(float(p)) for p in probs)
    th = lp.agg(*[
        F.round(F.expr(f"percentile(mean_logprob, array({pcts}))")[i], 4)
        .alias(f"_t{i}") for i in range(2)])
    bucket = (F.when(F.col("mean_logprob") <= F.col("_t0"), F.lit("tail"))
              .when(F.col("mean_logprob") <= F.col("_t1"), F.lit("middle"))
              .otherwise(F.lit("head")))
    return (lp.crossJoin(F.broadcast(th))
            .select("doc_id", "mean_logprob", bucket.alias("ppl_bucket")))
