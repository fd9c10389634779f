"""Entity linking of string mentions to QIDs (north_star stage:
"broadcast dictionary join for the head distribution plus a batched
mention-detect + link-score pandas UDF for the tail").

Spark-first decomposition:

* **dictionary build** — per-document surface form (the first ``width``
  tokens of the text — the title line of the versioned-doc contract)
  keyed to its Q-id (``Q<doc_id + 10000>``, the established doc↔entity
  mapping of the derived corpus; hierarchy_edges/closure use the same).
  Ambiguous surface forms (several docs sharing a title) resolve to the
  MIN qid — a deterministic canonical, the ON-CONFLICT rule used
  everywhere else in this engine.
* **mention detection** — distinct sliding ``width``-grams per document,
  JVM-side (same slide/explode shape as dedup.shingles — a narrow map).
* **head path** — the top ``head_k`` dictionary labels by document
  frequency join mentions EXACTLY via a broadcast hash join.  These are
  precisely the hot surface forms ("Q5-class" in the north_star's
  vocabulary): broadcasting removes the skew axis entirely — a hot
  mention never becomes a hot shuffle key because the dictionary moves
  to the data, not the data to the dictionary.
* **tail path** — mentions that miss the head dictionary block against
  the tail dictionary on a shared CONSECUTIVE TOKEN BIGRAM (each
  3-token surface form contributes its two bigrams; a candidate must
  share one).  The blocking join carries NO broadcast hint: the tail
  dictionary is ~one label per distinct title, i.e. O(corpus), so a
  forced broadcast would OOM at scale — it is a plain equi-join on
  ``_bk`` and AQE promotes it to a broadcast join at runtime whenever
  the dictionary side is actually small.  Blocking is the cost/recall
  dial of every linking system: bigram blocking finds exactly the pairs
  sharing two adjacent tokens (which at threshold 0.5 is almost the
  full match set — only token-1+3 non-adjacent shares are excluded) at
  ~1/vocab the candidate volume of first-token blocking (measured 50x
  at sf0.1: 16M -> ~0.3M scored pairs).  Candidates are scored by
  token-set Jaccard; two scorers exist and BOTH were measured at sf0.1
  (~5M candidates, best-of-2, round 5):

  ========================  ======  =========================
  scorer                      wall  notes
  ========================  ======  =========================
  'pandas' (DEFAULT)        ~16 s   Arrow-batched set ops
  'jvm'                     ~24 s   array_intersect/union
  jvm, contains-reformul.   ~24 s   no better
  ========================  ======  =========================

  The JVM expression evaluates at ~1.5 us/candidate regardless of
  formulation (per-row array allocations inside codegen); the Arrow
  batch transfers + C-speed Python set ops are ~4x cheaper per
  candidate at this row shape, and the UDF is evaluated exactly once
  per row (ExtractPythonUDFs), so the measured winner is the default —
  'jvm' remains for clusters that must keep Python entirely out of the
  plan (plan-asserted in tests either way), and the pandas scorer is
  ALSO the model seam: swap the Jaccard for a cross-encoder on clusters
  that ship one; the blocking join and top-1 aggregate stay as-is.
  Candidates at/above ``threshold`` keep their best label (score DESC,
  qid ASC — deterministic top-1).  The oracle applies the identical
  bigram restriction and hot-key cap.

Every step is deterministic and engine-portable — the driver oracle
(`kg_link_mentions`) re-derives dictionary, mentions, head/tail split,
Jaccard scores, and the top-1 choice in DuckDB SQL from scratch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

DEFAULT_WIDTH = 3
DEFAULT_HEAD_K = 50
DEFAULT_THRESHOLD = 0.5
# Hot-bigram blocking-key cap, ON by default: a real near-match shares
# its rarer bigram, so dropping keys with > this many tail-dictionary
# labels bounds candidate volume at sum(df_i^2) <= n_keys * CAP^2 rather
# than the unguarded quadratic.  Pass max_block_df=None to opt out.
DEFAULT_MAX_BLOCK_DF = 500


def _tokens(col):
    return F.split(F.lower(F.trim(col)), r"\s+")


def label_dictionary(docs: DataFrame, width: int = DEFAULT_WIDTH) -> DataFrame:
    """(label, qid_num, n_docs): surface form -> canonical entity."""
    toks = _tokens(F.col("text"))
    return (docs
            .select((F.col("doc_id") + 10000).alias("qid_num"),
                    F.concat_ws(" ", F.slice(toks, 1, width)).alias("label"))
            .filter(F.size(_tokens(F.col("text"))) >= width)
            .groupBy("label")
            .agg(F.min("qid_num").alias("qid_num"),
                 F.count("*").alias("n_docs")))


def detect_mentions(docs: DataFrame, width: int = DEFAULT_WIDTH) -> DataFrame:
    """Distinct sliding width-gram mentions per doc (JVM explode)."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - width + 1)
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(toks, i, width)))
    return (docs.filter(n >= width)
            .select("doc_id",
                    F.explode(F.array_distinct(grams)).alias("mention")))


# DataType instance, not a DDL string: the decorator runs at import time,
# and DDL parsing needs an active SparkSession
@pandas_udf(DoubleType())
def _jaccard_score(mention: pd.Series, label: pd.Series) -> pd.Series:
    """Token-set Jaccard, Arrow-batched (the link-score seam — replace
    with a model scorer on clusters that ship one)."""
    out = []
    for m, lab in zip(mention, label):
        a, b = set(str(m).split()), set(str(lab).split())
        union = a | b
        out.append(round(len(a & b) / len(union), 4) if union else 0.0)
    return pd.Series(out, dtype="float64")


def _bigrams(col):
    t = F.split(F.col(col), " ")
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    return F.transform(idx, lambda i: F.concat_ws(
        " ", F.element_at(t, i), F.element_at(t, i + 1)))


def tail_candidates(rest: DataFrame, tail_dict: DataFrame,
                    max_block_df: int | None = DEFAULT_MAX_BLOCK_DF
                    ) -> DataFrame:
    """Blocked (doc_id, mention, label, qid_num, _mtoks, _ltoks)
    candidate pairs: mention and tail label share a consecutive token
    bigram whose tail-dictionary document frequency is <=
    ``max_block_df``.  Exposed so tests can assert candidate volume
    stays sub-quadratic on adversarial corpora.

    Two deliberate cost choices, both measured at sf0.1 (BENCH notes):

    * NO distinct.  Two consecutive bigrams can only both match when
      every token matches in order — i.e. mention == label — so the
      duplicates are identical rows that the downstream top-1 aggregate
      dedupes deterministically; a distinct here was a pure extra
      shuffle of the widest intermediate (measured ~40% of tail cost).
    * Token arrays (``_mtoks``/``_ltoks``) are split ONCE per mention /
      per label BEFORE the explode-join and carried through it, so the
      JVM scorer never runs a per-candidate regex split (candidates
      outnumber mentions ~20x).

    The blocking join carries no broadcast hint — tail_dict is O(corpus)
    (~one label per distinct title), so a forced broadcast OOMs at scale;
    AQE promotes the join to broadcast at runtime when the side is small."""
    tailb = (tail_dict
             .select("label", "qid_num",
                     F.split(F.col("label"), " ").alias("_ltoks"))
             .withColumn("_bk", F.explode(_bigrams("label"))))
    if max_block_df is not None:
        keep = (tailb.groupBy("_bk").count()
                .filter(F.col("count") <= max_block_df).select("_bk"))
        tailb = tailb.join(keep, "_bk", "left_semi")
    # ``rest`` may be per-(doc, mention) (tests / candidate-volume probes)
    # or mention-distinct (link_mentions' score-once path); carry doc_id
    # only when the caller has it
    id_cols = [c for c in ("doc_id",) if c in rest.columns]
    return (rest
            .select(*id_cols, "mention",
                    F.split(F.col("mention"), " ").alias("_mtoks"))
            .withColumn("_bk", F.explode(_bigrams("mention")))
            .join(tailb, "_bk")
            .select(*id_cols, "mention", "label", "qid_num",
                    "_mtoks", "_ltoks"))


def link_mentions(docs: DataFrame, width: int = DEFAULT_WIDTH,
                  head_k: int = DEFAULT_HEAD_K,
                  threshold: float = DEFAULT_THRESHOLD,
                  max_block_df: int | None = DEFAULT_MAX_BLOCK_DF,
                  scorer: str = "pandas") -> DataFrame:
    """(doc_id, mention, qid, score, link_path) — head exact links at
    score 1.0 plus tail fuzzy links at the best Jaccard >= threshold.

    ``max_block_df``: at corpus scale the candidate volume is
    sum_over_bigrams |mentions(bg)| x |tail_labels(bg)| — a hot blocking
    bigram ("of the") is the quadratic trap, same shape as hot shingles
    in dedup.  The cap drops blocking keys whose TAIL-DICTIONARY side
    exceeds it (the dedup.rare_shingle_candidates dial): a real
    near-match shares its rarer bigram anyway, and the head path already
    owns the genuinely hot surface forms.  ON by default
    (``DEFAULT_MAX_BLOCK_DF``); ``None`` is the explicit opt-out for
    corpora known to have no hot blocking keys.

    ``scorer``: ``'pandas'`` (default — measured 1.5x faster at sf0.1,
    module docstring) scores through the Arrow-batched ``_jaccard_score``
    UDF, which doubles as the swap-in seam for model scorers;  ``'jvm'``
    computes the identical scores with ``array_intersect`` /
    ``array_union`` over the pre-split token arrays inside whole-stage
    codegen — zero Python in the plan (plan-asserted) for clusters that
    require it."""
    from widiff_spark.spread import spread_small_scan

    # one spread decision for the whole linking composition: the doc
    # scan feeds THREE CPU-dense passes (dictionary build, width-gram
    # mention explode, and through them the blocked scoring join), so a
    # small-file corpus — one task per scan no matter the core count —
    # serializes the job end-to-end.  Round-7 measured exactly that:
    # the pre-spread 2-vs-8-pinned-core gate ran 125.7 s vs 141.7 s
    # (efficiency 0.22, BENCH/BASELINE.md round-7) on a 60k-doc corpus
    # stored as one ~7 MB parquet file.  Weight 8 ≈ the gram fan-out
    # per input byte; a 100 TB scan passes through untouched (split
    # tier), as does an already-wide derived frame.
    docs = spread_small_scan(docs, weight=8)
    dic = label_dictionary(docs, width)
    head = dic.orderBy(F.desc("n_docs"), F.asc("label")).limit(head_k)
    tail_dict = dic.join(head.select("label"), "label", "left_anti")
    mentions = detect_mentions(docs, width)

    head_links = (mentions
                  .join(F.broadcast(head),
                        mentions["mention"] == head["label"])
                  .select("doc_id", "mention", "qid_num",
                          F.lit(1.0).alias("score"),
                          F.lit("head").alias("link_path")))

    rest = mentions.join(F.broadcast(head),
                         mentions["mention"] == head["label"], "left_anti")
    # Score per DISTINCT mention, not per (doc, mention): the candidate
    # label set, the Jaccard score and therefore the top-1 choice depend
    # only on the mention text (blocking keys derive from the mention; the
    # tail dictionary is doc-independent), so every doc sharing a surface
    # form re-scored the identical candidates.  Dedup first, score once,
    # fan the winning (qid, score) back to docs with one equi-join —
    # candidates shrink by the mention-sharing factor before the Python
    # scorer ever runs (guide §2.3: aggregate before you shuffle).
    rest_m = rest.select("mention").distinct()
    blocked = tail_candidates(rest_m, tail_dict, max_block_df)
    if scorer == "jvm":
        jac = F.round(
            F.size(F.array_intersect("_mtoks", "_ltoks")).cast("double")
            / F.size(F.array_union("_mtoks", "_ltoks")), 4)
        cand = blocked.withColumn("score", jac)
    else:
        cand = blocked.withColumn("score",
                                  _jaccard_score("mention", "label"))
    cand = cand.drop("_mtoks", "_ltoks").filter(F.col("score") >= threshold)
    # deterministic top-1 (score DESC, qid ASC) as max(struct(score, -qid))
    # — ONE hash aggregate with map-side partial combine instead of a
    # sort-based row_number window (measured 17.9 -> 13.0 s at sf0.1;
    # at 100 TB the partial combine also collapses candidates before the
    # shuffle, which a window's full sort cannot)
    best = (cand.groupBy("mention")
            .agg(F.max(F.struct(
                F.col("score"),
                (-F.col("qid_num")).alias("_nq"))).alias("_b"))
            .select("mention",
                    (-F.col("_b._nq")).alias("qid_num"),
                    F.col("_b.score").alias("score")))
    tail_links = (rest.select("doc_id", "mention")
                  .join(best, "mention")
                  .select("doc_id", "mention", "qid_num", "score",
                          F.lit("tail").alias("link_path")))

    return (head_links.unionByName(tail_links)
            .select("doc_id", "mention",
                    F.concat(F.lit("Q"), F.col("qid_num").cast("string"))
                    .alias("qid"),
                    "score", "link_path"))
