"""End-to-end corpus curation: assemble a training dump.

The composition every production pipeline runs before data ships, as one
operator: quality filter -> near-duplicate keep-list -> benchmark
decontamination -> temperature-flattened resampling.  Each input document
comes back with its FATE — which stage dropped it (and for the filter,
which rule) or 'kept' — so the dump is auditable row-by-row.

Scale shape: this module adds no new text pass and no new shuffle axis.
Every gate is the underlying operator's plan (see textops.corpus_filter,
dedup.duplicate_components, textops.decontaminate,
sampling.temperature_weights/sample_weighted for their individual scale
arguments); the composition itself is doc_id-keyed equi-joins of per-doc
verdict frames, and the resampling stage is a broadcast weights join +
map-only hash-threshold filter over the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from widiff_spark import dedup, sampling, textops


def curate_corpus(docs: DataFrame, benchmark: DataFrame,
                  target_rows: int | None = None, alpha: float = 0.5,
                  min_jaccard: float = 0.5,
                  persist_verdicts: bool = True) -> DataFrame:
    """Run the four curation gates in pipeline order and label every
    document: 'filtered:<rule>' | 'duplicate' | 'contaminated' |
    'resampled_out' | 'kept'.  The mixture weights are computed over the
    SURVIVORS of the first three gates (resampling a cleaned corpus, not
    the raw one), with ``target_rows`` the approximate kept-size.

    ``persist_verdicts`` (default on) caches the per-doc verdict frame
    (MEMORY_AND_DISK) before the resampling tail.  The tail references
    that subtree FOUR times — the final fate join, the sampler scan, and
    the mixture-stats aggregate twice — and Spark re-executes a
    multiply-referenced subtree per reference, so without the cache the
    gram-explode decontamination and the quality cascade run 4x (measured
    410 s -> see BENCH/BASELINE.md round-6 stage attribution).  The
    frame is narrow — doc_id + three flags + a short reason, orders of
    magnitude smaller than the text corpus — which is exactly the shape
    one persists (or materializes to a verdict table) at 100 TB.

    The cached blocks live until released: long-lived sessions calling
    this repeatedly should release each result's cache when done with it
    via the ``widiff_verdict_cache`` attribute on the returned frame —
    ``result.widiff_verdict_cache.unpersist()`` — rather than nuking the
    whole session cache with ``spark.catalog.clearCache()`` (ADVICE r6).
    With ``persist_verdicts=False`` the attribute is None and there is
    nothing to release.

    Returns (doc_id, lang, source, fate, kept)."""
    from widiff_spark.spread import spread_small_scan

    # one spread decision for the whole composition: curate runs FOUR
    # CPU-dense passes over the same input (quality cascade, shingle
    # minhash, gram decontamination, plus the fate join), so the input
    # earns the shingle-grade weight even though each individual textops
    # gate probes at weight 1 — and spreading here means the gates'
    # own probes see the already-widened frame and stay identity (the
    # round-6 curate scaling root cause is fixed once, at the top)
    docs = spread_small_scan(docs, weight=16)
    filt = textops.corpus_filter(docs)
    comp = dedup.duplicate_components(docs, min_jaccard=min_jaccard)
    cont = textops.decontaminate(docs, benchmark)
    base = (docs.select("doc_id", "lang", "source")
            .join(filt.select("doc_id", "keep", "reason"), "doc_id")
            .join(comp.select("doc_id", "is_canonical"), "doc_id")
            .join(cont.select("doc_id", "is_contaminated"), "doc_id"))
    if persist_verdicts:
        from pyspark.storagelevel import StorageLevel
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    surv = base.filter(F.col("keep") & F.col("is_canonical")
                       & ~F.col("is_contaminated"))
    weights = sampling.temperature_weights(surv, "source", alpha=alpha,
                                           target_rows=target_rows)
    sampled = (sampling.sample_weighted(surv, weights, "source")
               .select("doc_id", F.lit(True).alias("_sampled")))
    fate = (F.when(~F.col("keep"),
                   F.concat(F.lit("filtered:"), F.col("reason")))
            .when(~F.col("is_canonical"), F.lit("duplicate"))
            .when(F.col("is_contaminated"), F.lit("contaminated"))
            .when(F.col("_sampled").isNull(), F.lit("resampled_out"))
            .otherwise(F.lit("kept")))
    out = (base.join(sampled, "doc_id", "left")
           .withColumn("fate", fate)
           .select("doc_id", "lang", "source", "fate",
                   (F.col("fate") == "kept").alias("kept")))
    # expose the persisted handle so callers can release the cache
    # without clearing the whole session cache (see docstring)
    out.widiff_verdict_cache = base if persist_verdicts else None
    return out


def verbalize_entities(labels: DataFrame) -> DataFrame:
    """The KG -> LM-training-data bridge: render the entity label dim
    (extractors.entity_labels output: qid, numeric_id, label, alias,
    description) as a documents-shaped table — one verbalized sentence
    per entity, ready for the curation suite (corpus_filter, dedup,
    mixing) and for pretraining dumps that inject structured knowledge
    as text (the KELM/TekGen recipe).

        "<label> is <description>, also known as <alias>."

    with the description/alias clauses dropped when empty.  Pure narrow
    projection over the dim — map-only, zero shuffle beyond whatever
    produced the dim itself.

    Returns (doc_id, text, lang, source, n_chars) — the documents
    schema, doc_id = the entity's numeric id."""
    desc = F.when(F.length("description") > 0,
                  F.concat(F.lit(" is "), F.col("description"))) \
        .otherwise(F.lit(""))
    alias = F.when(F.length("alias") > 0,
                   F.concat(F.lit(", also known as "), F.col("alias"))) \
        .otherwise(F.lit(""))
    text = F.concat(F.col("label"), desc, alias, F.lit("."))
    return (labels.filter(F.length("label") > 0)
            .select(F.col("numeric_id").cast("long").alias("doc_id"),
                    text.alias("text"),
                    F.lit("en").alias("lang"),
                    F.col("repo").alias("source"),
                    F.length(text).cast("long").alias("n_chars")))
