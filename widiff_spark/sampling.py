"""Deterministic sampling operators for training-data pipelines.

Production corpus assembly needs samples that are (a) reproducible across
runs and engines — no RNG state, no partition-order dependence — and (b)
cheap at 100 TB.  Both operators here derive the randomness from md5 over
the row's stable key, so the SAME rows are selected on any cluster size,
any partitioning, and by the DuckDB oracle re-deriving the hash:

* ``hash_sample`` — Bernoulli sampling by hash threshold: keep a row iff
  the first 8 hex chars of ``md5(salt || key)`` sort below the fraction
  threshold.  A narrow map over the scan — no shuffle at all; different
  salts give independent samples (train/validation splits that provably
  never overlap come from partitioning [0,1) into disjoint hash ranges).
* ``stratified_sample`` — exact per-stratum quotas: rank rows inside each
  stratum by ``(md5(key), key)`` and keep the first n.  One window
  shuffle on the stratum key; the md5 order is a stable pseudo-random
  permutation, so the quota is a uniform-without-replacement draw.

`df.sample()` is none of this: it is partition-order-dependent and
unreproducible under AQE/repartition, which is why it appears nowhere in
this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HEX_SPACE = 16 ** 8  # the 8-hex-digit key space the threshold lives in


def _hash_key(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"),
                       F.col(key_col).cast("string"))), 1, 8)


def fraction_threshold(fraction: float) -> str:
    """8-hex-digit threshold string: hex-string comparison is identical to
    numeric comparison at fixed width, so both Spark and the SQL oracle
    compare strings and never parse hex into ints.

    At fraction 1.0 the threshold is the sentinel ``'g'`` — one past the
    hex alphabet, so EVERY md5 prefix (including ``'ffffffff'``) sorts
    strictly below it.  Clamping to ``'ffffffff'`` instead would silently
    drop the ~2^-32 of rows whose prefix is exactly the max, breaking the
    exhaustiveness promise of full-coverage splits."""
    if not 0.0 <= fraction <= 1.0 + 1e-9:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    t = int(fraction * HEX_SPACE)
    if t >= HEX_SPACE or abs(fraction - 1.0) <= 1e-9:
        return "g"
    return format(t, "08x")


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: ``md5(salt || key)[:8] <
    threshold(fraction)``.  Map-only (no shuffle, no RNG); the same rows
    survive on every run, engine, and partitioning."""
    return df.filter(_hash_key(key_col, salt) < F.lit(
        fraction_threshold(fraction)))


def hash_split(df: DataFrame, fractions: dict[str, float],
               key_col: str = "doc_id", salt: str = "") -> dict[str, DataFrame]:
    """Disjoint deterministic splits (e.g. {'train': .98, 'val': .01,
    'test': .01}): consecutive hash ranges partition the key space, so the
    splits are provably non-overlapping and exhaustive up to sum(fractions).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out, lo = {}, 0.0
    h = _hash_key(key_col, salt)
    for name, frac in fractions.items():
        lo_t, hi_t = fraction_threshold(lo), fraction_threshold(lo + frac)
        out[name] = df.filter((h >= F.lit(lo_t)) & (h < F.lit(hi_t)))
        lo += frac
    return out


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      key_col: str = "doc_id") -> DataFrame:
    """Exact-quota stratified sample: first ``n_per_stratum`` rows of each
    stratum under the stable pseudo-random (md5(key), key) order.  One
    window shuffle; strata smaller than the quota are kept whole."""
    w = Window.partitionBy(strata_col).orderBy(_hash_key(key_col, ""),
                                               F.col(key_col))
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n_per_stratum).drop("_rk"))


def temperature_weights(df: DataFrame, group_col: str = "source",
                        alpha: float = 0.5,
                        target_rows: int | None = None,
                        size_col: str | None = None) -> DataFrame:
    """Temperature-flattened mixture weights per group — the data-mixing
    step of corpus assembly (alpha=1 keeps natural proportions, alpha=0
    equalizes groups; 0.3-0.7 is the usual multilingual flattening):

        p_g = n_g^alpha / sum_g n_g^alpha
        keep_fraction_g = min(1, target_rows * p_g / n_g)

    ``size_col`` switches the mixture unit from documents to that
    column's per-group SUM (pass a token-count column for the
    token-weighted mix real assemblies use — a group of few huge docs
    then weighs as its tokens, not its row count; ``target_rows`` is in
    the same unit).  One aggregate + a broadcast 1-row normalizer (no
    collect).  Returns (group, n_docs, weight, keep_fraction) — feed to
    ``sample_weighted`` to materialize the resampled corpus."""
    unit = F.sum(size_col) if size_col is not None else F.count("*")
    stats = df.groupBy(group_col).agg(unit.alias("n_docs"))
    norm = stats.agg(F.sum(F.pow("n_docs", F.lit(alpha))).alias("_z"),
                     F.sum("n_docs").alias("_total"))
    n_target = F.lit(target_rows) if target_rows is not None \
        else F.col("_total")
    w = F.pow("n_docs", F.lit(alpha)) / F.col("_z")
    return (stats.crossJoin(F.broadcast(norm))
            .select(group_col, "n_docs",
                    F.round(w, 6).alias("weight"),
                    F.round(F.least(F.lit(1.0),
                                    n_target * w / F.col("n_docs")), 6)
                    .alias("keep_fraction")))


def sample_weighted(df: DataFrame, weights: DataFrame,
                    group_col: str = "source",
                    key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Apply per-group keep fractions (``temperature_weights`` output)
    with the deterministic md5-threshold rule: keep a row iff its hash
    prefix sorts below the group's fraction threshold, computed JVM-side
    from the joined ``keep_fraction`` column (per-group thresholds are
    data-dependent, so the hex threshold is formatted in-plan rather
    than precomputed driver-side).  Fractions >= 1 keep every row via
    the 'g' sentinel (sorts above any hex digit).  Broadcast weights
    join + map-only filter — no shuffle of the corpus.  The join is
    INNER by design: the weights table defines the mix, so a group
    absent from it (weights computed on a filtered survivor set, say)
    contributes nothing to the sample."""
    thr = F.when(F.col("keep_fraction") >= 1.0, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(F.floor(F.col("keep_fraction")
                                     * F.lit(float(HEX_SPACE)))
                             .cast("bigint")), 8, "0")))
    return (df.join(F.broadcast(weights.select(group_col, "keep_fraction")),
                    group_col)
            .filter(_hash_key(key_col, salt) < thr)
            .drop("keep_fraction"))


def shard_by_tokens(docs: DataFrame, n_shards: int = 16,
                    exact: bool = False) -> DataFrame:
    """Assign documents to ``n_shards`` output shards with balanced
    token totals — the dump-writing step after curation (training jobs
    read shards in parallel; a token-skewed shard is the straggler).

    Two modes:

    * default (hash): shard = md5(doc_id) mod n — map-only, zero
      shuffle, balanced in expectation (token sums over millions of
      docs concentrate tightly).  The 100-TB path.
    * ``exact=True``: serpentine LPT — rank docs by (n_tokens DESC,
      doc_id) and deal them boustrophedon across shards, which bounds
      any shard's excess by one document.  The global rank is a single
      unpartitioned sort-window, so this mode is for bounded inputs
      (dims, per-partition finishing passes), NOT the full corpus; the
      hash mode exists precisely so nothing at scale needs it.

    Returns (doc_id, n_tokens, shard); deterministic in both modes."""
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    base = docs.select("doc_id", toks.alias("n_tokens"))
    if not exact:
        shard = (F.conv(F.substring(F.md5(
            F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long") % n_shards)
        return base.withColumn("shard", shard.cast("int"))
    w = Window.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    r = F.row_number().over(w) - 1
    fwd = r % n_shards
    shard = F.when(F.floor(r / n_shards) % 2 == 0, fwd) \
        .otherwise(n_shards - 1 - fwd)
    return base.withColumn("shard", shard.cast("int"))


def curriculum_buckets(docs: DataFrame,
                       probs: tuple = (0.25, 0.5, 0.75)) -> DataFrame:
    """Quality-quantile curriculum assignment: bucket every document by
    which corpus-wide quality quartile it falls in (bucket 1 = lowest
    ... len(probs)+1 = highest) — the ordering key for curriculum
    training schedules and the quantile gate for "keep the top-X%"
    curation, computed WITHOUT a global sort.

    ntile() — the obvious formulation — is a window over the whole
    corpus: one global Sort + a single-partition Exchange, the
    canonical 100 TB anti-pattern.  Instead: one exact-percentile
    aggregate reduces the corpus to len(probs) threshold doubles
    (quality is rounded to 4 decimals, so the aggregate state is a
    count-map over <= ~10^4 distinct keys — bounded regardless of row
    count), the 1-row threshold frame is broadcast, and the bucket
    label is a map-only CASE chain.  Total cost: one scan, one
    scalar-sized reduce, zero data shuffles.

    Returns (doc_id, quality, bucket), one row per document.  The doc
    scan is spread-guarded (weight 1) — it is tokenized twice (once
    into the percentile aggregate, once for the output projection), so
    a one-file corpus would otherwise run both passes serially."""
    from widiff_spark.spread import spread_small_scan
    from widiff_spark.textops import _quality_exprs
    docs = spread_small_scan(docs)
    *_rest, score = _quality_exprs()
    q = docs.select("doc_id", score.alias("quality"))
    pcts = ", ".join(str(p) for p in probs)
    th = q.agg(*[
        F.round(F.expr(f"percentile(quality, array({pcts}))")[i], 4)
        .alias(f"_t{i}") for i in range(len(probs))])
    bucket = F.lit(len(probs) + 1)
    for i in range(len(probs) - 1, -1, -1):
        bucket = F.when(F.col("quality") <= F.col(f"_t{i}"),
                        F.lit(i + 1)).otherwise(bucket)
    return (q.crossJoin(F.broadcast(th))
            .select("doc_id", "quality", bucket.cast("int").alias("bucket")))


def domain_cap(docs: DataFrame, cap: int = 200) -> DataFrame:
    """Per-source document cap: keep at most ``cap`` documents per
    source, preferring the highest quality (ties -> lowest doc_id) —
    the domain-cap step of RefinedWeb / Dolma-style curation (one spam
    domain must not dominate a corpus).

    Exactly equivalent to ``row_number() OVER (PARTITION BY source
    ORDER BY quality DESC, doc_id) <= cap``, but WITHOUT the per-domain
    global sort that window formulation costs (the hottest domain's
    whole row set through one task).  Scale shape:

    1. per-(source, quality) histogram — the quality score is 4-dec
       rounded, so the histogram is bounded state (one hash aggregate);
    2. one descending `aggregate` scan over each source's histogram
       array finds the threshold quality and how many tie rows to keep
       at it — the per-source array is bounded by the score grid, never
       by document count;
    3. thresholds broadcast back: rows strictly above keep (map-only);
       rows AT the threshold resolve by a SALTED two-phase min-k (keep
       the ``keep_at`` smallest doc_ids): phase 1 ranks within
       (source, salt) — a hot tie set splits ``salt_k`` ways — and
       keeps each salt's ``keep_at`` smallest; phase 2 ranks the
       surviving <= salt_k * keep_at rows per source (bounded state,
       keep_at <= cap) and keeps the global ``keep_at``.  The global
       minimum set is contained in the per-salt minima, so the result
       is identical to one row_number over the whole tie set — without
       ever sorting a hot (source, threshold-quality) set in one task
       (the r7 verdict's residual skew hazard: the quality grid has few
       mass points, so a boilerplate spam domain concentrates millions
       of rows at the single threshold level).
    """
    from widiff_spark.spread import spread_small_scan
    from widiff_spark.textops import _quality_exprs
    # the quality projection tokenizes the corpus twice (histogram pass +
    # keep-filter pass): a small-file scan would run both near-serially
    # (round-7 10x rehearsal: 36 s for a 2-split 50k-doc scan)
    docs = spread_small_scan(docs, weight=2.0)
    *_rest, score = _quality_exprs()
    q = docs.select("doc_id", "source", score.alias("quality"))
    hist = q.groupBy("source", "quality").agg(F.count("*").alias("n"))
    arr = (hist.groupBy("source")
           .agg(F.sort_array(F.collect_list(F.struct("quality", "n")),
                             asc=False).alias("_h")))
    acc0 = F.struct(F.lit(0).cast("long").alias("cum"),
                    F.lit(None).cast("double").alias("thr"),
                    F.lit(0).cast("long").alias("keep_at"))

    def _step(a, x):
        crosses = a["thr"].isNull() & ((a["cum"] + x["n"]) >= F.lit(cap))
        return F.struct(
            (a["cum"] + x["n"]).alias("cum"),
            F.when(crosses, x["quality"]).otherwise(a["thr"]).alias("thr"),
            F.when(crosses, F.lit(cap) - a["cum"])
             .otherwise(a["keep_at"]).alias("keep_at"))

    dims = (arr.select("source", F.aggregate("_h", acc0, _step).alias("_s"))
            .select("source", F.col("_s.thr").alias("_thr"),
                    F.col("_s.keep_at").alias("_keep_at")))
    joined = q.join(F.broadcast(dims), "source")
    clear = joined.filter(F.col("_thr").isNull()
                          | (F.col("quality") > F.col("_thr")))
    ties = joined.filter(F.col("_thr").isNotNull()
                         & (F.col("quality") == F.col("_thr")))
    sc = docs.sparkSession.sparkContext
    salt_k = max(8, min(64, sc.defaultParallelism))
    ties = ties.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_k)).cast("int"))
    w1 = Window.partitionBy("source", "_salt").orderBy("doc_id")
    local_k = (ties.withColumn("_rn", F.row_number().over(w1))
               .filter(F.col("_rn") <= F.col("_keep_at")))
    w2 = Window.partitionBy("source").orderBy("doc_id")
    tie_keep = (local_k.withColumn("_rn2", F.row_number().over(w2))
                .filter(F.col("_rn2") <= F.col("_keep_at")))
    return (clear.select("doc_id", "source", "quality")
            .unionByName(tie_keep.select("doc_id", "source", "quality")))
