"""Transitive-closure builder (reference wdtk/ExtractTransitiveClosure.java).

The reference ships a single-JVM closure extractor: one pass over the dump
collects direct (entity -> entity) edges for the four hierarchy relations
P279 (subclass of), P361 (part of), P527 (has parts), P131 (located in)
(ExtractTransitiveClosure.java:97-123), then an in-memory iterate-to-fixpoint
expansion materializes each entity's full reachable set (:167-228, capped at
10 accelerated iterations) and writes per-relation CSV dims (:239-260) that
feature_creation.py later consumes.

Spark-first re-expression:
  * ``live_edges``          — direct edges from the engine's own change
    stream: the *live* entity-valued statement per (entity, property,
    statement id) at end of history, i.e. the state the reference's dump
    pass would see.  One window + filter; no shuffle beyond the window.
  * ``transitive_closure``  — distributed semi-naive iteration (datalog
    delta evaluation): each round joins only the *newly discovered* pairs
    against the direct edges, anti-joins out known pairs, and unions the
    remainder in.  Rounds = graph depth (not path count); per-round
    ``localCheckpoint`` truncates the growing lineage so the plan stays
    flat; the only per-round action is the delta-emptiness check.  At
    cluster scale both sides of the round join hash-partition on
    (property_id, join key), and the direct-edge table is broadcast when it
    fits (dims like P279 are ~3M rows at full Wikidata — well under the
    10^9-pair closures they generate).
  * ``closure_dims``        — aggregates pairs into the reference's CSV dim
    shape (entity_id, entity_id_numeric, transitive_closure_qids,
    transitive_closure_numeric_ids; :242) with *sorted* member lists (the
    reference joins a HashSet — per-JVM order; sorting is this repo's
    documented deterministic winner), ready for
    features.entity_backfill's closure-flag joins.

Scale note: a transitive closure is inherently output-bound (a depth-d
chain of n nodes owns O(n*d) pairs).  The semi-naive form never re-derives
a known pair's successors twice, which is the property that matters at
10^12-edge scale; the reference's Floyd-Warshall-flavored in-place loop
re-scans every entity's whole reachable set each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: the reference's four hierarchy relations (ExtractTransitiveClosure.java:97-123)
RELATIONS = (279, 361, 527, 131)

#: relation pid -> the dim name features.entity_backfill consumes
RELATION_DIMS = {279: "subclass_transitive", 361: "part_of_transitive",
                 527: "has_part_transitive", 131: "located_in_transitive"}


def live_edges(value_change: DataFrame,
               relations: tuple = RELATIONS) -> DataFrame:
    """Direct (property_id, src, dst) edges from the live end-of-history
    statements of the change stream.

    A statement's live value is its last change row by revision_id (the
    change PK makes that row unique); DELETE rows kill the statement.  Only
    entity-valued statements (serialized ``"Q<digits>"``) form edges —
    matching the reference's EntityIdValue filter
    (ExtractTransitiveClosure.java:124-137).
    """
    # last change row per statement as ONE max_by hash aggregate (the change
    # PK makes revision_id unique within the group, so there are no ties) —
    # a partial-aggregated combine instead of the old row_number window's
    # full sort-exchange (the knn_ivf / link_mentions top-1 house pattern)
    return (value_change
            .filter((F.col("change_target") == "")
                    & F.col("property_id").isin(list(relations)))
            .groupBy("entity_id", "property_id", "value_id")
            .agg(F.max_by(F.struct("action", "new_value"), "revision_id")
                 .alias("_last"))
            .filter((F.col("_last.action") != "DELETE")
                    & F.col("_last.new_value").rlike(r'^"Q\d+"$'))
            .select("property_id",
                    F.concat(F.lit("Q"),
                             F.col("entity_id").cast("string")).alias("src"),
                    F.regexp_replace("_last.new_value", '"', "").alias("dst"))
            .distinct())


def transitive_closure(edges: DataFrame, max_rounds: int = 32) -> DataFrame:
    """All (property_id, src, dst) pairs reachable via >= 1 edge of one
    relation: distributed semi-naive fixpoint (caps at ``max_rounds`` like
    the reference caps at 10 iterations; every synthetic graph here
    converges far earlier — convergence is checked, not assumed).

    Each round materializes ONLY its delta (``localCheckpoint``); the
    running closure is the lazy union of the per-round deltas, which are
    pairwise disjoint by construction (every delta is anti-joined against
    the union of all earlier ones).  The pre-round-7 loop additionally
    re-checkpointed the FULL closure every round — O(depth x |closure|)
    materialization that adds no information (at the round-7 gate's toy
    size its removal was wall-neutral because the per-round anti-join
    shuffle dominates, but the wasted write volume grows with |closure|;
    BENCH/BASELINE.md round-7 closure-gate section has the Amdahl
    attribution).  The union-of-checkpoints plan stays flat: depth leaf
    scans, no lineage growth.
    """
    keys = ["property_id", "src", "dst"]
    edges = edges.select(*keys).distinct().localCheckpoint()
    # closure = lazy union of the per-round checkpointed deltas (disjoint
    # by construction), so the plan is a flat stack of materialized leaves
    closure = edges
    delta = edges
    converged = False
    for _ in range(max_rounds):
        # PATH DOUBLING (the reference's own "accelerated iterations",
        # ExtractTransitiveClosure.java:167-228): extend the new pairs by
        # the WHOLE closure so far, not by single edges — reachable
        # distance doubles per round, so a depth-d graph converges in
        # ceil(log2 d) + 1 rounds instead of d.  Completeness: a shortest
        # path longer than the covered distance D splits at the node D
        # hops in — a delta prefix (distance exactly D > previous bound)
        # plus a closure suffix (distance <= D).  The trade is more join
        # bytes per round (closure grows) against depth-many fewer
        # rounds; each round is a full barrier (checkpoint + emptiness
        # probe), so at measured per-round floors of ~1 s the log2 round
        # count wins at every tested size (19.5 -> ~7 s at the sf1.0
        # bench's depth-16 hierarchy).
        hop = closure.select(F.col("property_id").alias("_pid"),
                             F.col("src").alias("_hop_src"),
                             F.col("dst").alias("_hop_dst"))
        grown = (delta
                 .join(hop, (delta["dst"] == hop["_hop_src"])
                       & (delta["property_id"] == hop["_pid"]))
                 .select("property_id", "src",
                         F.col("_hop_dst").alias("dst"))
                 .distinct())
        # distinct BEFORE the anti-join, deliberately: both hash on the
        # same three keys (one exchange either way, plan-verified), but
        # the distinct's partial aggregate pre-shuffles map-side — the
        # anti-then-distinct variant measured 40% SLOWER at the 8-core
        # gate level (63.8 -> ~89 s, reproduced; BENCH/BASELINE.md
        # round-7 closure gate) and was reverted
        delta = grown.join(closure, keys, "left_anti").localCheckpoint()
        if delta.isEmpty():
            converged = True
            break
        closure = closure.unionByName(delta)
    if not converged:
        # a silent cap would truncate deep P279/P131 chains undetectably at
        # full scale — fail loudly and let the caller raise the cap
        raise RuntimeError(
            f"transitive_closure did not converge within {max_rounds} "
            f"rounds (last delta non-empty); raise max_rounds — graph "
            f"depth exceeds the cap")
    return closure


def closure_dims(pairs: DataFrame) -> DataFrame:
    """Aggregate closure pairs to the reference CSV dim shape
    (ExtractTransitiveClosure.java:239-260), sorted members."""
    return (pairs
            .groupBy("property_id", F.col("src").alias("entity_id"))
            .agg(F.sort_array(F.collect_set("dst")).alias("_members"))
            .select(
                "property_id", "entity_id",
                F.expr("CAST(substring(entity_id, 2) AS LONG)")
                 .alias("entity_id_numeric"),
                F.array_join("_members", ",").alias("transitive_closure_qids"),
                F.array_join(F.transform(
                    "_members", lambda m: F.substring(m, 2, 18)), ",")
                 .alias("transitive_closure_numeric_ids")))


def hierarchy_edges(spark, sf_dir: str) -> DataFrame:
    """Deterministic multi-hop P279 hierarchy over the page QIDs: each page
    entity Q(10000+doc_id) subclasses Q(10000+doc_id//2) — a binary tree of
    depth ~log2(n_docs), so the closure genuinely exercises the iterative
    path (the corpus's own live edges are depth-1).  Derived from the
    documents table only; the DuckDB oracle re-derives it independently."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return (docs.filter(F.col("doc_id") > 0)
            .select(F.lit(279).alias("property_id"),
                    F.concat(F.lit("Q"),
                             (F.col("doc_id").cast("long") + 10000)
                             .cast("string")).alias("src"),
                    F.concat(F.lit("Q"),
                             (F.floor(F.col("doc_id").cast("long") / 2)
                              + 10000).cast("string")).alias("dst")))
