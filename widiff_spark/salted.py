"""Hot-page-immune execution mode: pair-then-salt (SURVEY.md §7.3).

The grouped mode (diff.extract_changes) replays each page sequentially inside
one task — correct and cheap at 10^6 pages, but a 60k-revision hot page (the
reference's own sandbox-entity skew, general_analysis.py:367-369) pins a
single core for the whole replay.  This module removes that bound: the page
replay decomposes into

  1. KEEP decision (row-parallel window):  a revision advances the diff
     predecessor iff it is the page's first parse-ok revision, a redirect, a
     cleaned (fully emptied) revision, or its *comparable projection* differs
     from the previous candidate's.  The projection — (label, description,
     claims as {pid: {sid: [value_hash, rank, qualifier-hash-sets,
     reference-key-sets]}}) — captures EXACTLY the reference's ``changed``
     predicate (page_parser.py:1890-1953): every setter of ``changed`` reads
     only projected fields, and projection equality is transitive, so
     lag-dedup against the previous *candidate* equals dedup against the
     previous *kept* revision.
  2. PAIR construction (one window shuffle): lag(snapshot) over kept
     revisions per page — each output row carries (prev, curr).
  3. PAIR DIFF (mapInPandas, row-parallel — the skew killer): the same
     PageDiffer branch dispatch per pair; a 60k-revision page becomes 60k
     independent rows spread over the cluster.
  4. REVERT TAGGING (applyInPandas over (page, property, value) — far finer
     than pages): the unmodified revert.tag_reverted_edits per group.
  5. ENTITY STATS (per-page aggregation + a tiny P31-replay UDF over only
     the P31 statement rows).

Output is row-identical to the grouped mode (tests/test_salted_parity.py
proves equality on the edge-case corpus incl. the hot page and on the
derived driver corpus), except the diagnostic ``total_*_time_sec`` payload
fields, which are 0.0 here (they time a loop that no longer exists).

Cost trade (measured, local[16], 8000-revision/61-statement hot page):
grouped replays the page in ONE task (13.7 s end-to-end); salted runs the
same replay as ~8000 independent pair rows across all cores (pair-diff
stage 7.6 s) at the price of two snapshot shuffles + the label-stamp join
(18.9 s end-to-end locally).  The remaining sequential floor in BOTH modes
is the revert scan of one (property, value) history — bounded by the 4-week
window since revert.py's early exit.  On one shared box the shuffle tax
outweighs the spread; on a real cluster the grouped mode's hot-page task
bounds the whole stage (minutes of idle executors at 10^12 scale) while
salted's critical path is the window-bounded tag scan only.  Round 4:
``run_pipeline(mode='auto')`` (the default) probes max-revisions-per-page
and flips to this mode above WIDIFF_SKEW_THRESHOLD (default 40k — the
measured local[32] crossover; BENCH/BASELINE.md round-4 section).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .config import DEFAULT_CONFIG, PipelineConfig
from .diff import PageDiffer, _UNIFIED_COLUMNS, _hashable
from .revert import tag_reverted_edits
from .schema import ENTITY_STATS_SCHEMA, UNIFIED_SCHEMA

_STATS_KEYS = [f.name for f in ENTITY_STATS_SCHEMA.fields]

# internal pair-diff output = unified columns + replay-ordering carriers
_PAIR_EXTRA = ["commit", "emit_idx"]


def state_key(digest: dict | None) -> str | None:
    """sha1 of the comparable projection (see module docstring).

    Excludes aliases/sitelinks (alias-only revisions never set ``changed``),
    raw_* fields (first-revision-only), and datatype metadata (covered by
    the statement value_hash — metadata lives inside the hashed datavalue).
    Duplicate statement ids collapse last-wins exactly like the reference's
    ``{s['id']: s}`` dicts (page_parser.py:1758-1781).
    """
    if digest is None:
        return None
    claims_proj = {}
    for pid, stmts in digest["claims"].items():
        by_sid = {}
        for s in stmts:
            by_sid[str(s["sid"])] = [
                s["hash"], s["rank"],
                {qp: sorted(h for h, _v, _d in lst)
                 for qp, lst in (s["quals"] or {}).items()},
                sorted([rh, rp, vh] for rh, rp, vh, _v, _d in (s["refs"] or [])),
            ]
        claims_proj[pid] = by_sid
    proj = {"label": digest["label"], "description": digest["description"],
            "claims": claims_proj}
    return hashlib.sha1(json.dumps(proj, sort_keys=True)
                        .encode("utf-8")).hexdigest()


def _digest_flags(digest: dict | None) -> tuple[bool, bool, bool]:
    """(is_redirect, is_cleaned, is_alias_only) from a digest."""
    if digest is None:
        return False, False, False
    if digest["redirect"]:
        return True, False, False
    if not digest["has_claims"] and not digest["has_labels"] \
            and not digest["has_descs"]:
        if digest["has_aliases"] or digest["has_sitelinks"]:
            return False, False, True
        return False, True, False
    return False, False, False


def annotate_parsed(parsed: DataFrame) -> DataFrame:
    """Add the salted-mode row-parallel columns to the parsed stream:
    state_key / is_redirect / is_cleaned / is_alias_only / w4 label+alias."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, red, clean, alias_only, labels, aliases = [], [], [], [], [], []
            for snap, ok in zip(pdf["snapshot"], pdf["parse_ok"]):
                digest = json.loads(snap) if ok and snap else None
                keys.append(state_key(digest))
                r, c, a = _digest_flags(digest)
                red.append(r)
                clean.append(c)
                alias_only.append(a)
                labels.append((digest or {}).get("label") or "")
                aliases.append((digest or {}).get("alias") or "")
            pdf = pdf.copy()
            pdf["state_key"] = keys
            pdf["is_redirect"] = red
            pdf["is_cleaned"] = clean
            pdf["is_alias_only"] = alias_only
            pdf["w4_label"] = labels
            pdf["w4_alias"] = aliases
            yield pdf
    schema = (", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in parsed.schema.fields)
              + ", state_key string, is_redirect boolean, is_cleaned boolean,"
                " is_alias_only boolean, w4_label string, w4_alias string")
    return parsed.mapInPandas(run, schema=schema)


def kept_pairs(annotated: DataFrame) -> DataFrame:
    """Candidate filter + keep decision + (prev, curr) pairing windows.

    The page's FIRST parse-ok revision takes the created-entity path before
    any branch dispatch (page_parser.py:1890-1893) — it is kept and becomes
    the predecessor even if alias/sitelink-only; only NON-first alias-only
    revisions are skipped (and they never advance the predecessor, so they
    leave the comparison chain entirely)."""
    page = ["repo", "path"]
    cand0 = annotated.filter(F.col("parse_ok") & (~F.col("is_deleted")))
    w0 = Window.partitionBy(*page).orderBy("commit")
    cand0 = cand0.withColumn("__rn", F.row_number().over(w0))
    chain = cand0.filter((F.col("__rn") == 1) | (~F.col("is_alias_only")))
    w_cand = Window.partitionBy(*page).orderBy("commit")
    chain = chain.withColumn("__prev_key", F.lag("state_key").over(w_cand)) \
                 .withColumn("__first", F.row_number().over(w_cand) == 1)
    kept = chain.filter(F.col("__first") | F.col("is_redirect")
                        | F.col("is_cleaned")
                        | (F.col("state_key") != F.col("__prev_key")))
    w_kept = Window.partitionBy(*page).orderBy("commit")
    return (kept
            .withColumn("prev_snapshot", F.lag("snapshot").over(w_kept))
            .withColumn("prev_revision_id",
                        F.coalesce(F.lag("revision_id").over(w_kept),
                                   F.lit(-1)))
            .withColumn("is_first", F.lag("revision_id").over(w_kept).isNull())
            .drop("__prev_key", "__first", "__rn"))


class _PairEmitter(PageDiffer):
    """PageDiffer driven one (prev, curr) pair at a time."""

    def diff_pair(self, rec: dict, config_prev: dict | None) -> None:
        user_type = ("bot" if "bot" in (rec["username"] or "").lower()
                     else "anonymous" if (rec["username"] or "") == ""
                     else "human")
        self.meta = {
            "revision_id": rec["revision_id"],
            "timestamp": rec["timestamp"],
            "comment": rec["comment"] or "",
            "username": rec["username"] or "",
            "user_id": rec["user_id"] or "",
            "user_type": user_type,
        }
        digest = json.loads(rec["snapshot"])
        self.last_digest = digest
        prev = None if rec["is_first"] else config_prev
        self.get_changes_from_revisions(digest, prev)
        self.revision_rows.append({
            "prev_revision_id": rec["prev_revision_id"],
            "revision_id": rec["revision_id"],
            "entity_id": self.entity_id,
            "timestamp": rec["timestamp"],
            "user_id": rec["user_id"] or "",
            "username": rec["username"] or "",
            "user_type": user_type,
            "comment": rec["comment"] or "",
            "redirect": self.current_revision_redirect,
            "q_id_redirect": digest.get("redirect_qid")
                             if self.current_revision_redirect else None,
        })


def make_pair_diff_udf(config: PipelineConfig = DEFAULT_CONFIG):
    """Row-parallel pair diff: one output block per (prev, curr) pair.

    Output = UNIFIED columns (entity_label left empty — stamped later from
    the page dim) + commit + emit_idx carriers for the downstream replay
    ordering; value rows additionally carry comment/timestamp for the
    revert-tagging stage.
    """
    default_row = {c: None for c in _UNIFIED_COLUMNS}
    out_columns = _UNIFIED_COLUMNS + _PAIR_EXTRA

    def pair_diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive page-partitioned and commit-ordered (the pair window's
        # own shuffle), so the previous row's decoded curr IS this row's
        # prev: one json.loads per revision, like the grouped replay (a
        # string-equality check guards page boundaries / reordered input)
        last_raw: str | None = None
        last_digest: dict | None = None
        for pdf in batches:
            out: dict = {c: [] for c in out_columns}
            for rec in pdf.to_dict("records"):
                differ = _PairEmitter(rec["repo"], int(rec["entity_id"]),
                                      config)
                raw_prev = rec["prev_snapshot"]
                if raw_prev is None:
                    prev = None
                elif raw_prev == last_raw:
                    prev = last_digest
                else:
                    prev = json.loads(raw_prev)
                differ.diff_pair(rec, prev)
                last_raw = rec["snapshot"]
                last_digest = differ.last_digest
                emit_idx = 0

                def emit(table: str, row: dict, with_comment: bool = False):
                    nonlocal emit_idx
                    u = dict(default_row)
                    u["table"] = table
                    u["repo"] = rec["repo"]
                    for k, v in row.items():
                        if k != "_key" and k in u:
                            u[k] = v
                    if with_comment:
                        u["comment"] = rec["comment"] or ""
                    for c in _UNIFIED_COLUMNS:
                        out[c].append(u[c])
                    out["commit"].append(rec["commit"])
                    out["emit_idx"].append(emit_idx)
                    emit_idx += 1

                for row in differ.revision_rows:
                    emit("revision", row)
                for row in differ.value_rows:
                    emit("value_change", row, with_comment=True)
                for row in differ.qualifier_rows:
                    emit("qualifier_change", row)
                for row in differ.reference_rows:
                    emit("reference_change", row)
                for row in differ.metadata_rows:
                    emit("datatype_metadata_change", row)
            yield pd.DataFrame(out, columns=out_columns)
    return pair_diff


# StructType.add mutates in place — build a fresh struct, never touch the
# shared UNIFIED_SCHEMA
from pyspark.sql import types as _T  # noqa: E402

_PAIR_OUT_SCHEMA = _T.StructType(
    list(UNIFIED_SCHEMA.fields)
    + [_T.StructField("commit", _T.StringType()),
       _T.StructField("emit_idx", _T.IntegerType())])


def _tag_udf(config: PipelineConfig):
    """Revert tagging per (repo, entity_id, property_id, value_id) group —
    the unmodified sequential scan, on a key far finer than pages."""
    flag_cols = ["is_reverted", "reversion", "reversion_timestamp",
                 "revision_id_reversion"]

    def tag(key, pdf: pd.DataFrame) -> pd.DataFrame:
        changes_by_pv = {}
        value_rows = []
        pdf = pdf.sort_values(["commit", "emit_idx"], kind="mergesort")
        for rec in pdf.to_dict("records"):
            pv_key = (rec["property_id"], rec["value_id"],
                      rec["change_target"])
            changes_by_pv.setdefault(pv_key, []).append({
                "timestamp": rec["timestamp"],
                "old_hash": rec["old_hash"] or "",
                "new_hash": rec["new_hash"] or "",
                "old_value": rec["old_value"],
                "new_value": rec["new_value"],
                "comment": rec["comment"] or "",
                "change_target": rec["change_target"],
                "revision_id": rec["revision_id"],
                "action": rec["action"],
            })
            value_rows.append({
                "_key": (rec["revision_id"], rec["property_id"],
                         rec["value_id"], rec["change_target"]),
                "revision_id": rec["revision_id"],
                "property_id": rec["property_id"],
                "value_id": rec["value_id"],
                "change_target": rec["change_target"],
            })
        tagged, stats = tag_reverted_edits(changes_by_pv, value_rows,
                                           config.time_threshold_seconds)
        rows = [{"revision_id": r["revision_id"],
                 "property_id": r["property_id"],
                 "value_id": r["value_id"],
                 "change_target": r["change_target"],
                 "is_reverted": r["is_reverted"],
                 "reversion": r["reversion"],
                 "reversion_timestamp": r["reversion_timestamp"],
                 "revision_id_reversion": r["revision_id_reversion"],
                 "repo": None, "entity_id": None, "stats_json": None}
                for r in tagged]
        # one marker row carries the group's revert-stat contributions
        rows.append({"revision_id": None, "property_id": None,
                     "value_id": None, "change_target": None,
                     "is_reverted": None, "reversion": None,
                     "reversion_timestamp": None,
                     "revision_id_reversion": None,
                     "repo": key[0], "entity_id": key[1],
                     "stats_json": json.dumps(stats)})
        return pd.DataFrame(rows)
    return tag


_TAG_SCHEMA = ("revision_id long, property_id int, value_id string, "
               "change_target string, is_reverted int, reversion int, "
               "reversion_timestamp string, revision_id_reversion long, "
               "repo string, entity_id long, stats_json string")


def _p31_replay_udf():
    """entity_types_31 per page: the running (sid, value) type-set replay
    over only the P31 statement-value rows, in (commit, emit_idx) order —
    every _types_add/_types_remove in the reference coincides with an
    emitted P31 row (diff.py call sites), so the row stream is a complete
    event log of the type set."""
    def replay(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["commit", "emit_idx"], kind="mergesort")
        types: dict = {}
        for rec in pdf.to_dict("records"):
            sid = rec["value_id"]

            def parse(ser):
                if ser == "{}":
                    return None
                return json.loads(ser)
            if rec["action"] == "CREATE":
                v = parse(rec["new_value"])
                types[(sid, _hashable(v))] = v
            elif rec["action"] == "DELETE":
                v = parse(rec["old_value"])
                types.pop((sid, _hashable(v)), None)
            elif rec["action"] == "UPDATE":
                ov, nv = parse(rec["old_value"]), parse(rec["new_value"])
                types.pop((sid, _hashable(ov)), None)
                types[(sid, _hashable(nv))] = nv
        type_ids = list(dict.fromkeys(_hashable(t) for t in types.values()))
        return pd.DataFrame([{
            "repo": key[0], "entity_id": key[1],
            "entity_types_31": ", ".join(str(t) for t in type_ids)}])
    return replay


def extract_changes_salted(parsed: DataFrame,
                           config: PipelineConfig = DEFAULT_CONFIG
                           ) -> DataFrame:
    """Salted (pair-parallel) analog of diff.extract_changes: identical
    unified output stream, no per-page sequential stage on the hot path."""
    spark = parsed.sparkSession
    annotated = annotate_parsed(parsed)
    pairs = kept_pairs(annotated)

    # the pair window co-locates each page in ONE partition — exactly the
    # skew this mode exists to break.  Range-repartition on (page, commit):
    # a hot page splits across many tasks at range boundaries, while commit
    # runs stay contiguous so the pair-diff's decode cache keeps its 1-parse-
    # per-revision property.
    n_parts = max(spark.sparkContext.defaultParallelism * 2,
                  int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    diffed = pairs.select(
        "repo", "path", "commit", "entity_id", "revision_id", "timestamp",
        "username", "user_id", "comment", "snapshot", "prev_snapshot",
        "prev_revision_id", "is_first"
    ).repartitionByRange(n_parts, "repo", "path", "commit") \
     .mapInPandas(make_pair_diff_udf(config), schema=_PAIR_OUT_SCHEMA)
    diffed = diffed.persist()

    # ---- revert tagging on (page, property, value) groups ----------------
    value_rows = diffed.filter(F.col("table") == "value_change")
    tagged = (value_rows
              .select("repo", "entity_id", "property_id", "value_id",
                      "change_target", "action", "old_value", "new_value",
                      "old_hash", "new_hash", "timestamp", "comment",
                      "revision_id", "commit", "emit_idx")
              .groupBy("repo", "entity_id", "property_id", "value_id")
              .applyInPandas(_tag_udf(config), schema=_TAG_SCHEMA))
    tagged = tagged.persist()
    flags = tagged.filter(F.col("stats_json").isNull()) \
        .select("revision_id", "property_id", "value_id", "change_target",
                F.col("is_reverted").alias("__ir"),
                F.col("reversion").alias("__rv"),
                F.col("reversion_timestamp").alias("__rts"),
                F.col("revision_id_reversion").alias("__rid"))
    revert_stats = tagged.filter(F.col("stats_json").isNotNull()) \
        .select("repo", "entity_id",
                F.from_json("stats_json",
                            "num_reverted_edits int, num_reversions int, "
                            "num_reverted_edits_create int, "
                            "num_reverted_edits_delete int, "
                            "num_reverted_edits_update int").alias("s")) \
        .groupBy("repo", "entity_id") \
        .agg(*[F.sum(f"s.{c}").cast("int").alias(c) for c in
               ("num_reverted_edits", "num_reversions",
                "num_reverted_edits_create", "num_reverted_edits_delete",
                "num_reverted_edits_update")])

    # the grouped replay PK-dedups value rows last-emission-wins
    # (revert.tag_reverted_edits dict_lookup) — duplicate statement ids make
    # the created/new-pid/removed-pid paths emit the same PK twice; flags
    # are keyed by PK so deduping after the join is equivalent.  Entity
    # stats stay PRE-dedup (the reference counts at save_change time).
    pk = ["revision_id", "property_id", "value_id", "change_target"]
    w_pk = Window.partitionBy(*pk).orderBy(F.desc("commit"),
                                           F.desc("emit_idx"))
    value_tagged = (value_rows
                    .withColumn("__pkr", F.row_number().over(w_pk))
                    .filter(F.col("__pkr") == 1).drop("__pkr")
                    .join(flags, pk, "left")
                    .withColumn("is_reverted", F.coalesce("__ir", F.lit(0)))
                    .withColumn("reversion", F.coalesce("__rv", F.lit(0)))
                    .withColumn("reversion_timestamp", F.col("__rts"))
                    .withColumn("revision_id_reversion", F.col("__rid"))
                    .drop("__ir", "__rv", "__rts", "__rid")
                    .withColumn("comment", F.lit(None).cast("string")))

    # ---- per-page aggregates for entity_stats ----------------------------
    page = ["repo", "entity_id"]
    rev = diffed.filter(F.col("table") == "revision")
    rev_agg = rev.groupBy(*page).agg(
        F.count("*").cast("int").alias("num_revisions"),
        F.min_by("timestamp", "commit").alias("first_revision_timestamp"),
        F.max_by("timestamp", "commit").alias("last_revision_timestamp"),
        F.sum(F.when(F.col("user_type") == "bot", 1).otherwise(0))
        .cast("int").alias("num_bot_edits"),
        F.sum(F.when(F.col("user_type") == "anonymous", 1).otherwise(0))
        .cast("int").alias("num_anonymous_edits"),
        F.sum(F.when(F.col("user_type") == "human", 1).otherwise(0))
        .cast("int").alias("num_human_edits"))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("int")

    vc = value_rows
    vc_agg = vc.groupBy(*page).agg(
        cnt(F.col("change_target") == "").alias("num_value_changes"),
        cnt((F.col("change_target") == "") & (F.col("action") == "CREATE"))
        .alias("num_value_change_creates"),
        cnt((F.col("change_target") == "") & (F.col("action") == "DELETE"))
        .alias("num_value_change_deletes"),
        cnt((F.col("change_target") == "") & (F.col("action") == "UPDATE"))
        .alias("num_value_change_updates"),
        cnt(F.col("change_target") == "rank").alias("num_rank_changes"),
        cnt((F.col("change_target") == "rank") & (F.col("action") == "CREATE"))
        .alias("num_rank_creates"),
        cnt((F.col("change_target") == "rank") & (F.col("action") == "DELETE"))
        .alias("num_rank_deletes"),
        cnt((F.col("change_target") == "rank") & (F.col("action") == "UPDATE"))
        .alias("num_rank_updates"))

    other_agg = diffed.groupBy(*page).agg(
        cnt(F.col("table") == "qualifier_change")
        .alias("num_qualifier_changes"),
        cnt(F.col("table") == "reference_change")
        .alias("num_reference_changes"),
        cnt(F.col("table") == "datatype_metadata_change")
        .alias("num_datatype_metadata_changes"),
        cnt((F.col("table") == "datatype_metadata_change")
            & (F.col("action") == "CREATE"))
        .alias("num_datatype_metadata_creates"),
        cnt((F.col("table") == "datatype_metadata_change")
            & (F.col("action") == "DELETE"))
        .alias("num_datatype_metadata_deletes"),
        cnt((F.col("table") == "datatype_metadata_change")
            & (F.col("action") == "UPDATE"))
        .alias("num_datatype_metadata_updates"))

    # W4 + timed-revision count straight from the annotated parse stream
    annotated_ok = annotated.filter(F.col("parse_ok") & (~F.col("is_deleted")))
    w4 = annotated_ok.groupBy("repo", "entity_id").agg(
        F.count("*").cast("int").alias("num_revisions_timed"),
        F.max(F.when(F.col("w4_label") != "",
                     F.struct("commit", "w4_label"))).alias("__l"),
        F.max(F.when(F.col("w4_alias") != "",
                     F.struct("commit", "w4_alias"))).alias("__a"))
    w4 = w4.select("repo", "entity_id", "num_revisions_timed",
                   F.coalesce(F.col("__l.w4_label"), F.lit(""))
                   .alias("__label"),
                   F.coalesce(F.col("__a.w4_alias"), F.lit(""))
                   .alias("__alias"))

    p31 = (vc.filter((F.col("property_id") == 31)
                     & (F.col("change_target") == ""))
           .select("repo", "entity_id", "value_id", "action", "old_value",
                   "new_value", "commit", "emit_idx")
           .groupBy("repo", "entity_id")
           .applyInPandas(_p31_replay_udf(),
                          schema="repo string, entity_id long, "
                                 "entity_types_31 string"))

    # every page gets a stats row, even with zero kept revisions (grouped
    # mode instantiates a PageDiffer per page unconditionally)
    pages = annotated.select("repo", "entity_id").distinct()
    stats = (pages
             .join(rev_agg, page, "left")
             .join(vc_agg, page, "left")
             .join(other_agg, page, "left")
             .join(revert_stats, page, "left")
             .join(w4, page, "left")
             .join(p31, page, "left")
             .fillna(0)
             .fillna({"entity_types_31": "", "__label": "", "__alias": "",
                      "first_revision_timestamp": "",
                      "last_revision_timestamp": ""}))

    def build_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                s = {k: 0 for k in _STATS_KEYS}
                for k in _STATS_KEYS:
                    v = rec.get(k)
                    if v is None or (not isinstance(v, str) and pd.isna(v)):
                        continue
                    if hasattr(v, "item"):  # numpy scalar -> python scalar
                        v = v.item()
                    s[k] = v
                s["entity_id"] = int(rec["entity_id"])
                s["entity_label"] = rec["__label"] or rec["__alias"]
                s["file_path"] = rec["repo"]
                s["first_revision_timestamp"] = \
                    rec["first_revision_timestamp"] or None
                s["last_revision_timestamp"] = \
                    rec["last_revision_timestamp"] or None
                for k in ("total_xml_parse_time_sec", "total_process_time_sec",
                          "total_revision_diff_time_sec",
                          "total_rev_edit_time_sec",
                          "total_feature_creation_sec"):
                    s[k] = 0.0
                out.append({"repo": rec["repo"],
                            "entity_id": int(rec["entity_id"]),
                            "entity_label": s["entity_label"],
                            "payload": json.dumps(s, ensure_ascii=False)})
            yield pd.DataFrame(out, columns=["repo", "entity_id",
                                             "entity_label", "payload"])

    stats_rows = stats.mapInPandas(
        build_payload,
        schema="repo string, entity_id long, entity_label string, "
               "payload string")

    # ---- assemble the unified stream + stamp page entity_label -----------
    label_dim = stats_rows.select("repo", "entity_id",
                                  F.col("entity_label").alias("__el"))

    def to_unified(df: DataFrame) -> DataFrame:
        missing = [c for c in _UNIFIED_COLUMNS if c not in df.columns]
        for c in missing:
            df = df.withColumn(
                c, F.lit(None).cast(dict(
                    (f.name, f.dataType) for f in UNIFIED_SCHEMA.fields)[c]))
        return df.select(*_UNIFIED_COLUMNS)

    body = diffed.filter(F.col("table") != "value_change") \
                 .drop("commit", "emit_idx") \
                 .unionByName(to_unified(value_tagged.drop("commit",
                                                           "emit_idx")))
    body = (body.join(label_dim, page, "left")
            .withColumn("entity_label", F.col("__el")).drop("__el"))

    stats_unified = to_unified(
        stats_rows.withColumn("table", F.lit("entity_stats")))
    return body.unionByName(stats_unified)
