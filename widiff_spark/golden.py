"""Pure-pandas oracle for the KG pipeline queries (the driver correctness
gate for everything the grouped-map diff feeds).

Kernel independence: the decode -> per-page replay -> revert tagging that
produces the change tables here comes from the **cleanroom package**
(``cleanroom/replay.py``) — a second implementation of the reference
semantics (page_parser.py:1350-2326, feature_creation.py:877-1132) written
from the reference sources and sharing zero code with the engine's
``parse``/``diff``/``revert`` modules.  ``tests/test_cleanroom.py``
differential-fuzzes the two implementations against each other (scripted
edge corpus, sf0.001 derived corpus, randomized adversarial histories,
hypothesis edit scripts); a bug in an engine kernel therefore surfaces as a
driver-oracle mismatch instead of cancelling out.  The feature batteries
likewise come from ``cleanroom/features.py`` (fuzzed against the engine's
featurelib).  The only remaining shared surface is the corpus *generator*
(fixtures — the input, not the oracle).

Everything Spark actually *executes differently* — the page-bucket shuffle,
Arrow batching, the broadcast label joins, the JVM-side week/year buckets,
the cohort semi-joins, the stats explode, the analysis aggregations — is
re-implemented here as straight-line pandas, so a Spark-side
planning/packing bug also shows up as a driver-oracle mismatch.

``build_golden(sf_dir)`` returns one pandas DataFrame per kg_* query,
column-for-column identical to the Spark query output;
``scripts/make_golden.py`` materializes them as parquet under
``golden/<sf>/`` for DuckDB's ``read_parquet`` (the ``oracle_sql()`` side).
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd

from . import fixtures
from .canonical import WD_ENTITY_TYPES, WD_STRING_TYPES
from .config import DEFAULT_CONFIG, PipelineConfig
from .features import (ENTITY_CLOSURE_COLS, ENTITY_SIM_COLS, GLOBE_FEATURE_COLS,
                       QUANTITY_FEATURE_COLS, TEXT_FEATURE_COLS,
                       TIME_FEATURE_COLS)
from .fixtures import ASTRONOMICAL_TYPES, PROPERTY_LABELS, SCHOLARLY_TYPES
from .schema import TABLE_COLUMNS


def _round_half_up(x: float, digits: int) -> float:
    """Spark's F.round is HALF_UP; Python round() is banker's."""
    import decimal
    return float(decimal.Decimal(str(x)).quantize(
        decimal.Decimal(1).scaleb(-digits), rounding=decimal.ROUND_HALF_UP))


# --------------------------------------------------------------------------- #
# corpus -> parsed -> per-page diff (shared kernels, independent orchestration)
# --------------------------------------------------------------------------- #

def corpus_pdf(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return pd.concat(list(fixtures._corpus_batches(iter([docs]))),
                     ignore_index=True)


def diff_tables(corpus: pd.DataFrame,
                config: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Cleanroom replay of the corpus: namespace filter, per-page diff,
    revert tagging — zero engine code (see module docstring).  Returns the
    five change tables + entity_stats + quarantine as plain pandas."""
    # lazy: importing widiff_spark.golden must not require the cleanroom
    # package (the addPyFile zip ships engine + cleanroom, but external zip
    # consumers may strip it; only *running* the oracle needs it)
    from cleanroom import replay_corpus
    clean = replay_corpus(
        corpus.to_dict("records"),
        re_interpretation=config.re_interpretation,
        extract_datatype_metadata=config.extract_datatype_metadata,
        time_threshold=config.time_threshold_seconds)
    tables = {t: pd.DataFrame(clean[t]) for t in (
        "revision", "value_change", "qualifier_change", "reference_change",
        "datatype_metadata_change")}
    tables["entity_stats"] = pd.DataFrame(clean["entity_stats"])
    tables["entity_labels"] = pd.DataFrame(
        clean["entity_labels"],
        columns=["repo", "qid", "numeric_id", "label", "alias",
                 "description"])
    tables["quarantine"] = pd.DataFrame(
        clean["quarantine"],
        columns=["repo", "path", "commit", "revision_id", "error"]) \
        .astype({"revision_id": "Int64"})
    return tables


# --------------------------------------------------------------------------- #
# enrichment mirrors (enrich.py, in pandas)
# --------------------------------------------------------------------------- #

def _time_buckets(df: pd.DataFrame, ts_col: str = "timestamp") -> pd.DataFrame:
    def buckets(ts: str):
        dt = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
        return (f"{dt.year}-W{dt.isocalendar()[1]:02d}",
                dt.strftime("%Y-%m"), dt.strftime("%Y"))
    trip = [buckets(t) for t in df[ts_col]]
    df = df.copy()
    df["week"] = [t[0] for t in trip]
    df["year_month"] = [t[1] for t in trip]
    df["year"] = [t[2] for t in trip]
    return df


def _add_labels(df: pd.DataFrame, columns: dict[str, str]) -> pd.DataFrame:
    df = df.copy()
    for id_col, label_col in columns.items():
        df[label_col] = [PROPERTY_LABELS.get(pid, "") for pid in df[id_col]]
    return df


_LABEL_JOINS = {
    "value_change": {"property_id": "property_label"},
    "datatype_metadata_change": {"property_id": "property_label"},
    "qualifier_change": {"property_id": "property_label",
                         "qual_property_id": "qual_property_label"},
    "reference_change": {"property_id": "property_label",
                         "ref_property_id": "ref_property_label"},
}


def _cohorts(entity_stats: pd.DataFrame,
             config: PipelineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    ao, sa = set(ASTRONOMICAL_TYPES), set(SCHOLARLY_TYPES)
    rows = []
    for _, r in entity_stats.iterrows():
        types = set((r["entity_types_31"] or "").split(", "))
        is_ao = bool(types & ao)
        is_sa = bool(types & sa)
        less = (not is_ao) and (not is_sa) \
            and r["num_value_changes"] <= config.less_threshold
        cohort = "sa" if is_sa else "ao" if is_ao else "less" if less else "rest"
        rows.append({"repo": r["repo"], "entity_id": r["entity_id"],
                     "is_scholarly_article": is_sa,
                     "is_astronomical_object": is_ao,
                     "has_less_revisions": less, "cohort": cohort})
    return pd.DataFrame(rows)


def enriched_tables(tables: dict,
                    config: PipelineConfig = DEFAULT_CONFIG) -> dict:
    out = {}
    for name in ("revision", "value_change", "qualifier_change",
                 "reference_change", "datatype_metadata_change"):
        t = tables[name]
        if t.empty:
            t = pd.DataFrame(columns=TABLE_COLUMNS[name])
        t = t[TABLE_COLUMNS[name]]
        t = _time_buckets(t)
        if name in _LABEL_JOINS:
            t = _add_labels(t, _LABEL_JOINS[name])
        out[name] = t
    st = tables["entity_stats"]
    out["entity_stats"] = st.merge(
        _cohorts(st, config), on=["repo", "entity_id"], how="left")
    return out


# --------------------------------------------------------------------------- #
# feature-table mirrors (features.py, in pandas)
# --------------------------------------------------------------------------- #

_BASE_COLS = ["revision_id", "property_id", "property_label", "value_id",
              "change_target", "new_datatype", "old_datatype", "action",
              "old_value", "new_value"]


def _update_rows(vc: pd.DataFrame) -> pd.DataFrame:
    return vc[(vc["change_target"] == "") & (vc["action"] == "UPDATE")
              & (vc["new_datatype"] == vc["old_datatype"])]


def feature_frames(value_change: pd.DataFrame) -> dict[str, pd.DataFrame]:
    from cleanroom import features as CF
    upd = _update_rows(value_change)

    def battery(rows: pd.DataFrame, fn, cols: list[str],
                extras: dict) -> pd.DataFrame:
        base = rows[_BASE_COLS + ["entity_label"]].reset_index(drop=True)
        feats = [fn(o, n) for o, n in zip(base["old_value"], base["new_value"])]
        fdf = pd.DataFrame(feats, columns=cols) if feats \
            else pd.DataFrame(columns=cols)
        out = pd.concat([base, fdf], axis=1)
        for k, v in extras.items():
            out[k] = v
        return out[_BASE_COLS + cols + ["entity_label"] + list(extras)]

    text = battery(upd[upd["new_datatype"].isin(WD_STRING_TYPES)],
                   lambda o, n: CF.text_features("text", o, n),
                   TEXT_FEATURE_COLS,
                   {"value_cosine_similarity": 0.0, "label": "",
                    "processed": False})
    time_f = battery(upd[upd["new_datatype"] == "time"], CF.time_features,
                     TIME_FEATURE_COLS, {"label": ""})
    qty = battery(upd[upd["new_datatype"] == "quantity"], CF.quantity_features,
                  QUANTITY_FEATURE_COLS, {"label": ""})
    globe = battery(upd[upd["new_datatype"] == "globecoordinate"],
                    CF.globe_features, GLOBE_FEATURE_COLS,
                    {"label_latitude": "", "label_longitude": ""})

    ent = upd[upd["new_datatype"].isin(WD_ENTITY_TYPES)][
        _BASE_COLS + ["entity_label"]].reset_index(drop=True).copy()
    for c in ENTITY_SIM_COLS:
        ent[c] = np.nan if c in ("token_overlap", "edit_distance_ratio") \
            else pd.array([None] * len(ent), dtype="Int32")
    ent["is_link_change"] = pd.array([None] * len(ent), dtype="Int32")
    for c in ENTITY_CLOSURE_COLS:
        ent[c] = 0
    for c in ("old_value_label", "new_value_label", "old_value_description",
              "new_value_description"):
        ent[c] = ""
    ent["label_cosine_similarity"] = 0.0
    ent["description_cosine_similarity"] = 0.0
    ent["label"] = ""
    ent["processed"] = False

    return {"features_text": text, "features_time": time_f,
            "features_quantity": qty, "features_globecoordinate": globe,
            "features_entity": ent}


# --------------------------------------------------------------------------- #
# analysis mirrors (analysis.py, in pandas)
# --------------------------------------------------------------------------- #

def property_stats_pdf(vc: pd.DataFrame) -> pd.DataFrame:
    v = vc[vc["change_target"] == ""]
    g = v.groupby(["property_id", "property_label"], sort=True)
    out = pd.DataFrame({
        "num_entities": g["entity_id"].nunique(),
        "num_changes": g.size(),
        "num_creates": g.apply(lambda d: int((d["action"] == "CREATE").sum()),
                               include_groups=False),
        "num_deletes": g.apply(lambda d: int((d["action"] == "DELETE").sum()),
                               include_groups=False),
        "num_updates": g.apply(lambda d: int((d["action"] == "UPDATE").sum()),
                               include_groups=False),
        "num_reverted": g.apply(lambda d: int((d["is_reverted"] == 1).sum()),
                                include_groups=False),
        "num_reversions": g.apply(lambda d: int((d["reversion"] == 1).sum()),
                                  include_groups=False),
    }).reset_index()
    return out


def entity_type_stats_pdf(stats: pd.DataFrame,
                          sandbox: list[int]) -> pd.DataFrame:
    df = stats[~stats["entity_id"].isin(sandbox)]
    rows = []
    for _, r in df.iterrows():
        for t in (r["entity_types_31"] or "").split(", "):
            if t:
                rows.append({"p31_type": t, "entity_id": r["entity_id"],
                             "num_revisions": r["num_revisions"],
                             "num_value_changes": r["num_value_changes"]})
    if not rows:
        return pd.DataFrame(columns=["p31_type", "num_entities",
                                     "num_revisions", "num_value_changes"])
    e = pd.DataFrame(rows)
    g = e.groupby("p31_type", sort=True)
    return pd.DataFrame({
        "num_entities": g["entity_id"].nunique(),
        "num_revisions": g["num_revisions"].sum(),
        "num_value_changes": g["num_value_changes"].sum(),
    }).reset_index()


_ROLLUP_SUMS = ["num_revisions", "num_value_changes", "num_rank_changes",
                "num_qualifier_changes", "num_reference_changes",
                "num_reverted_edits", "num_reversions", "num_bot_edits",
                "num_human_edits", "num_anonymous_edits"]


def cohort_rollup_pdf(stats: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for cohort, g in stats.groupby("cohort", sort=True):
        metrics = {"num_entities": float(len(g))}
        for c in _ROLLUP_SUMS:
            metrics[c] = float(g[c].sum())
        metrics["avg_value_changes"] = _round_half_up(
            float(g["num_value_changes"].mean()), 2)
        for m, v in metrics.items():
            rows.append({"cohort": cohort, "metric": m, "value": v})
    return pd.DataFrame(rows)


# --------------------------------------------------------------------------- #
# the per-query golden frames
# --------------------------------------------------------------------------- #

def build_golden(sf_dir: str,
                 config: PipelineConfig = DEFAULT_CONFIG) -> dict[str, pd.DataFrame]:
    """One pandas frame per kg_* query, matching the Spark output columns."""
    from .analysis import SANDBOX_ENTITIES

    corpus = corpus_pdf(sf_dir)
    raw_tables = diff_tables(corpus, config)
    tables = enriched_tables(raw_tables, config)
    vc = tables["value_change"]
    feats = feature_frames(vc)
    stats = tables["entity_stats"]

    out: dict[str, pd.DataFrame] = {}

    sv = vc[vc["change_target"] == ""]
    out["kg_triples"] = pd.DataFrame({
        "subj": sv["entity_id"].astype("int64"),
        "pred": sv["property_id"].astype("int32"),
        "obj": [n if n != "{}" else o
                for o, n in zip(sv["old_value"], sv["new_value"])],
        "action": sv["action"],
        "revision_id": sv["revision_id"].astype("int64"),
        "timestamp": sv["timestamp"],
    })

    out["kg_value_change"] = vc[[
        "revision_id", "property_id", "value_id", "change_target", "action",
        "old_value", "new_value", "is_reverted", "reversion", "entity_id",
        "week", "year_month", "year", "property_label", "label"]]

    out["kg_revision"] = tables["revision"]
    out["kg_qualifier_change"] = tables["qualifier_change"]
    out["kg_reference_change"] = tables["reference_change"]
    out["kg_datatype_metadata_change"] = tables["datatype_metadata_change"]

    out["kg_entity_stats"] = stats[[
        "repo", "entity_id", "entity_label", "num_revisions",
        "num_value_changes", "num_value_change_creates",
        "num_value_change_deletes", "num_value_change_updates",
        "num_rank_changes", "num_reverted_edits", "num_reversions",
        "num_bot_edits", "num_human_edits", "cohort"]]

    for name, fdf in feats.items():
        out[f"kg_{name}"] = fdf

    out["kg_quarantine"] = raw_tables["quarantine"].reset_index(drop=True)
    out["kg_entity_labels"] = raw_tables["entity_labels"] \
        .reset_index(drop=True)

    # streaming day-window ingest rates (kg_stream_rates): every corpus row
    # with a parseable meta.timestamp counts, tumbling 1-day windows
    import json as _json
    win_rows: dict[tuple, int] = {}
    for repo, content in zip(corpus["repo"], corpus["content"]):
        try:
            ts = _json.loads(content)["meta"]["timestamp"]
            day = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ") \
                .strftime("%Y-%m-%d")
        except Exception:
            continue
        win_rows[(day, repo)] = win_rows.get((day, repo), 0) + 1
    out["kg_stream_rates"] = pd.DataFrame(
        [{"window_start": f"{d} 00:00:00",
          "window_end": (datetime.strptime(d, "%Y-%m-%d")
                         + pd.Timedelta(days=1)).strftime("%Y-%m-%d %H:%M:%S"),
          "repo": r, "n_revisions": n}
         for (d, r), n in sorted(win_rows.items())])

    out["kg_property_stats"] = property_stats_pdf(vc)
    out["kg_cohort_rollup"] = cohort_rollup_pdf(stats)
    out["kg_entity_type_stats"] = entity_type_stats_pdf(stats,
                                                        SANDBOX_ENTITIES)
    return out


# dtype normalization so the parquet schema matches what Spark's toPandas /
# DuckDB's .df() produce after the driver's stringify-and-sort compare
_INT64 = ("revision_id", "entity_id", "prev_revision_id", "q_id_redirect",
          "revision_id_reversion", "subj", "num_revisions",
          "num_value_changes", "num_entities", "num_changes")
_INT32 = ("property_id", "qual_property_id", "ref_property_id", "pred",
          "is_reverted", "reversion")


def normalize_dtypes(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in pdf.columns:
        if c in _INT64:
            pdf[c] = pdf[c].astype("Int64")
        elif c in _INT32:
            pdf[c] = pdf[c].astype("Int32")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pd.notna(pdf[c]), None)
    return pdf
