"""Snapshot parsing: ``(repo, path, commit, lang, content)`` -> digested revisions.

This is the heavy, *row-parallel* stage.  Every revision's entity JSON is
decoded, homogenized and pre-hashed here, inside an Arrow-batched
``mapInPandas`` — so the per-page grouped diff (diff.py) only performs cheap
set operations over pre-computed identities.  That split is the engine's
primary skew mitigation: the reference does all of this work inside one
sequential per-page loop (page_parser.py:1956-2326), which at 10^12 scale
would pin a hot page (e.g. a 60k-revision sandbox entity,
general_analysis.py:367-369) to a single worker; here the expensive JSON +
sha1 work for that page spreads over the whole cluster and only the
lightweight replay is grouped.

Digest format (one JSON string per revision), consumed by diff.py::

    {redirect, redirect_qid, has_labels, has_descs, has_claims,
     has_aliases, has_sitelinks, label, description, alias,
     claims: {pid: [stmt, ...]}}

    stmt = {sid, rank,
            hash,       # value_hash(homogenized mainsnak)  (page_parser.py:1032-1082)
            raw_hash,   # the snak's own 'hash' field — the first-revision
                        # path hashes with this, not the canonical hash
                        # (page_parser.py:1359)
            value,      # parsed homogenized value           (page_parser.py:250-280)
            raw_value,  # parsed *non*-homogenized value — the first-revision
                        # path never homogenizes (page_parser.py:1350-1429)
            datatype, metadata,
            quals: {qpid: [[hash, value, datatype], ...]},   # deduped by hash,
                        # dict last-wins (page_parser.py:1276-1289)
            refs: [[ref_hash, rpid, value_hash, value, datatype], ...]}
                        # keyed (ref_hash, rpid, value_hash), last-wins
                        # (page_parser.py:1125-1156)
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import canonical as C
from .schema import PARSED_SCHEMA

LANGUAGE = "en"  # reference setup.yml:3


def _norm_lang_value(revision: dict, field: str) -> str | None:
    """labels/descriptions['en']['value'] with misses collapsed to None
    (page_parser.py:237-248 — ``_safe_get_nested`` returns {} on miss)."""
    v = C.safe_get_nested(revision, field, LANGUAGE, "value")
    return None if isinstance(v, dict) else v


_HOMOGENIZE_TOUCHES = frozenset(("globecoordinate", "time")) \
    | frozenset(C.WD_ENTITY_TYPES)


def _digest_statement(stmt: dict) -> dict:
    """Pre-compute every identity the diff needs for one statement."""
    mainsnak = stmt.get("mainsnak") or {}
    raw_hash = mainsnak.get("hash")

    dv = mainsnak.get("datavalue")
    dtype0 = dv.get("type") if type(dv) is dict else None
    if mainsnak and (dv is None or (type(dv) is dict
                                    and dtype0 not in _HOMOGENIZE_TOUCHES)):
        # homogenize_datavalue is the identity for every datatype except
        # globecoordinate/time/entity (it only pops/edits those), so the
        # raw and homogenized parses coincide — one parse_snak + one hash
        # instead of two parses (the second parse was ~10% of the whole
        # parse stage in profiling; string statements dominate real dumps)
        value, datatype, metadata = C.parse_snak(mainsnak)
        raw_value = value
        hom = mainsnak
        vhash = C.value_hash(mainsnak)
    else:
        # first-revision path: raw parse + the snak's own hash
        # (page_parser.py:1356-1359)
        raw_value, _raw_dt, _raw_meta = (
            C.parse_snak(mainsnak) if mainsnak else (None, None, None))
        # all later paths: homogenize, canonical hash (page_parser.py:1607,
        # 1659, 1804-1810).  In-place mutation is safe: this revision's
        # parsed JSON is owned by this call and the raw value/hash were
        # captured above.
        hom = C.homogenize_datavalue(mainsnak)
        value, datatype, metadata = C.parse_snak(hom)
        vhash = C.value_hash(hom)

    # qualifiers: per qual-pid hash maps, deduped last-wins (page_parser.py:1276-1289)
    quals = {}
    qualifiers = stmt.get("qualifiers") or {}
    if isinstance(qualifiers, dict):
        for qpid, snaks in qualifiers.items():
            hash_map = {}
            for snak in snaks:
                hsnak = C.homogenize_datavalue(snak)
                h = C.value_hash(hsnak)
                qval, qdt, _ = C.parse_qual_ref_snak(hsnak)
                hash_map[h] = [h, qval, qdt]
            quals[qpid] = list(hash_map.values())

    # references: group-content hash + per-snak identities (page_parser.py:1125-1156)
    refs_map = {}
    for ref in stmt.get("references") or []:
        snaks = ref.get("snaks")
        if not isinstance(snaks, dict):
            continue
        pairs = []
        hom_snaks = []
        for rpid, rsnaks in snaks.items():
            for snak in rsnaks:
                hsnak = C.homogenize_datavalue(snak)
                h = C.value_hash(hsnak)
                pairs.append((rpid, h))
                hom_snaks.append((rpid, h, hsnak))
        ref_hash = C.reference_group_hash(pairs)
        for rpid, h, hsnak in hom_snaks:
            rval, rdt, _ = C.parse_qual_ref_snak(hsnak)
            refs_map[(ref_hash, rpid, h)] = [ref_hash, rpid, h, rval, rdt]
    refs = list(refs_map.values())

    return {
        "sid": stmt.get("id"),
        "rank": stmt.get("rank"),
        "hash": vhash,
        "raw_hash": raw_hash,
        "value": value,
        "raw_value": raw_value,
        "datatype": datatype,
        "metadata": metadata if metadata is not None else None,
        "quals": quals,
        "refs": refs,
    }


def digest_revision(content: str, lang: str) -> tuple[dict | None, dict | None, str | None]:
    """Decode + digest one revision's content.

    Returns (meta, digest, error); digest is None for deleted/broken rows.
    """
    if lang == "deleted":
        # suppressed text (<text deleted="deleted"/>, page_parser.py:1993-2011):
        # only the meta survives, for parent-pointer repair.
        try:
            meta = C.fast_json_loads(content).get("meta", {})
        except (json.JSONDecodeError, AttributeError):
            meta = {}
        return meta, None, None

    revision = C.decode_revision_json(content)
    if revision is None:
        # quarantine channel (page_parser.py:168-187)
        try:
            meta = C.fast_json_loads(content).get("meta", {})
        except (json.JSONDecodeError, AttributeError):
            meta = {}
        return meta, None, "json_decode_error"

    meta = revision.get("meta", {}) if isinstance(revision, dict) else {}

    claims = C.safe_get_nested(revision, "claims")
    aliases = revision.get("aliases")
    alias = ""
    if isinstance(aliases, dict):
        alias_list = aliases.get(LANGUAGE, [])
        alias = alias_list[0]["value"] if len(alias_list) > 0 else ""

    digest = {
        "redirect": "redirect" in revision,
        "redirect_qid": (
            C.id_to_int(revision["redirect"])
            if revision.get("redirect") else None
        ),
        "has_labels": bool(C.safe_get_nested(revision, "labels")),
        "has_descs": bool(C.safe_get_nested(revision, "descriptions")),
        "has_claims": bool(claims),
        "has_aliases": bool(C.safe_get_nested(revision, "aliases")),
        "has_sitelinks": bool(C.safe_get_nested(revision, "sitelinks")),
        "label": _norm_lang_value(revision, "labels"),
        "description": _norm_lang_value(revision, "descriptions"),
        "alias": alias,
        "claims": {
            pid: [_digest_statement(s) for s in stmts]
            for pid, stmts in claims.items()
        },
    }
    return meta, digest, None


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in PARSED_SCHEMA.fields]
    for pdf in batches:
        # columnar accumulation: one list per output column instead of one
        # dict per row (the list-of-dicts -> DataFrame path re-walked every
        # row twice; profiled ~15% of the parse stage)
        out: dict[str, list] = {c: [] for c in cols}
        ap = {c: out[c].append for c in cols}
        for repo, path, commit, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"],
                pdf["content"]):
            meta, digest, error = digest_revision(content, lang)
            meta = meta or {}
            ap["repo"](repo)
            ap["path"](path)
            ap["commit"](commit)
            ap["entity_id"](C.id_to_int(path))
            ap["revision_id"](meta.get("revision_id"))
            ap["parent_id"](meta.get("parent_id"))
            ap["timestamp"](meta.get("timestamp"))
            ap["username"](meta.get("username") or "")
            ap["user_id"](str(meta.get("user_id") or ""))
            ap["comment"](meta.get("comment") or "")
            ap["is_deleted"](lang == "deleted")
            ap["parse_ok"](digest is not None)
            # compact separators: the digest is an internal transport
            # format (decoded in diff/salted, never hashed) — ~12% fewer
            # bytes through the page shuffle; orjson fast path with stdlib
            # fallback (consumers parse values back, so only value
            # equivalence matters here, not byte layout)
            ap["snapshot"](C.fast_json_dumps_compact(digest)
                           if digest is not None else None)
            ap["error"](error)
        # pre-built ndarrays skip pandas' per-column inference and block
        # consolidation (same pattern as diff.bucket_diff); the
        # nullable-Int64 casts behave identically from object columns.
        # is_deleted/parse_ok stay real bool dtype (they are never null) —
        # pandas consumers rely on boolean `~`, which on object-dtype
        # Python bools is arithmetic invert.
        n = len(out["repo"])
        data = {}
        for c in cols:
            if c in ("is_deleted", "parse_ok"):
                data[c] = np.array(out[c], dtype=bool)
            else:
                arr = np.empty(n, dtype=object)
                arr[:] = out[c]
                data[c] = arr
        yield pd.DataFrame(data, columns=cols, copy=False).astype(
            {"revision_id": "Int64", "parent_id": "Int64",
             "entity_id": "Int64"})


_NAMESPACE_RES = {"item": r"^Q\d+$", "property": r"^P\d+$"}


def parse_documents(docs: DataFrame, namespace: str = "item") -> DataFrame:
    """Versioned-document table -> parsed revision table.

    Applies the namespace filter first (default: keep item pages only —
    paths shaped ``Q<digits>``; reference file_parser.py:326-329) so the
    predicate is pushed to the scan, then digests each revision
    Arrow-batch-wise.  ``namespace='property'`` admits ``P<digits>`` pages
    instead — the PropertyDocument pass of the reference's
    ExtractLabelsProperties dump tool (extractors.property_labels)."""
    filtered = docs.filter(F.col("path").rlike(_NAMESPACE_RES[namespace]))
    return filtered.mapInPandas(_parse_batches, schema=PARSED_SCHEMA)


def quarantine(parsed: DataFrame) -> DataFrame:
    """Undecodable revisions as a DataFrame (replaces the reference's
    error_revision_text.txt side channel, page_parser.py:177-187)."""
    return parsed.filter((~F.col("parse_ok")) & (~F.col("is_deleted"))) \
                 .select("repo", "path", "commit", "revision_id", "error")
