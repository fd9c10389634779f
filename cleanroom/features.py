"""Cleanroom feature batteries (reference scripts/feature_creation.py).

Second implementation of the per-UPDATE feature functions, written from the
reference only — no imports from the engine (`widiff_spark.featurelib`).
Used by the golden oracle's feature frames and differential-fuzzed against
the engine in tests/test_cleanroom.py.

Reference cites: text battery :171-318 (incl. edit-operation DP :246-287,
adjacent swap :123-147, avg word Levenshtein :149-166), time battery
:323-540, quantity battery :545-718, globecoordinate battery :724-798.

Faithfully replicated reference quirks (shared spec decisions with the
engine):
  * the time battery's sentinel short-circuit checks 'some_value'/'no_value'
    (:331) while the pipeline emits 'somevalue'/'novalue' — dead in
    practice, kept as-is;
  * every added/removed date-part check is gated on equal years (:416-417),
    which makes 'year added/removed' unreachable;
  * Levenshtein is computed on the lowercased values but the edit-operation
    DP runs on the original case (:199 vs :287).
"""

from __future__ import annotations

import json
import math
import re

_NONALNUM = re.compile(r"[^a-zA-Z0-9]")
_TIMEJUNK = re.compile(r"[^0-9TZ:\-]")


# --------------------------------------------------------------------------
# string battery
# --------------------------------------------------------------------------

def edit_distance(a: str, b: str) -> int:
    """Plain Levenshtein (the reference calls the python-Levenshtein C
    extension; the metric is identical)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    row = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        new_row = [i + 1]
        for j, cb in enumerate(b):
            new_row.append(min(row[j + 1] + 1, new_row[j] + 1,
                               row[j] + (ca != cb)))
        row = new_row
    return row[-1]


def _edit_ops(old: str, new: str):
    """(insertions, deletions, substitutions) from the DP backtrace the
    reference uses (feature_creation.py:246-287) — tie-break order matters:
    match, substitution, insertion, deletion."""
    m, n = len(old), len(new)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        row, above = dp[i], dp[i - 1]
        for j in range(1, n + 1):
            row[j] = (above[j - 1] if old[i - 1] == new[j - 1]
                      else 1 + min(above[j], row[j - 1], above[j - 1]))
    i, j = m, n
    ins = dels = subs = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and old[i - 1] == new[j - 1]:
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + 1:
            subs, i, j = subs + 1, i - 1, j - 1
        elif j > 0 and dp[i][j] == dp[i][j - 1] + 1:
            ins, j = ins + 1, j - 1
        else:
            dels, i = dels + 1, i - 1
    return ins, dels, subs


def _adjacent_swap(old: str, new: str) -> int:
    # feature_creation.py:123-147
    if len(old) != len(new):
        return 0
    diffs = [i for i, (a, b) in enumerate(zip(old, new)) if a != b]
    return int(len(diffs) == 2 and diffs[1] == diffs[0] + 1
               and old[diffs[0]] == new[diffs[1]]
               and old[diffs[1]] == new[diffs[0]])


def _common_prefix_len(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def text_features(datatype: str, old_value, new_value) -> tuple:
    """feature_creation.py:171-318; 'text' adds the extended block,
    'entity' keeps the 5 shared similarity features."""
    new_v = str(new_value).strip().replace('"', "")
    old_v = str(old_value).strip().replace('"', "")

    ot, nt = set(old_v.split()), set(new_v.split())
    overlap = len(ot & nt) / len(ot | nt) if (ot | nt) else 0
    old_in_new = int(old_v in new_v)
    new_in_old = int(new_v in old_v)
    lev = edit_distance(old_v.lower().strip(), new_v.lower().strip())
    ratio = lev / (max(len(old_v), len(new_v)) or 1)
    replaced = int(overlap == 0 and old_in_new == 0 and new_in_old == 0)
    base = (overlap, old_in_new, new_in_old, ratio, replaced)
    if datatype != "text":
        return base

    ins, dels, subs = _edit_ops(old_v, new_v)
    return base + (
        int(abs(len(new_v) - len(old_v))),
        len(old_v.split()),
        len(new_v.split()),
        lev,
        int(_NONALNUM.sub("", old_v) == _NONALNUM.sub("", new_v)),
        len(_NONALNUM.findall(old_v)) - len(_NONALNUM.findall(new_v)),
        ins, dels, subs,
        _adjacent_swap(old_v, new_v),
        int(_common_prefix_len(old_v, new_v) >= 3),
        int(_common_prefix_len(old_v[::-1], new_v[::-1]) >= 3),
    )


# --------------------------------------------------------------------------
# numeric helpers (feature_creation.py:545-671)
# --------------------------------------------------------------------------

def _coord(value, part):
    return json.loads(value).get(part) if "{" in str(value) else None


def _int_frac(v):
    s = str(v)
    if "." not in s:
        return s, "0"
    head, tail = s.split(".", 1)
    try:
        return head, (tail if int(tail) > 0 else "0")
    except ValueError:
        return head, "0"


def _precision_change(old, new) -> int:
    o_head, o_frac = _int_frac(old)
    n_head, n_frac = _int_frac(new)
    return int(o_head == n_head and o_frac != n_frac
               and (o_frac != "0" or n_frac != "0"))


def _digit_count(v) -> int:
    return len(str(v).replace("-", "").replace("+", "").replace(".", ""))


def _sign_flip(old_f: float, new_f: float) -> int:
    return int(old_f * new_f < 0
               and math.floor(abs(old_f)) == math.floor(abs(new_f)))


def _same_float(old, new) -> int:
    try:
        return int(float(old) == float(new))
    except (TypeError, ValueError):
        return 0


_WSJUNK = ("\\n", "\r", "\n", "\t")


def _strip_junk(v) -> str:
    s = str(v)
    for ch in _WSJUNK:
        s = s.replace(ch, "")
    return s


def quantity_features(old_value, new_value) -> tuple:
    # feature_creation.py:674-718
    old_s = _strip_junk(old_value).strip().replace('"', "").replace("+", "").strip()
    new_s = _strip_junk(new_value).strip().replace('"', "").replace("+", "").strip()
    sign = _sign_flip(float(old_s), float(new_s))
    precision = _precision_change(old_s, new_s)
    whole = int(math.floor(abs(float(old_s))) != math.floor(abs(float(new_s))))
    old_pref = int(new_s.startswith(old_s))
    new_pref = int(old_s.startswith(new_s))
    inc = int(old_pref and _digit_count(new_s) > _digit_count(old_s))
    dec = int(new_pref and _digit_count(new_s) < _digit_count(old_s))
    return (sign, precision, inc, dec, whole, old_pref, new_pref,
            _same_float(old_s, new_s))


def globe_features(old_value, new_value) -> tuple:
    # feature_creation.py:724-798
    old = json.loads(old_value)
    new = json.loads(new_value)
    for part in ("latitude", "longitude"):
        new[part] = float(_strip_junk(new[part]).strip())

    out = {}
    for part in ("latitude", "longitude"):
        o, n = old[part], new[part]
        whole = int(math.floor(abs(float(n))) != math.floor(abs(float(o))))
        out[part] = {
            "whole": whole,
            "sign": int(float(n) * float(o) < 0 and whole == 0),
            # the remaining checks re-read the serialized JSON like the
            # reference does (so the 'both contain {' guard applies)
            "prec": (_precision_change(_coord(old_value, part),
                                       _coord(new_value, part))
                     if "{" in str(old_value) and "{" in str(new_value)
                     else 0),
            "oin": (int(str(_coord(new_value, part))
                        .startswith(str(_coord(old_value, part))))
                    if "{" in str(old_value) and "{" in str(new_value)
                    else 0),
            "nio": (int(str(_coord(old_value, part))
                        .startswith(str(_coord(new_value, part))))
                    if "{" in str(old_value) and "{" in str(new_value)
                    else 0),
            "same": (_same_float(_coord(old_value, part),
                                 _coord(new_value, part))
                     if "{" in str(old_value) and "{" in str(new_value)
                     else 0),
        }
        digits_old = _digit_count(str(_coord(old_value, part) or "")) \
            if "{" in str(old_value) and "{" in str(new_value) else None
        digits_new = _digit_count(str(_coord(new_value, part) or "")) \
            if "{" in str(old_value) and "{" in str(new_value) else None
        out[part]["inc"] = int(out[part]["oin"] == 1 and digits_new is not None
                               and digits_new > digits_old)
        out[part]["dec"] = int(out[part]["nio"] == 1 and digits_new is not None
                               and digits_new < digits_old)

    lat, lon = out["latitude"], out["longitude"]
    return (lat["sign"], lon["sign"], lat["whole"], lon["whole"],
            lat["prec"], lon["prec"], lat["inc"], lat["dec"],
            lon["inc"], lon["dec"], lat["oin"], lat["nio"], lat["same"],
            lon["oin"], lon["nio"], lon["same"])


# --------------------------------------------------------------------------
# time battery (feature_creation.py:323-540)
# --------------------------------------------------------------------------

def _ymd(s: str):
    date = _TIMEJUNK.sub("", str(s)).replace("Z", "").split("T")[0]
    neg = date.startswith("-")
    parts = (date[1:] if neg else date).split("-")
    if len(parts) < 3:
        raise ValueError(f"Invalid date format: {s}")
    y, m, d = int(parts[0]), int(parts[1]), int(parts[2])
    return (-y if neg else y), m, d


def time_features(old_value, new_value) -> tuple:
    old_v = str(old_value).strip().replace('"', "")
    new_v = str(new_value).strip().replace('"', "")
    if old_v in ("some_value", "no_value") or \
            new_v in ("some_value", "no_value"):
        return (1000, 0, 0, 0, 0, 0, 0, 1, 1, 1)

    y1, m1, d1 = _ymd(old_v)
    y2, m2, d2 = _ymd(new_v)

    date_diff = (int(abs(y2 - y1) * 365.25) + int(abs(m2 - m1) * 30.44)
                 + abs(d2 - d1))
    sign = int(old_v[1:] == new_v[1:])

    one_to_zero = int(y1 == y2 and (
        (m1 == 1 and d1 == 1 and m2 == 0 and d2 == 0)
        or (m1 == m2 and m1 > 1 and d1 == 1 and d2 == 0)
        or (m1 == 1 and m2 == 0 and d1 == 0 and d2 == 0)))

    def added(part):
        if y1 != y2:
            return 0
        if part == "month":
            return int((m1 == 0 and m2 > 0 and d1 == 0)
                       or (m1 == 1 and m2 > 1 and d1 == 1
                           and (d2 > 1 or d2 == 0)))
        return int((d1 == 0 and d2 > 0)
                   or (d1 == 1 and d2 > 1 and m1 == 1 and m2 > 1))

    def removed(part):
        if y1 != y2:
            return 0
        if m1 > 1 and d1 > 1 and m2 == 1 and d2 == 1:
            return 1
        if part == "month":
            return int(m1 > 0 and m2 == 0
                       and not (d1 == 1 and d2 == 0)
                       and not (d1 == 0 and d2 == 0))
        return int(d1 > 0 and d2 == 0 and not (d1 == 1 and d2 == 0))

    reformat = y1 == y2 and (
        (m1 == 1 and d1 == 1 and d2 == 0 and m2 == 0)
        or (m1 > 0 and m2 > 0 and m1 == m2 and d1 == 1 and d2 == 0)
        or (m1 == 1 and m2 == 0 and d1 == 0 and d2 == 0))

    month_refine = y1 == y2 and (
        (m1 == 0 and m2 > 0 and d2 == 0)
        or (m1 == 1 and d1 == 1 and m2 > 1 and (d2 > 1 or d2 == 0))
        or (m1 == 0 and m2 > 0 and d1 == 0 and d2 > 0))
    month_unrefine = y1 == y2 and m2 == 0 and m1 > 0
    diff_month = int(m1 != m2 and not reformat and not month_refine
                     and not month_unrefine)

    day_refine = y1 == y2 and ((d1 == 0 and d2 > 0)
                               or (d1 == 1 and d2 > 1 and m1 == 1 and m2 > 1))
    day_unrefine = y1 == y2 and d2 == 0 and d1 > 0
    diff_day = int(d1 != d2 and not reformat and not day_refine
                   and not day_unrefine)

    return (date_diff, sign, one_to_zero,
            added("day"), removed("day"), added("month"), removed("month"),
            int(y1 != y2), diff_day, diff_month)
