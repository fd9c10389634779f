"""Pure-Python ML feature batteries (F8-F18) — reference parity.

Each function maps the *serialized* old/new values of one UPDATE change row
to a feature tuple; reference scripts/feature_creation.py:123-798.  They are
applied Arrow-batch-wise from features.py (never row-at-a-time through the
Py4J boundary).
"""

from __future__ import annotations

import json
import math
import os
import re

_SPECIAL = re.compile(r"[^a-zA-Z0-9]")
_WS = ("\\n", "\r", "\n", "\t")


def _trim_common(a: str, b: str) -> tuple[str, str]:
    """Strip the common prefix and suffix before an edit-distance DP.

    Safe for both the distance and this module's backtrace op counts: the
    backtrace's FIRST branch is the equality diagonal, so matching
    prefix/suffix characters contribute zero operations and the DP over the
    trimmed middle is the same sub-table.  Real edits are local (labels /
    descriptions / title prefixes change at one end), so this turns the
    O(m*n) DP into O(changed_region^2) — the kg_features profiling hotspot."""
    p = 0
    lim = min(len(a), len(b))
    while p < lim and a[p] == b[p]:
        p += 1
    s = 0
    lim -= p
    while s < lim and a[len(a) - 1 - s] == b[len(b) - 1 - s]:
        s += 1
    return a[p:len(a) - s], b[p:len(b) - s]


def levenshtein(a: str, b: str) -> int:
    """Two-row DP edit distance (the reference uses python-Levenshtein;
    identical metric)."""
    if a == b:
        return 0
    a, b = _trim_common(a, b)
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1,
                          prev[j - 1] + (ca != cb))
        prev = curr
    return prev[-1]


def edit_operations(old: str, new: str) -> tuple[int, int, int]:
    """(insertions, deletions, substitutions) via DP backtrace
    (feature_creation.py:246-287).  Common prefix/suffix contribute no
    operations under the equality-first backtrace, so they are trimmed
    before the quadratic DP (see _trim_common)."""
    old, new = _trim_common(old, new)
    m, n = len(old), len(new)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if old[i - 1] == new[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = 1 + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
    i, j = m, n
    ins = dels = subs = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and old[i - 1] == new[j - 1]:
            i -= 1
            j -= 1
        elif i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + 1:
            subs += 1
            i -= 1
            j -= 1
        elif j > 0 and dp[i][j] == dp[i][j - 1] + 1:
            ins += 1
            j -= 1
        else:
            dels += 1
            i -= 1
    return ins, dels, subs


def has_adjacent_swap(old: str, new: str) -> int:
    """Adjacent transposition detector (feature_creation.py:123-147)."""
    if len(old) != len(new):
        return 0
    diffs = [i for i in range(len(old)) if old[i] != new[i]]
    if len(diffs) == 2:
        i, j = diffs
        if j == i + 1 and old[i] == new[j] and old[j] == new[i]:
            return 1
    return 0


def text_features(datatype: str, old_value, new_value) -> tuple:
    """String battery (feature_creation.py:171-318).

    ``datatype='text'`` adds the extended block; ``'entity'`` returns only the
    5 shared similarity features.
    """
    new_value = str(new_value).strip().replace('"', "")
    old_value = str(old_value).strip().replace('"', "")

    old_tokens, new_tokens = set(old_value.split()), set(new_value.split())
    union = old_tokens | new_tokens
    token_overlap = (len(old_tokens & new_tokens) / len(union)) if union else 0
    old_in_new = int(old_value in new_value)
    new_in_old = int(new_value in old_value)
    max_len = max(len(old_value), len(new_value)) or 1
    lev = levenshtein(old_value.lower().strip(), new_value.lower().strip())
    edit_ratio = lev / max_len
    complete_replacement = int(token_overlap == 0 and old_in_new == 0
                               and new_in_old == 0)

    result = (token_overlap, old_in_new, new_in_old, edit_ratio,
              complete_replacement)
    if datatype != "text":
        return result

    length_diff_abs = int(abs(len(new_value) - len(old_value)))
    token_count_old = len(old_value.split())
    token_count_new = len(new_value.split())
    same_wo_special = int(_SPECIAL.sub("", old_value) == _SPECIAL.sub("", new_value))
    special_diff = len(_SPECIAL.findall(old_value)) - len(_SPECIAL.findall(new_value))
    ins, dels, subs = edit_operations(old_value, new_value)
    swap = has_adjacent_swap(old_value, new_value)
    sig_prefix = int(len(os.path.commonprefix([old_value, new_value])) >= 3)
    sig_suffix = int(len(os.path.commonprefix([old_value[::-1],
                                               new_value[::-1]])) >= 3)
    return result + (length_diff_abs, token_count_old, token_count_new, lev,
                     same_wo_special, special_diff, ins, dels, subs, swap,
                     sig_prefix, sig_suffix)


# --------------------------------------------------------------------------- #
# numeric helpers shared by quantity/globecoordinate
# (feature_creation.py:545-671)
# --------------------------------------------------------------------------- #

def _part(value, part):
    if "{" in str(value):
        return json.loads(value).get(part, None)
    return None


def _decimal_split(v):
    s = str(v)
    ndp = s.split(".")[0] if "." in s else s
    try:
        dp = s.split(".")[1] if "." in s and int(s.split(".")[1]) > 0 else "0"
    except ValueError:
        dp = "0"
    return ndp, dp


def precision_change(old_value, new_value, datatype="quantity", part=None) -> int:
    if datatype == "globecoordinate":
        if "{" in str(old_value) and "{" in str(new_value):
            old = _part(old_value, part)
            new = _part(new_value, part)
        elif isinstance(old_value, dict) and isinstance(new_value, dict):
            old = old_value.get(part)
            new = new_value.get(part)
        else:
            return 0
        old_ndp, old_dp = _decimal_split(old)
        new_ndp, new_dp = _decimal_split(new)
    else:
        old_ndp, old_dp = _decimal_split(old_value)
        new_ndp, new_dp = _decimal_split(new_value)
    if old_ndp == new_ndp and old_dp != new_dp and (old_dp != "0" or new_dp != "0"):
        return 1
    return 0


def _digits_len(v) -> int:
    return len(str(v).replace("-", "").replace("+", "").replace(".", ""))


def length_change(old_value, new_value, datatype="quantity", option="increase",
                  part=None) -> int:
    if datatype == "quantity":
        new_len, old_len = _digits_len(new_value), _digits_len(old_value)
    else:
        if "{" in str(old_value) and "{" in str(new_value):
            # .get(part, '') semantics: a falsy-but-present coordinate (0.0)
            # keeps its digits like the reference (feature_creation.py:601-
            # 604); the previous `or ""` collapsed 0.0 to '' (benign today —
            # the prefix gate masks it — but it reads differently than the
            # reference and the cleanroom fuzz compares these paths)
            new_part = _part(new_value, part)
            old_part = _part(old_value, part)
            new_len = _digits_len("" if new_part is None else str(new_part))
            old_len = _digits_len("" if old_part is None else str(old_part))
        else:
            return 0
    if option == "increase":
        return 1 if new_len > old_len else 0
    return 1 if new_len < old_len else 0


def sign_change(old_value, new_value, datatype="quantity", part=None) -> int:
    if datatype == "quantity":
        new_f, old_f = float(new_value), float(old_value)
    else:
        if "{" in str(old_value) and "{" in str(new_value):
            new_f = float(str(_part(new_value, part) or "nan"))
            old_f = float(str(_part(old_value, part) or "nan"))
        else:
            return 0
    return 1 if (old_f * new_f < 0) and (math.floor(abs(old_f))
                                         == math.floor(abs(new_f))) else 0


def containment(old_value, new_value, datatype="quantity", part=None,
                option="old_in_new") -> int:
    if datatype == "globecoordinate":
        if "{" in str(old_value) and "{" in str(new_value):
            old_value = _part(old_value, part)
            new_value = _part(new_value, part)
        else:
            return 0
    if option == "old_in_new":
        return 1 if str(new_value).startswith(str(old_value)) else 0
    if option == "new_in_old":
        return 1 if str(old_value).startswith(str(new_value)) else 0
    return 0


def same_float_value(old_value, new_value, datatype="quantity", part=None) -> int:
    if datatype == "globecoordinate":
        if "{" in str(old_value) and "{" in str(new_value):
            old_value = _part(old_value, part)
            new_value = _part(new_value, part)
        else:
            return 0
    try:
        return 1 if float(old_value) == float(new_value) else 0
    except (TypeError, ValueError):
        return 0


def quantity_features(old_value, new_value) -> tuple:
    """Quantity battery (feature_creation.py:674-718)."""
    new_value = str(new_value)
    old_value = str(old_value)
    for ch in _WS:
        new_value = new_value.replace(ch, "")
        old_value = old_value.replace(ch, "")
    old_str = old_value.replace('"', "").replace("+", "").strip()
    new_str = new_value.replace('"', "").replace("+", "").strip()

    sign = sign_change(old_str, new_str)
    precision = precision_change(old_str, new_str)
    whole = int(math.floor(abs(float(old_str))) != math.floor(abs(float(new_str))))
    old_prefix = containment(old_str, new_str, option="old_in_new")
    new_prefix = containment(old_str, new_str, option="new_in_old")
    inc = length_change(old_str, new_str, option="increase") if old_prefix else 0
    dec = length_change(old_str, new_str, option="decrease") if new_prefix else 0
    same_float = same_float_value(old_str, new_str)
    return (sign, precision, inc, dec, whole, old_prefix, new_prefix, same_float)


def globe_features(old_value, new_value) -> tuple:
    """Globecoordinate battery — the quantity battery × {latitude, longitude}
    on the JSON value (feature_creation.py:724-798)."""
    old_val = json.loads(old_value)
    new_val = json.loads(new_value)
    for part in ("latitude", "longitude"):
        s = str(new_val[part])
        for ch in _WS:
            s = s.replace(ch, "")
        new_val[part] = float(s.strip())

    lat_whole = int(math.floor(abs(new_val["latitude"]))
                    != math.floor(abs(old_val["latitude"])))
    lon_whole = int(math.floor(abs(new_val["longitude"]))
                    != math.floor(abs(old_val["longitude"])))
    lat_sign = int((float(new_val["latitude"]) * float(old_val["latitude"]) < 0)
                   and lat_whole == 0)
    lon_sign = int((float(new_val["longitude"]) * float(old_val["longitude"]) < 0)
                   and lon_whole == 0)
    lat_prec = precision_change(old_value, new_value, "globecoordinate", "latitude")
    lon_prec = precision_change(old_value, new_value, "globecoordinate", "longitude")
    lon_oin = containment(old_value, new_value, "globecoordinate", "longitude",
                          "old_in_new")
    lon_nio = containment(old_value, new_value, "globecoordinate", "longitude",
                          "new_in_old")
    lat_oin = containment(old_value, new_value, "globecoordinate", "latitude",
                          "old_in_new")
    lat_nio = containment(old_value, new_value, "globecoordinate", "latitude",
                          "new_in_old")
    lat_inc = length_change(old_value, new_value, "globecoordinate",
                            "increase", "latitude") if lat_oin else 0
    lat_dec = length_change(old_value, new_value, "globecoordinate",
                            "decrease", "latitude") if lat_nio else 0
    lon_inc = length_change(old_value, new_value, "globecoordinate",
                            "increase", "longitude") if lon_oin else 0
    lon_dec = length_change(old_value, new_value, "globecoordinate",
                            "decrease", "longitude") if lon_nio else 0
    lon_same = same_float_value(old_value, new_value, "globecoordinate", "longitude")
    lat_same = same_float_value(old_value, new_value, "globecoordinate", "latitude")
    return (lat_sign, lon_sign, lat_whole, lon_whole, lat_prec, lon_prec,
            lat_inc, lat_dec, lon_inc, lon_dec,
            lat_oin, lat_nio, lat_same, lon_oin, lon_nio, lon_same)


# --------------------------------------------------------------------------- #
# time battery (feature_creation.py:323-540)
# --------------------------------------------------------------------------- #

_TIME_CLEAN = re.compile(r"[^0-9TZ:\-]")


def _date_parts(s: str):
    cleaned = _TIME_CLEAN.sub("", str(s)).replace("Z", "")
    date_part = cleaned.split("T")[0]
    negative = date_part.startswith("-")
    if negative:
        date_part = date_part[1:]
    parts = date_part.split("-")
    if len(parts) < 3:
        raise ValueError(f"Invalid date format: {s}")
    year = int(parts[0])
    if negative:
        year = -year
    return year, int(parts[1]), int(parts[2])


def time_features(old_value, new_value) -> tuple:
    old_value = str(old_value).strip().replace('"', "")
    new_value = str(new_value).strip().replace('"', "")

    # dead-in-practice sentinel short-circuit replicated as-is
    # (feature_creation.py:331-343 checks 'some_value'/'no_value' while the
    # emitted sentinels are 'somevalue'/'novalue')
    if old_value in ("some_value", "no_value") or \
            new_value in ("some_value", "no_value"):
        return (1000, 0, 0, 0, 0, 0, 0, 1, 1, 1)

    old_date = _date_parts(old_value)
    new_date = _date_parts(new_value)
    y1, m1, d1 = old_date
    y2, m2, d2 = new_date

    try:
        date_diff = (int(abs(y2 - y1) * 365.25) + int(abs(m2 - m1) * 30.44)
                     + int(abs(d2 - d1)))
    except Exception:
        date_diff = 10000
    sign = 1 if old_value[1:] == new_value[1:] else 0

    def placeholder_to_zero():
        if y1 != y2:
            return 0
        if m1 == 1 and d1 == 1 and m2 == 0 and d2 == 0:
            return 1
        if m1 == m2 and m1 > 1 and d1 == 1 and d2 == 0:
            return 1
        if m1 == 1 and m2 == 0 and d1 == 0 and d2 == 0:
            return 1
        return 0

    def added_removed(part, change_type):
        if y1 != y2:
            return 0
        if change_type == "added":
            if part == "year" and y1 == 0 and y2 != 0:
                return 1
            if part == "month" and ((m1 == 0 and m2 > 0 and d1 == 0)
                                    or (m1 == 1 and m2 > 1 and d1 == 1
                                        and (d2 > 1 or d2 == 0))):
                return 1
            if part == "day" and ((d1 == 0 and d2 > 0)
                                  or (d1 == 1 and d2 > 1 and m1 == 1 and m2 > 1)):
                return 1
            return 0
        # removed
        if part == "year" and y1 > 0 and y2 == 0:
            return 1
        if part in ("month", "day") and m1 > 1 and d1 > 1 and m2 == 1 and d2 == 1:
            return 1
        if part == "month" and m1 > 0 and m2 == 0:
            if not (d1 == 1 and d2 == 0) and not (d1 == 0 and d2 == 0):
                return 1
        if part == "day" and d1 > 0 and d2 == 0:
            if not (d1 == 1 and d2 == 0):
                return 1
        return 0

    def part_changed(option):
        if option == "year":
            return 1 if y1 != y2 else 0
        reformat = ((m1 == 1 and d1 == 1 and d2 == 0 and m2 == 0)
                    or (m1 > 0 and m2 > 0 and m1 == m2 and d1 == 1 and d2 == 0)
                    or (m1 == 1 and m2 == 0 and d1 == 0 and d2 == 0)) and y1 == y2
        if option == "month":
            refine = ((m1 == 0 and m2 > 0 and d2 == 0)
                      or (m1 == 1 and d1 == 1 and m2 > 1 and (d2 > 1 or d2 == 0))
                      or (m1 == 0 and m2 > 0 and d1 == 0 and d2 > 0)) and y1 == y2
            unrefine = (m2 == 0 and m1 > 0) and y1 == y2
            return 1 if (m1 != m2 and not reformat and not refine
                         and not unrefine) else 0
        refine = ((d1 == 0 and d2 > 0)
                  or (d1 == 1 and d2 > 1 and m1 == 1 and m2 > 1)) and y1 == y2
        unrefine = (d2 == 0 and d1 > 0) and y1 == y2
        return 1 if (d1 != d2 and not reformat and not refine
                     and not unrefine) else 0

    return (date_diff, sign, placeholder_to_zero(),
            added_removed("day", "added"), added_removed("day", "removed"),
            added_removed("month", "added"), added_removed("month", "removed"),
            part_changed("year"), part_changed("day"), part_changed("month"))
