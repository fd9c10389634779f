"""Cleanroom second implementation of the reference diff semantics.

This package exists so the kg_* golden oracle does NOT share its parse/diff
kernels with the engine (`widiff_spark.parse` / `widiff_spark.diff` /
`widiff_spark.revert`): it re-implements the reference's per-page
change-extraction pipeline (page_parser.py + the revert tagger in
feature_creation.py) directly from the reference sources, with an
intentionally different architecture — no digest/pre-hash stage, raw
revision JSON replayed per page exactly like the reference does — so a bug
in the engine's kernels cannot silently cancel out in the oracle.

Import rule (enforced by tests/test_cleanroom.py): nothing in this package
may import from widiff_spark.
"""

from .replay import replay_corpus, replay_page  # noqa: F401
