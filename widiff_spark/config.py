"""Pipeline configuration (analog of the reference's setup.yml)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # rule-based re-labeling of changes (reference setup.yml:30, page_parser.py:388-407)
    re_interpretation: bool = True
    # emit datatype_metadata_change rows (reference setup.yml per-cohort flags;
    # we default on — the table exists in the schema family)
    extract_datatype_metadata: bool = True
    # revert-pairing window (reference setup.yml:28-29)
    time_threshold_seconds: int = 2419200
    # 'less' cohort threshold on num_value_changes (reference setup.yml:24)
    less_threshold: int = 10
    # compute per-UPDATE ML feature tables (reference setup.yml feature_extraction)
    extract_features: bool = True


DEFAULT_CONFIG = PipelineConfig()
