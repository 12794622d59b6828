"""Pattern-config model: the declarative rule surface of the engine.

Mirrors the reference's ``config/relationship_patterns.json`` shape
(loaded by ``pattern_config.py:84-154`` in /root/reference/
bigquery-to-erd): global PK/FK column indicators, per-table-prefix
pattern lists, and filtering rules. ``DEFAULT`` replicates the shipped
config exactly — the hardcoded lists the compiler used before live here
now — and ``from_json`` / ``from_dict`` accept user configs in the
reference's own file format, so a reference user's custom
``relationship_patterns.json`` drops in unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PatternConfig:
    """Classification + filtering rule set (wildcards use ``*``)."""

    pk_indicators: tuple[str, ...]
    fk_indicators: tuple[str, ...]
    # prefix -> {"pk": [...], "fk": [...]} (methodologies merged per
    # prefix, as get_patterns_for_table does by collecting all matches)
    table_patterns: dict[str, dict[str, tuple[str, ...]]] = field(
        default_factory=dict)
    max_relationships_per_table: int = 3
    min_confidence_threshold: float = 0.5
    preferred_detection_methods: tuple[str, ...] = (
        "enhanced_pk_fk", "data_vault_pattern")

    @classmethod
    def from_dict(cls, data: dict) -> "PatternConfig":
        cp = data.get("column_patterns", {})
        merged: dict[str, dict[str, list[str]]] = {}
        for _meth, group in data.get("table_patterns", {}).items():
            for _name, pat in group.get("patterns", {}).items():
                prefix = pat.get("prefix", "")
                if not prefix:
                    continue
                slot = merged.setdefault(prefix, {"pk": [], "fk": []})
                for p in pat.get("primary_key_patterns", []):
                    if p not in slot["pk"]:
                        slot["pk"].append(p)
                for p in pat.get("foreign_key_patterns", []):
                    if p not in slot["fk"]:
                        slot["fk"].append(p)
        filt = data.get("filtering_rules", {})
        return cls(
            pk_indicators=tuple(cp.get("primary_key_indicators", [])),
            fk_indicators=tuple(cp.get("foreign_key_indicators", [])),
            table_patterns={
                k: {"pk": tuple(v["pk"]), "fk": tuple(v["fk"])}
                for k, v in merged.items()},
            max_relationships_per_table=filt.get(
                "max_relationships_per_table", 5),
            min_confidence_threshold=filt.get(
                "min_confidence_threshold", 0.3),
            preferred_detection_methods=tuple(
                filt.get("preferred_detection_methods", [])),
        )

    @classmethod
    def from_json(cls, path: str) -> "PatternConfig":
        with open(path, encoding="utf-8") as f:
            return cls.from_dict(json.load(f))


# the shipped config (config/relationship_patterns.json in the
# reference), methodologies merged per prefix
DEFAULT = PatternConfig(
    pk_indicators=(
        "id", "key", "pk", "sk", "surrogate_key", "business_key", "bk",
        "hash_key", "hk", "hub_key", "dim_key", "dk", "link_key", "lk",
        "ref_key", "rk"),
    fk_indicators=(
        "*_id", "*_key", "*_fk", "*_hk", "*_hash_key", "hub_key", "hk"),
    table_patterns={
        "h_": {"pk": ("id", "key", "business_key", "bk", "hash_key",
                      "hk", "hub_key"),
               "fk": ()},
        "dim_": {"pk": ("id", "key", "sk", "surrogate_key", "dim_key",
                        "dk", "hash_key", "hk", "dim_hash_key", "*_id"),
                 "fk": ("*_id", "*_hk", "*_hash_key", "*_fk")},
        "l_": {"pk": ("id", "key", "link_key", "lk", "hash_key", "hk",
                      "link_hash_key"),
               "fk": ("*_hk", "*_hash_key", "hub_key", "hk")},
        "ref_": {"pk": ("id", "key", "ref_key", "rk", "*_code", "*_id"),
                 "fk": ()},
        "fact_": {"pk": ("id", "key", "*_id"), "fk": ("*_id", "*_fk")},
        "bridge_": {"pk": ("id", "key", "relationship_id"),
                    "fk": ("*_id", "*_fk")},
    },
    max_relationships_per_table=3,
    min_confidence_threshold=0.5,
    preferred_detection_methods=("enhanced_pk_fk", "data_vault_pattern"),
)
