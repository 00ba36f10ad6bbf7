"""The reference's rule-driven tagging lifecycle
(`POST /api/facet/loader/load`, SURVEY.md §3.2) as one Spark job.

Reference steps (``facet/FacetLoaderService.java:135-235``): upsert
facet tree, compute effective expression groups with parent
cross-product inheritance, canonicalize + SHA-256 hash each facet's
groups, clear + re-map only facets whose hash changed, stream every
leaf concept past every leaf rule, roll parent mappings up bottom-up,
report per-facet counts.

Engine re-expression: rules are driver-side data compiled to boolean
Columns; tagging is ONE projection over the concept DataFrame (no per
row Python, no cross join); change detection compares canonical rule
hashes against the previous run's stored hashes and skips unchanged
facets' re-mapping exactly like the reference (idempotent re-POST).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict

from pyspark.sql import DataFrame

from picsure_dictionary_etl_spark.operators.facets import (
    FacetRule,
    inherit_groups,
    rollup_parents,
    tag_concepts,
)


def rule_hash(rule: FacetRule) -> str:
    """Canonical sorted-key JSON -> SHA-256 (the reference's
    change-detection hash, ``FacetLoaderService.java:325-343,451-464``)."""
    canon = json.dumps(
        [[asdict(e) for e in group] for group in rule.groups], sort_keys=True
    )
    return hashlib.sha256(canon.encode()).hexdigest()


def load_facets(
    concepts: DataFrame,
    rules: dict[str, FacetRule],
    previous_hashes: dict[str, str] | None = None,
    previous_mappings: DataFrame | None = None,
    path_col: str = "concept_path",
) -> tuple[DataFrame, dict[str, str], dict]:
    """Tag concepts with facets; returns (mappings, new_hashes, report).

    Reference semantics (``FacetLoaderService.java:135-235``): EVERY
    leaf facet is re-evaluated against EVERY concept on each load
    (``singlePassMapLeaves`` with ON CONFLICT DO NOTHING — so concepts
    added since the last run map into unchanged facets too); the hash
    comparison only decides which facets get their previous mappings
    CLEARED first. Unchanged facets union their previous mappings with
    the fresh tags — the reference's no-op suppression (D9), which makes
    re-posting the same payload a cheap no-op.
    """
    effective = inherit_groups(rules)
    new_hashes = {name: rule_hash(r) for name, r in effective.items()}
    previous_hashes = previous_hashes or {}

    changed = [n for n, h in new_hashes.items() if previous_hashes.get(n) != h]
    unchanged = [n for n in new_hashes if n not in set(changed)]

    if previous_mappings is not None and unchanged:
        from pyspark.sql import functions as F

        # the *clear* step: changed facets drop their previous mappings,
        # unchanged facets keep theirs (stale rows persist — reference
        # behavior, FacetLoaderClearIntegrationTest.java:82-194)
        kept = previous_mappings.filter(F.col("facet").isin(unchanged))
    else:
        kept = None
        changed = list(new_hashes)
        unchanged = []

    # only LEAF facets are expression-mapped (the reference's
    # singlePassMapLeaves streams leaf specs only,
    # ``FacetLoaderService.java:387-420``); parents receive the rolled-up
    # union of their children. ALL leaves re-tag every load — tagging is
    # one codegen'd projection, so skipping buys nothing and would miss
    # concepts added since the last run.
    parents = {r.parent for r in rules.values() if r.parent}
    fresh = tag_concepts(
        concepts, [effective[n] for n in effective if n not in parents], path_col
    )
    mappings = fresh if kept is None else kept.unionByName(fresh).distinct()
    mappings = rollup_parents(mappings, rules)

    from pyspark.sql import functions as F

    counts = {
        r["facet"]: r["n"]
        for r in mappings.groupBy("facet").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report = {
        "facets_total": len(new_hashes),
        "facets_remapped": sorted(changed),
        "facets_skipped_unchanged": sorted(unchanged),
        "mapping_counts": counts,
    }
    return mappings, new_hashes, report
