"""Diff / anti-join / change-detection operators (SURVEY.md §2.D9-D11, §2.E2).

Reference: "what's new" anti-joins (``dataset/DatasetRepository.java:23-32``),
obsolete-row diffs (``concept/ConceptController.java:147-202``), and
SHA-256 change-detection hashes that suppress no-op writes
(``facet/FacetLoaderService.java:325-343``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.functions.columns import canonical_json_hash


def new_rows(incoming: DataFrame, existing: DataFrame, key_cols: list[str]) -> DataFrame:
    """D10: rows of ``incoming`` whose key is absent from ``existing``
    (insert-only semantics — existing rows never updated)."""
    return incoming.join(existing.select(*key_cols).distinct(), key_cols, "left_anti")


def obsolete_rows(existing: DataFrame, incoming: DataFrame, key_cols: list[str]) -> DataFrame:
    """E2/H5: rows of ``existing`` no longer present in ``incoming`` —
    the delete set of a full-state diff."""
    return existing.join(incoming.select(*key_cols).distinct(), key_cols, "left_anti")


def changed_rows(
    incoming: DataFrame, existing: DataFrame, key_cols: list[str], payload_cols: list[str]
) -> DataFrame:
    """D9 no-op suppression: join on key, keep rows whose canonical
    payload hash differs — unchanged rows skip the MERGE entirely.
    Payload columns are hashed in sorted-name order (the reference's
    canonical sorted-key JSON, ``FacetLoaderService.java:62``)."""
    cols = sorted(payload_cols)
    h = lambda side: canonical_json_hash(*[F.col(f"{side}.{c}").alias(c) for c in cols])  # noqa: E731
    inc, ex = incoming.alias("i"), existing.alias("e")
    cond = [F.col(f"i.{k}") == F.col(f"e.{k}") for k in key_cols]
    return (
        inc.join(ex, cond, "left")
        .filter(F.col(f"e.{key_cols[0]}").isNull() | (h("i") != h("e")))
        .select("i.*")
    )
