"""Scalar Column builders — the reference's per-record Java helpers
re-expressed as reusable Catalyst expressions (SURVEY.md §2.I).

Everything here is a pure Column transformation (JVM-side, codegen'd);
nothing touches Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PATH_SEP = "\\"
MU = "µ"


def decode_mu(col: Column) -> Column:
    """µ -> backslash decode (``loading/ColumnMetaMapper.java:53``)."""
    return F.regexp_replace(col, MU, PATH_SEP + PATH_SEP)


def split_mu_list(col: Column) -> Column:
    """µ-delimited list -> array<string>; empty -> []
    (``ColumnMetaMapper.java:67-75``)."""
    return F.when(F.coalesce(col, F.lit("")) == "", F.array().cast("array<string>")).otherwise(
        F.split(col, MU)
    )


def path_segments(col: Column) -> Column:
    """Split a backslash path, dropping BLANK segments — whitespace-only
    segments too, matching the reference's ``isNotBlank`` filter
    (``facet/FacetExpressionEvaluator.java:116-118``); an empty-vs-blank
    mismatch would shift node indices for facet predicates."""
    return F.filter(F.split(col, "\\\\"), lambda s: F.trim(s) != "")


def parent_path(col: Column) -> Column:
    """Path minus its last segment (the reference stores ``parent_id``;
    with natural keys the parent path is derivable by string slicing —
    ``export/DictionaryCSVService.java:509-536``)."""
    segs = path_segments(col)
    return F.when(
        F.size(segs) > 1,
        F.concat(
            F.lit(PATH_SEP),
            F.array_join(F.slice(segs, 1, F.size(segs) - 1), PATH_SEP),
            F.lit(PATH_SEP),
        ),
    )


def trim_single_value_categorical(path: Column, categorical: Column, values: Column) -> Column:
    """B4: a categorical concept with exactly one value equal to its last
    path segment gets that segment stripped
    (``ColumnMetaMapper.java:52-65``; tested
    ``ColumnMetaMapperTest.java:89-95,131-135``)."""
    segs = path_segments(path)
    last = F.element_at(segs, -1)
    strip = categorical & (F.size(values) == 1) & (F.element_at(values, 1) == last)
    return F.when(
        strip & (F.size(segs) > 1),
        F.concat(
            F.lit(PATH_SEP),
            F.array_join(F.slice(segs, 1, F.size(segs) - 1), PATH_SEP),
            F.lit(PATH_SEP),
        ),
    ).otherwise(path)


def null_if_sentinel(col: Column) -> Column:
    """'' / 'null' -> NULL (``ColumnMetaMapper.java:22-30``)."""
    return F.when(F.lower(F.trim(col)).isin("", "null"), F.lit(None)).otherwise(col)


def try_double(col: Column) -> Column:
    """Double parse with sentinel-null fallback (``ColumnMetaMapper.java:77-88``)."""
    return null_if_sentinel(col).try_cast("double")


def canonical_json_hash(*cols: Column) -> Column:
    """SHA-256 of a canonical (field-ordered) JSON rendering — the
    reference's change-detection hash (``facet/FacetLoaderService.java:325-343,451-464``).
    Struct field order is the canonical order; callers pass columns
    sorted by name."""
    return F.sha2(F.to_json(F.struct(*cols)), 256)


def row_md5(*cols: Column) -> Column:
    """md5 over a null-safe concatenation — the reference's natural-key
    hash index (``schema.sql:46-47``)."""
    return F.md5(F.concat_ws("", *[F.coalesce(c.cast("string"), F.lit("<null>")) for c in cols]))
