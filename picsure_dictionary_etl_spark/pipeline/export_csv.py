"""Reference-layout full-dictionary export + re-ingest (SURVEY.md §3.3).

Emits the reference's six related CSVs — Datasets / Consents /
Facet_Categories / Facets / Concepts / Facet_Concept_Lists — from a
:class:`DictionaryState` of DataFrames, and re-ingests an exported
directory back into an equal state (the round-trip contract of
``export/DictionaryCSVServiceTest.java:105-179``).

Layout parity (``export/DictionaryCSVService.java``):

* fixed leading columns per file, then one column per *sorted* metadata
  key (EAV side tables pivoted wide, ``:439-485``);
* ``\\`` -> ``\\\\`` escaping on concept paths (``:528,538``);
* ``values`` rendered as a JSON array string (``:580-588``);
* Facet_Concept_Lists: one column per facet, concept paths listed down
  and index-aligned per dataset, datasets concatenated in ref order
  (``:274-319`` — the F3 pivot);
* dataset refs sorted (``DatasetService.getAllDatasetRefsSorted``).

Scale notes: each CSV is produced by one declarative plan (pivot +
broadcast joins); the reference's per-dataset partial files + merge
thread are exactly Spark's partitioned CSV write + the A11 single-file
merge in :func:`write_merged_csv` (driver-side concat of part files in
partition order — after a global sort those are range-ordered, so the
merged file is globally ordered). At a 100 TB dictionary you would keep
the partitioned output and skip the merge; the merge is the final
small-result step, like the reference's.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.operators.pivots import eav_pivot, melt

ESCAPED = {"concept_path", "parent_concept_path"}


@dataclass
class DictionaryState:
    """The dictionary's six-entity relational state as DataFrames.

    Metadata side tables are EAV (id, key, value) — the export pivots
    them wide; the ingest melts them back.
    """

    datasets: DataFrame  # ref, full_name, abbreviation, description
    dataset_meta: DataFrame  # ref, key, value
    consents: DataFrame  # dataset_ref, consent_code, description,
    #                      participant_count, variable_count, sample_count, authz
    concepts: DataFrame  # dataset_ref, name, display, concept_type,
    #                      concept_path, parent_concept_path, values array<string>
    concept_meta: DataFrame  # concept_path, key, value
    facet_categories: DataFrame  # name, display, description
    facet_category_meta: DataFrame  # name, key, value
    facets: DataFrame  # facet_category, facet_name, display_name, description, parent_name
    facet_meta: DataFrame  # facet_name, key, value
    facet_mappings: DataFrame  # facet, concept_path, dataset_ref


def _escape_path(c):
    return F.replace(c, F.lit("\\"), F.lit("\\\\"))


def _unescape_path(c):
    return F.replace(c, F.lit("\\\\"), F.lit("\\"))


def write_merged_csv(df: DataFrame, path: str) -> None:
    """A11 single-file CSV merge (``Utility/CSVUtility.java:141-156``):
    Spark writes partitioned (header-less) part files; the driver
    concatenates them in partition order under one header line. After an
    ``orderBy`` the partitions are range-ordered, so order survives."""
    tmp = path + "._parts"
    # escape='"' -> RFC4180 doubled quotes, the reference's opencsv
    # dialect (Spark's default backslash-escape would also mangle the
    # backslash-heavy concept paths)
    (
        df.write.mode("overwrite")
        .option("header", False)
        .option("emptyValue", "")
        .option("escape", '"')
        .csv(tmp)
    )
    parts = sorted(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".csv")
    )
    header = ",".join(
        f'"{c}"' if ("," in c or '"' in c) else c for c in df.columns
    )
    with open(path, "w") as out:
        out.write(header + "\n")
        for p in parts:
            with open(os.path.join(tmp, p)) as f:
                shutil.copyfileobj(f, out)
    shutil.rmtree(tmp)


def _meta_keys(meta: DataFrame) -> list[str]:
    """Sorted distinct metadata keys — the dynamic header derivation
    (C8 + G2, ``DictionaryCSVService.java:455,470,482``)."""
    return sorted(r[0] for r in meta.select("key").distinct().collect())


def _with_meta(base: DataFrame, meta: DataFrame, id_col: str, keys: list[str]) -> DataFrame:
    if not keys:
        return base
    wide = eav_pivot(meta, id_col, "key", "value", keys)
    return base.join(F.broadcast(wide), id_col, "left")


def generate_full_ingest_csvs(state: DictionaryState, out_dir: str) -> dict[str, str]:
    """Write the six reference-layout CSVs; returns {name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}

    # Datasets.csv ---------------------------------------------------------
    dk = _meta_keys(state.dataset_meta)
    ds = _with_meta(state.datasets, state.dataset_meta, "ref", dk).select(
        "ref", "full_name", "abbreviation", "description", *dk
    ).orderBy("ref")
    paths["Datasets.csv"] = os.path.join(out_dir, "Datasets.csv")
    write_merged_csv(ds, paths["Datasets.csv"])

    # Consents.csv ---------------------------------------------------------
    cons = state.consents.select(
        "dataset_ref",
        "consent_code",
        "description",
        F.col("participant_count").alias("participant count"),
        F.col("variable_count").alias("variable count"),
        F.col("sample_count").alias("sample count"),
        "authz",
    ).orderBy("dataset_ref", "consent_code")
    paths["Consents.csv"] = os.path.join(out_dir, "Consents.csv")
    write_merged_csv(cons, paths["Consents.csv"])

    # Facet_Categories.csv -------------------------------------------------
    fck = _meta_keys(state.facet_category_meta)
    fc = _with_meta(state.facet_categories, state.facet_category_meta, "name", fck).select(
        F.col("name").alias("name(unique)"),
        F.col("display").alias("display name"),
        "description",
        *fck,
    ).orderBy("name(unique)")
    paths["Facet_Categories.csv"] = os.path.join(out_dir, "Facet_Categories.csv")
    write_merged_csv(fc, paths["Facet_Categories.csv"])

    # Facets.csv -----------------------------------------------------------
    fk = _meta_keys(state.facet_meta)
    fx = _with_meta(state.facets, state.facet_meta, "facet_name", fk).select(
        "facet_category",
        F.col("facet_name").alias("facet_name(unique)"),
        "display_name",
        "description",
        "parent_name",
        *fk,
    ).orderBy("facet_category", "facet_name(unique)")
    paths["Facets.csv"] = os.path.join(out_dir, "Facets.csv")
    write_merged_csv(fx, paths["Facets.csv"])

    # Concepts.csv ---------------------------------------------------------
    ck = _meta_keys(state.concept_meta)
    concepts = state.concepts.select(
        "dataset_ref",
        "name",
        "display",
        "concept_type",
        _escape_path(F.col("concept_path")).alias("concept_path"),
        _escape_path(F.coalesce("parent_concept_path", F.lit(""))).alias(
            "parent_concept_path"
        ),
        # categorical values as a JSON array string; blank when none
        F.when(F.size("values") > 0, F.to_json("values")).otherwise(F.lit("")).alias(
            "values"
        ),
        F.col("concept_path").alias("_raw_path"),
    )
    concepts = _with_meta(
        concepts, state.concept_meta.withColumnRenamed("concept_path", "_raw_path"),
        "_raw_path", ck,
    ).drop("_raw_path")
    concepts = concepts.select(
        "dataset_ref", "name", "display", "concept_type", "concept_path",
        "parent_concept_path", "values", *ck,
    ).orderBy("dataset_ref", "concept_path")
    paths["Concepts.csv"] = os.path.join(out_dir, "Concepts.csv")
    write_merged_csv(concepts, paths["Concepts.csv"])

    # Facet_Concept_Lists.csv ----------------------------------------------
    # header order = Facets.csv row order (facetNameToPosition, :143-147)
    facet_names = [
        r["facet_name"]
        for r in state.facets.select("facet_category", "facet_name")
        .orderBy("facet_category", "facet_name")
        .collect()
    ]
    from pyspark.sql import Window

    w = Window.partitionBy("dataset_ref", "facet").orderBy("concept_path")
    lists = (
        state.facet_mappings.withColumn("_rn", F.row_number().over(w))
        .groupBy("dataset_ref", "_rn")
        .pivot("facet", facet_names)
        .agg(F.first(_escape_path(F.col("concept_path"))))
        .orderBy("dataset_ref", "_rn")
        .drop("dataset_ref", "_rn")
    )
    paths["Facet_Concept_Lists.csv"] = os.path.join(out_dir, "Facet_Concept_Lists.csv")
    write_merged_csv(lists, paths["Facet_Concept_Lists.csv"])
    return paths


def ingest_full_csvs(spark: SparkSession, in_dir: str) -> DictionaryState:
    """Read an exported directory back into a :class:`DictionaryState` —
    the re-POST half of the round trip (``FullIngestRequest``). Metadata
    columns melt back to EAV with blanks dropped
    (``Utility/CSVUtility.java:38-49``)."""

    def rd(name: str) -> DataFrame:
        return (
            spark.read.option("header", True)
            .option("escape", '"')
            .csv(os.path.join(in_dir, name))
        )

    fixed_ds = ["ref", "full_name", "abbreviation", "description"]
    ds = rd("Datasets.csv")
    dataset_meta = melt(ds, ["ref"], [c for c in ds.columns if c not in fixed_ds])
    datasets = ds.select(*fixed_ds)

    cons = rd("Consents.csv").select(
        "dataset_ref",
        "consent_code",
        "description",
        F.col("participant count").cast("long").alias("participant_count"),
        F.col("variable count").cast("long").alias("variable_count"),
        F.col("sample count").cast("long").alias("sample_count"),
        "authz",
    )

    fixed_fc = ["name(unique)", "display name", "description"]
    fc = rd("Facet_Categories.csv")
    facet_category_meta = melt(
        fc.withColumnRenamed("name(unique)", "name"),
        ["name"],
        [c for c in fc.columns if c not in fixed_fc],
    )
    facet_categories = fc.select(
        F.col("name(unique)").alias("name"),
        F.col("display name").alias("display"),
        "description",
    )

    fixed_fx = [
        "facet_category", "facet_name(unique)", "display_name", "description", "parent_name",
    ]
    fx = rd("Facets.csv")
    facet_meta = melt(
        fx.withColumnRenamed("facet_name(unique)", "facet_name"),
        ["facet_name"],
        [c for c in fx.columns if c not in fixed_fx],
    )
    facets = fx.select(
        "facet_category",
        F.col("facet_name(unique)").alias("facet_name"),
        "display_name",
        "description",
        "parent_name",
    )

    fixed_c = [
        "dataset_ref", "name", "display", "concept_type", "concept_path",
        "parent_concept_path", "values",
    ]
    co = rd("Concepts.csv")
    co = co.withColumn("concept_path", _unescape_path(F.col("concept_path"))).withColumn(
        "parent_concept_path", _unescape_path(F.col("parent_concept_path"))
    )
    concept_meta = melt(co, ["concept_path"], [c for c in co.columns if c not in fixed_c])
    concepts = co.select(
        "dataset_ref",
        "name",
        "display",
        "concept_type",
        "concept_path",
        "parent_concept_path",
        F.coalesce(
            F.from_json("values", "array<string>"), F.array().cast("array<string>")
        ).alias("values"),
    )

    # Facet_Concept_Lists: every non-null cell is one (facet, path) mapping
    fl = rd("Facet_Concept_Lists.csv")
    pairs = melt(fl.withColumn("_rid", F.monotonically_increasing_id()), ["_rid"],
                 list(fl.columns))
    facet_mappings = pairs.select(
        F.col("key").alias("facet"),
        _unescape_path(F.col("value")).alias("concept_path"),
    ).withColumn(
        # dataset ref = the path's root segment (natural-key recovery)
        "dataset_ref",
        F.element_at(F.split(F.col("concept_path"), "\\\\"), 2),
    )

    return DictionaryState(
        datasets=datasets,
        dataset_meta=dataset_meta,
        consents=cons,
        concepts=concepts,
        concept_meta=concept_meta,
        facet_categories=facet_categories,
        facet_category_meta=facet_category_meta,
        facets=facets,
        facet_meta=facet_meta,
        facet_mappings=facet_mappings,
    )
