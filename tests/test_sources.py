"""Source tests — fixture rows are shaped like the reference's
``test/resources/columnMeta.csv`` (FIXTURES.md §2.1)."""

import os

from picsure_dictionary_etl_spark.sources.csv import (
    read_column_meta,
    read_ideal_ingest_csv,
    read_tsv,
)

COLUMN_META_ROWS = """SUBJECT_ID\\,8,0,false,,2.0,41472.0,0,380670,9999,9999
\\demographics\\AGE\\,8,0,false,,0.0,85.0,380670,761347,9999,9999
\\demographics\\SEX\\female\\,6,0,true,female,null,null,3664589,3885367,5114,5114
\\examination\\dates\\,8,0,true,2024-01-01µ2024-02-01,null,null,0,10,5,5,TRUE
\\open\\1000 GENOMES\\,5,0,true,FALSEµTRUE,null,null,0,161970,4977,4977
"""


def test_read_column_meta(spark, tmp_path):
    p = tmp_path / "cm.csv"
    p.write_text(COLUMN_META_ROWS)
    typed, dead = read_column_meta(spark, str(p))
    rows = {r["concept_path"]: r for r in typed.collect()}
    assert dead.count() == 0
    assert len(rows) == 5
    # continuous row: doubles parsed
    age = rows["\\demographics\\AGE\\"]
    assert age["min"] == 0.0 and age["max"] == 85.0 and not age["categorical"]
    # single-value categorical path trim (ColumnMetaMapper.java:52-65)
    assert "\\demographics\\SEX\\" in rows
    sex = rows["\\demographics\\SEX\\"]
    assert sex["categorical"] and sex["category_values"] == ["female"]
    assert sex["min"] is None  # 'null' sentinel
    # µ-list of dates + optional col 11 timestamp flag
    ex = rows["\\examination\\dates\\"]
    assert ex["category_values"] == ["2024-01-01", "2024-02-01"]
    assert ex["is_timestamp"] is True
    # multi-value categorical keeps its path
    assert rows["\\open\\1000 GENOMES\\"]["category_values"] == ["FALSE", "TRUE"]
    # optional columns typed
    assert age["observation_count"] == 9999


def test_read_tsv(spark, tmp_path):
    p = tmp_path / "s.tsv"
    p.write_text("ref\tname\nphs001\tStudy One\n")
    df = read_tsv(spark, str(p))
    assert df.columns == ["ref", "name"]
    assert df.collect()[0]["name"] == "Study One"


def test_ideal_ingest_extra_columns_melt(spark, tmp_path):
    p = tmp_path / "ideal.csv"
    p.write_text(
        "dataset_ref,full_name,extra_a,extra_b\n"
        "d1,Dataset One,va,vb\n"
        "d2,Dataset Two,,vb2\n"
    )
    core, meta = read_ideal_ingest_csv(spark, str(p), ["dataset_ref", "full_name"])
    assert sorted(core.columns) == ["dataset_ref", "full_name"]
    m = {(r["dataset_ref"], r["key"]): r["value"] for r in meta.collect()}
    # blanks dropped (CSVUtility.java:38-49)
    assert m == {
        ("d1", "extra_a"): "va",
        ("d1", "extra_b"): "vb",
        ("d2", "extra_b"): "vb2",
    }


def test_column_meta_corrupt_rows_routed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    # row 2: non-numeric min/max (the reference's Double.parseDouble
    # failure mode); row 3: missing path
    p.write_text(
        "\\ok\\,8,0,false,,1,2,0,1\n"
        "a,b,c,d,e,f,g,h,i,j,k,l\n"
        ",8,0,false,,1,2,0,1\n"
    )
    typed, dead = read_column_meta(spark, str(p))
    assert typed.count() == 1
    # malformed rows land in the dead letter, scan continues (A2)
    assert dead.count() == 2
