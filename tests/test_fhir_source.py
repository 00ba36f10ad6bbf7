"""A8 FHIR paginated REST source — recorded-fixture tests mirroring
``fhir/FhirServiceTest.java`` (mocked WebClient -> injected fetch_page)."""

import pytest

from picsure_dictionary_etl_spark.sources import fhir

PAGE1 = {
    "entry": [
        {"resource": {"id": "phs000001.v1.p1", "description": "Study one",
                      "extension": [
                          {"url": "https://x/StructureDefinition/study-focus",
                           "valueString": "oncology"},
                          {"url": "https://x/ignored-url", "valueString": "zzz"},
                      ]}},
        {"resource": {"id": "phs000002.v2.p1", "description": "",
                      "extension": None}},
    ],
    "link": [{"relation": "self", "url": "https://fhir/rs?_count=2"},
             {"relation": "next", "url": "https://fhir/rs?_count=2&page=2"}],
}
PAGE2 = {
    "entry": [
        {"resource": {"id": "other-study", "description": "Not phs",
                      "extension": [
                          {"url": "https://x/StructureDefinition/study-design",
                           "valueString": "cohort"}]}},
        {"resource": None},
    ],
    "link": [{"relation": "self", "url": "https://fhir/rs?_count=2&page=2"}],
}
URL_TO_KEY = {"study-focus": "focus", "study-design": "design"}


def _fetch(calls):
    def f(url):
        calls.append(url)
        return PAGE2 if "page=2" in url else PAGE1
    return f


def test_pager_follows_next_links_and_count_param():
    calls = []
    studies = fhir.fetch_research_studies(
        "https://fhir/rs", page_size=2, fetch_page=_fetch(calls))
    assert calls[0] == "https://fhir/rs?_count=2"
    assert len(calls) == 2  # stopped when no next link
    # null resources dropped, all pages concatenated
    assert [s["id"] for s in studies] == [
        "phs000001.v1.p1", "phs000002.v2.p1", "other-study"]


def test_pager_detects_next_link_cycle():
    cyclic = {"entry": [], "link": [{"relation": "next", "url": "https://fhir/rs?x"}]}
    with pytest.raises(RuntimeError, match="cycle"):
        fhir.fetch_research_studies(
            "https://fhir/rs", fetch_page=lambda u: cyclic, max_pages=5)


def test_studies_df_and_metadata_mapping(spark):
    studies = fhir.research_studies_df(
        spark,
        fhir.fetch_research_studies("https://fhir/rs", fetch_page=_fetch([])),
    )
    assert studies.count() == 3
    refs = {r["study_id"]: r["ref"] for r in studies.collect()}
    assert refs["phs000001.v1.p1"] == "phs000001"

    meta = fhir.dataset_metadata_updates(studies, URL_TO_KEY).collect()
    got = {(r["ref"], r["key"]): r["value"] for r in meta}
    # suffix-matched urls map to keys; unmapped urls drop
    assert got == {("phs000001", "focus"): "oncology",
                   ("other-study", "design"): "cohort"}

    phs = sorted(r["phs"] for r in fhir.distinct_phs_values(studies).collect())
    assert phs == ["phs000001", "phs000002"]


def test_update_only_merge_against_lake_tables(spark, tmp_path):
    """updateDatasetMetadata semantics: existing datasets only, blank
    descriptions preserved, metadata add-or-update by (ref, key)."""
    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.lake.merge import merge_into, resolve_live
    from picsure_dictionary_etl_spark.lake.table import LakeTable

    ds_schema = T.StructType([
        T.StructField("ref", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    md_schema = T.StructType([
        T.StructField("ref", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    ds = LakeTable.create(spark, str(tmp_path / "ds"), schema=ds_schema,
                          key_cols=["ref"], bucket_count=2)
    md = LakeTable.create(spark, str(tmp_path / "md"), schema=md_schema,
                          key_cols=["ref", "key"], bucket_by=["ref"], bucket_count=2)
    seed = spark.createDataFrame(
        [("phs000001", "old desc", "I", 1), ("phs000002", "keep me", "I", 2)],
        ds_schema)
    merge_into(ds, seed, "seed")
    merge_into(md, spark.createDataFrame(
        [("phs000001", "focus", "stale", "I", 1)], md_schema), "seed")

    studies = fhir.research_studies_df(
        spark,
        fhir.fetch_research_studies("https://fhir/rs", fetch_page=_fetch([])),
    )
    fhir.apply_fhir_updates(ds, md, studies, URL_TO_KEY, "fhir1", lsn=10)

    live_ds = {r["ref"]: r["description"] for r in resolve_live(
        ds.read(), ["ref"], ["description"]).collect()}
    # phs000001 updated; phs000002's blank FHIR description preserved;
    # 'other-study' NOT inserted (matched_only / the reference's 404)
    assert live_ds == {"phs000001": "Study one", "phs000002": "keep me"}

    live_md = {(r["ref"], r["key"]): r["value"] for r in resolve_live(
        md.read(), ["ref", "key"], ["value"]).collect()}
    # existing row updated, new (ref,key) inserted (add-or-update)
    assert live_md == {("phs000001", "focus"): "oncology",
                       ("other-study", "design"): "cohort"}


def test_fhir_metrics_accurate_and_redelivery_is_zero(spark, tmp_path):
    """datasets_updated counts DISTINCT matched datasets (the
    reference's set semantics); a redelivered batch id reports 0."""
    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.lake.merge import merge_into
    from picsure_dictionary_etl_spark.lake.table import LakeTable

    ds_schema = T.StructType([
        T.StructField("ref", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    md_schema = T.StructType([
        T.StructField("ref", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    ds = LakeTable.create(spark, str(tmp_path / "ds2"), schema=ds_schema,
                          key_cols=["ref"], bucket_count=2)
    md = LakeTable.create(spark, str(tmp_path / "md2"), schema=md_schema,
                          key_cols=["ref", "key"], bucket_by=["ref"],
                          bucket_count=2)
    merge_into(ds, spark.createDataFrame(
        [("phs000001", "d", "I", 1)], ds_schema), "seed")

    studies = fhir.research_studies_df(
        spark,
        fhir.fetch_research_studies("https://fhir/rs", fetch_page=_fetch([])),
    )
    m1 = fhir.apply_fhir_updates(ds, md, studies, URL_TO_KEY, "f1", lsn=10)
    # only phs000001 exists; phs000002/other-study are unmatched
    assert m1["datasets_updated"] == 1
    assert m1["metadata_updated"] == 2  # focus + design rows
    m2 = fhir.apply_fhir_updates(ds, md, studies, URL_TO_KEY, "f1", lsn=10)
    assert m2 == {"datasets_updated": 0, "metadata_updated": 0}


# ---------- HTTP edge: fault-injecting pager doubles (no endpoint) ----------


class _FaultPager:
    """Scripted fetch double: pops the next behavior per call.
    Behaviors: a dict (bundle returned) or an exception (raised)."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def __call__(self, url):
        self.calls.append(url)
        step = self.script.pop(0)
        if isinstance(step, BaseException):
            raise step
        return step


def _http_error(code, retry_after=None):
    import email.message
    import urllib.error

    headers = email.message.Message()
    if retry_after is not None:
        headers["Retry-After"] = str(retry_after)
    return urllib.error.HTTPError("http://x", code, "err", headers, None)


def _bundle(ids, next_url=None):
    b = {"entry": [{"resource": {"id": i}} for i in ids]}
    if next_url:
        b["link"] = [{"relation": "next", "url": next_url}]
    return b


def test_transient_5xx_retries_with_backoff():
    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    pager = _FaultPager([
        _http_error(503), _http_error(502), _bundle(["a"], "p2"),
        TimeoutError("read timed out"), _bundle(["b"]),
    ])
    sleeps = []
    got = fetch_research_studies(
        "http://x/Bundle", fetch_page=pager, backoff_s=0.1,
        sleep=sleeps.append)
    assert [r["id"] for r in got] == ["a", "b"]
    # exponential per page, attempt counter resets between pages
    assert sleeps == [0.1, 0.2, 0.1]
    assert len(pager.calls) == 5


def test_429_honors_retry_after():
    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    pager = _FaultPager([_http_error(429, retry_after=7), _bundle(["a"])])
    sleeps = []
    got = fetch_research_studies(
        "http://x/Bundle", fetch_page=pager, backoff_s=0.1,
        sleep=sleeps.append)
    assert [r["id"] for r in got] == ["a"]
    assert sleeps == [7.0]  # server ask wins over the 0.1 backoff


def test_retries_exhausted_raises_last_error():
    import pytest

    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    pager = _FaultPager([TimeoutError(f"t{i}") for i in range(4)])
    with pytest.raises(TimeoutError, match="t3"):
        fetch_research_studies(
            "http://x/Bundle", fetch_page=pager, retries=3,
            backoff_s=0, sleep=lambda s: None)
    assert len(pager.calls) == 4  # 1 try + 3 retries, then give up


def test_cert_verification_failure_fails_fast():
    """A broken trust store can never be fixed by retrying: both a bare
    SSLCertVerificationError and the URLError urllib wraps it in must
    fail on attempt 1 instead of burning the whole backoff budget
    (advisor finding r4). Plain network OSErrors stay retryable."""
    import ssl
    import urllib.error

    import pytest

    from picsure_dictionary_etl_spark.sources.fhir import (
        _is_transient,
        fetch_research_studies,
    )

    cert = ssl.SSLCertVerificationError("certificate verify failed")
    assert not _is_transient(cert)
    assert not _is_transient(urllib.error.URLError(cert))
    assert _is_transient(ConnectionResetError("peer reset"))
    assert _is_transient(urllib.error.URLError(ConnectionResetError()))
    assert _is_transient(urllib.error.URLError("dns lookup failed"))

    pager = _FaultPager([urllib.error.URLError(cert)])
    with pytest.raises(urllib.error.URLError):
        fetch_research_studies(
            "https://x/Bundle", fetch_page=pager,
            sleep=lambda s: (_ for _ in ()).throw(AssertionError("slept")))
    assert len(pager.calls) == 1  # no retry on config errors


def test_fatal_4xx_fails_fast():
    import pytest

    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    pager = _FaultPager([_http_error(404)])
    with pytest.raises(Exception) as ei:
        fetch_research_studies(
            "http://x/Bundle", fetch_page=pager,
            sleep=lambda s: (_ for _ in ()).throw(AssertionError("slept")))
    assert getattr(ei.value, "code", None) == 404
    assert len(pager.calls) == 1  # no retry on config errors


def test_malformed_bundle_names_url():
    import pytest

    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    pager = _FaultPager([_bundle(["a"], "http://x/p2"), ["not", "a", "bundle"]])
    with pytest.raises(ValueError, match="http://x/p2"):
        fetch_research_studies("http://x/Bundle", fetch_page=pager)


def test_malformed_entries_are_skipped_not_fatal():
    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    pager = _FaultPager([{
        "entry": [
            {"resource": {"id": "ok"}},
            "junk-string-entry",
            {"no_resource": True},
            None,
        ],
    }])
    got = fetch_research_studies("http://x/Bundle", fetch_page=pager)
    assert [r["id"] for r in got] == ["ok"]


def test_missing_next_link_ends_chain():
    from picsure_dictionary_etl_spark.sources.fhir import fetch_research_studies

    # malformed link block (no relation=next entry, junk relations)
    pager = _FaultPager([{
        "entry": [{"resource": {"id": "only"}}],
        "link": [{"relation": "self", "url": "http://x/self"}, {}],
    }])
    got = fetch_research_studies("http://x/Bundle", fetch_page=pager)
    assert [r["id"] for r in got] == ["only"]
    assert len(pager.calls) == 1
