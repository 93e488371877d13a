"""URL / domain operator unit tests."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_extract_urls_and_domains(spark):
    from meds_transforms_spark.operators.urls import extract_urls

    df = _docs(
        spark,
        [
            (1, "see https://www.Example.com/page?q=1 and http://sub.spam.net:8080/x."),
            (2, "no links here"),
            (3, None),
        ],
    )
    out = {r.doc_id: r for r in extract_urls(df).collect()}
    assert out[1].urls == [
        "https://www.Example.com/page?q=1",
        "http://sub.spam.net:8080/x",  # trailing '.' trimmed
    ]
    assert sorted(out[1].domains) == ["example.com", "sub.spam.net"]
    assert out[2].urls == [] and out[2].domains == []
    assert out[3].urls is None and out[3].domains is None


def test_domain_stats_counts_docs_and_urls(spark):
    from meds_transforms_spark.operators.urls import domain_stats

    df = _docs(
        spark,
        [
            (1, "https://a.com/x https://a.com/y https://b.com/"),
            (2, "https://www.a.com/z"),
        ],
    )
    stats = {r.domain: (r.n_docs, r.n_urls) for r in domain_stats(df).collect()}
    assert stats["a.com"] == (2, 3)
    assert stats["b.com"] == (1, 1)


def test_filter_blocked_domains_literal_and_subdomains(spark):
    from meds_transforms_spark.operators.urls import filter_blocked_domains

    df = _docs(
        spark,
        [
            (1, "https://spam.net/offer"),
            (2, "https://cdn.spam.net/asset"),
            (3, "https://notspam.net/fine"),
            (4, "plain text"),
            (5, None),
        ],
    )
    kept = {r.doc_id for r in filter_blocked_domains(df, ["SPAM.net"]).collect()}
    assert kept == {3, 4, 5}
    kept_exact = {
        r.doc_id
        for r in filter_blocked_domains(df, ["spam.net"], include_subdomains=False).collect()
    }
    assert kept_exact == {2, 3, 4, 5}


def test_filter_blocked_domains_dataframe_blocklist(spark):
    from meds_transforms_spark.operators.urls import filter_blocked_domains

    df = _docs(
        spark,
        [
            (1, "https://spam.net/offer"),
            (2, "https://cdn.spam.net/asset"),
            (3, "https://ok.org/page"),
        ],
    )
    bl = spark.createDataFrame([("spam.net",)], "domain string")
    kept = {r.doc_id for r in filter_blocked_domains(df, bl).collect()}
    assert kept == {3}
    kept_exact = {
        r.doc_id
        for r in filter_blocked_domains(df, bl, include_subdomains=False).collect()
    }
    assert kept_exact == {2, 3}
