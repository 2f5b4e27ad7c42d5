"""URL/domain curation operators (r8): host normalization edge cases,
public-suffix reduction, deterministic caps, blocklist semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.url_curation import (
    blocklist_filter,
    domain_cap,
    extract_host,
    registered_domain,
    with_domain,
)


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["h"] for r in
            df.select(extract_host(F.col("url")).alias("h")).collect()]


def test_extract_host_edge_cases(spark):
    cases = {
        "https://www.Example.COM/path?q=1": "example.com",
        "HTTP://user:pw@EXAMPLE.org:8080/a": "example.org",
        "https://example.net.": "example.net",
        "//cdn.example.io/x": "cdn.example.io",      # scheme-relative
        "example.co.uk/page": "example.co.uk",        # bare host
        "https://www.www.example.com": "www.example.com",  # ONE www strip
        "   ": None,
        "": None,
    }
    got = _hosts(spark, list(cases))
    assert got == list(cases.values())


def test_registered_domain_public_suffix(spark):
    cases = {
        "a.b.example.com": "example.com",
        "news.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "example.com": "example.com",
        "localhost": "localhost",          # single label passes through
        "deep.sub.site.com.au": "site.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = [r["d"] for r in
           df.select(registered_domain(F.col("h")).alias("d")).collect()]
    assert got == list(cases.values())


@pytest.fixture()
def url_df(spark):
    rows = [(i, f"https://www.site{i % 3}.com/p/{i}") for i in range(30)]
    rows += [(100, "not a url"), (101, "")]
    return spark.createDataFrame(rows, "id bigint, url string")


def test_domain_cap_deterministic_and_bounded(spark, url_df):
    capped = domain_cap(url_df, 4, key_col="id", seed=3)
    counts = (with_domain(capped).groupBy("domain").count().collect())
    assert all(r["count"] <= 4 for r in counts)
    # NULL-domain rows form their own stratum and are capped, not dropped
    assert capped.filter(F.col("id") >= 100).count() >= 1
    # determinism: same seed -> same survivors
    again = {r["id"] for r in domain_cap(url_df, 4, key_col="id", seed=3)
             .select("id").collect()}
    assert {r["id"] for r in capped.select("id").collect()} == again


def test_blocklist_filter_keeps_nulls_and_drops_matches(spark, url_df):
    out = blocklist_filter(url_df, ["site1.com", "SITE2.com"])
    doms = [r["domain"] for r in with_domain(out).select("domain").collect()]
    assert "site1.com" not in doms and "site2.com" not in doms
    assert "site0.com" in doms
    assert None in doms  # unparseable URLs are kept


def test_blocklist_filter_large_list_broadcast_path(spark, url_df):
    blocked = [f"blocked{i}.com" for i in range(600)] + ["site0.com"]
    out = blocklist_filter(url_df, blocked)
    doms = {r["domain"] for r in with_domain(out).select("domain").collect()}
    assert "site0.com" not in doms and "site1.com" in doms


def test_psl_rules_parse_full_list(spark):
    from flouds_vectordb_spark.operators.url_curation import psl_rules

    rules = psl_rules()
    assert rules is not None and len(rules) > 9000
    by_name = {nm: (a, b, c) for nm, _, a, b, c in rules}
    assert by_name["com"] == (True, False, False)
    assert by_name["co.uk"][0]
    assert by_name["nagoya.jp"][1]            # wildcard parent
    assert by_name["city.nagoya.jp"][2]       # exception
    assert by_name["pvt.k12.ma.us"][0]        # 4-label normal rule
    icann = psl_rules(include_private=False)
    assert len(icann) < len(rules)
    assert "blogspot.com" not in {nm for nm, *_ in icann}


def test_with_domain_full_psl_semantics(spark):
    cases = {
        "https://a.b.example.com/x": "example.com",
        "http://news.example.co.uk/y": "example.co.uk",
        "https://foo.pvt.k12.ma.us/z": "foo.pvt.k12.ma.us",
        "https://web.nagoya.jp/a": "web.nagoya.jp",        # host == *-match
        "https://site.web.nagoya.jp/a": "site.web.nagoya.jp",  # wildcard
        "https://city.nagoya.jp/a": "city.nagoya.jp",      # exception
        "https://deep.city.nagoya.jp/a": "city.nagoya.jp",
        "https://user.blogspot.com/p": "user.blogspot.com",  # private section
        "https://foo.bar.unknowntld/x": "bar.unknowntld",  # implicit *
        "https://localhost/x": "localhost",
    }
    df = spark.createDataFrame(list(cases.items()), "url string, want string")
    out = with_domain(df, use_psl=True)
    assert all(r["domain"] == r["want"] for r in out.collect())
    # fallback path still answers (with its coarser two-level reduction)
    fb = {r["url"]: r["domain"] for r in with_domain(df, use_psl=False).collect()}
    assert fb["https://a.b.example.com/x"] == "example.com"
    assert fb["https://site.web.nagoya.jp/a"] == "nagoya.jp"  # no wildcard rule


def test_psl_spark_matches_duckdb_twin(spark):
    import duckdb

    from flouds_vectordb_spark.operators.url_curation import psl_domain_sql

    urls = ["https://a.b.c.d.example.co.uk/x", "https://x.y.kawasaki.jp",
            "https://city.kawasaki.jp/q", "http://e.co:80/s", "bare.host.com",
            "https://x.s3.dualstack.ap-southeast-1.amazonaws.com/b"]
    rows = [(i, u) for i, u in enumerate(urls)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute(
        "SELECT id, domain FROM " + psl_domain_sql("t", "url")).fetchall())
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["domain"]
           for r in with_domain(df, use_psl=True).collect()}
    assert got == want
