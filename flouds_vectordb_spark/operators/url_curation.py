"""URL / domain-level corpus curation (C4 / RefinedWeb-style).

Pipeline extension beyond the reference surface (VERDICT r7 ask #5): web
pretraining pipelines dedup and filter by normalized host BEFORE any
content-level pass — per-domain caps keep one site from dominating the
corpus, and domain blocklists drop known-bad sites wholesale. These are
the cheapest, highest-leverage filters at 100 TB because they act on a
short scalar (the registered domain), never the payload.

Operators:
- `extract_host`: scheme-agnostic host extraction + normalization
  (lowercase, strip userinfo/port/path/query, strip one leading "www.",
  strip a trailing dot). Pure Column expressions.
- `registered_domain`: public-suffix reduction to the "site" key
  (example.co.uk -> example.co.uk, a.b.example.com -> example.com) using
  a bundled LITERAL suffix list — a compact public-knowledge subset of
  the Mozilla Public Suffix List's most common entries, documented as
  such; swap in the full PSL as a broadcast table for production.
- `domain_cap`: deterministic per-domain quota — at most n docs per
  registered domain, chosen by the same content-hash rank as
  sampling.sample_stratified, so the survivors are a pure function of the
  data (partitioning- and engine-independent).
- `blocklist_filter`: drop rows whose registered domain is in a blocklist
  (literal IN for small lists; broadcast anti-join above _ISIN_CAP).

Every operator has a *_sql DuckDB twin (oracle parity).

Scale shape: host/domain are O(1)-width scalars computed in one
projection; the cap's only shuffle is a (domain, hash, key)-scalar window;
the blocklist is a broadcast. The text payload never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.sampling import sample_stratified, sample_stratified_sql

# Compact public-knowledge subset of multi-label public suffixes (the
# common ccTLD second-level registrations). The full Mozilla PSL has ~9k
# entries and ships as a data file; at 100 TB it becomes a broadcast
# lookup table with the same longest-match rule. One-label suffixes
# (.com, .org, ...) need no listing — they are the default branch.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = tuple(sorted([
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "net.mx",
    "co.za", "org.za", "net.za", "web.za",
    "co.nz", "net.nz", "org.nz",
    "com.sg", "org.sg", "net.sg",
    "com.tr", "org.tr", "net.tr",
    "com.ar", "org.ar", "net.ar",
    "co.kr", "or.kr", "ne.kr",
    "com.tw", "org.tw",
    "com.hk", "org.hk",
    "co.id", "or.id", "web.id",
    "com.my", "org.my",
    "co.th", "or.th", "in.th",
    "com.vn", "org.vn",
    "com.ph", "org.ph",
    "com.eg", "org.eg",
    "com.sa", "org.sa",
    "co.il", "org.il",
    "com.pk", "org.pk",
    "com.ng", "org.ng",
    "com.ua", "org.ua",
    "com.pl", "org.pl", "net.pl",
]))

_HOST_RE = r"^\s*[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#\s]+)"
_BARE_RE = r"^\s*(?://)?(?:[^/@?#\s]*@)?([^/:?#\s]+)"

_ISIN_CAP = 512  # blocklists above this become a broadcast anti-join


def extract_host(url_col: Column) -> Column:
    """Normalized host of a URL: the authority's host part, lowercased,
    with userinfo/port/path/query gone, ONE leading "www." and any
    trailing dot stripped. Scheme-relative and bare-host inputs (no
    scheme) fall back to everything before the first /:?#. Returns NULL
    for empty/whitespace input."""
    with_scheme = F.regexp_extract(url_col, _HOST_RE, 1)
    # no scheme: optional scheme-relative //, then up to the first
    # delimiter, still dropping userinfo
    bare = F.regexp_extract(url_col, _BARE_RE, 1)
    host = F.lower(F.when(with_scheme != "", with_scheme).otherwise(bare))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def registered_domain(host_col: Column) -> Column:
    """Public-suffix-reduced site key: the last 2 labels, or the last 3
    when the last 2 form a listed two-level suffix; hosts with fewer
    labels pass through unchanged."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    # try_element_at: a 1-label host would make element_at(-2) an ANSI
    # error even though the n>=2 guard never selects that branch
    last2 = F.concat_ws(".", F.try_element_at(parts, F.lit(-2)),
                        F.try_element_at(parts, F.lit(-1)))
    last3 = F.concat_ws(".", F.try_element_at(parts, F.lit(-3)),
                        F.try_element_at(parts, F.lit(-2)),
                        F.try_element_at(parts, F.lit(-1)))
    suffixes = F.array(*[F.lit(s) for s in TWO_LEVEL_SUFFIXES])
    return (
        F.when(host_col.isNull(), F.lit(None).cast("string"))
        .when((n >= 3) & F.array_contains(suffixes, last2), last3)
        .when(n >= 2, last2)
        .otherwise(host_col)
    )


def with_domain(df: DataFrame, url_col: str = "url",
                domain_col: str = "domain") -> DataFrame:
    """df + normalized registered-domain column, STAGED as two projections:
    inlining registered_domain(extract_host(url)) repeats the regex host
    expression once per reference (~12x) — per-row cost AND a codegen
    bomb (the repo's documented expression-evaluation lesson: Catalyst
    does not CSE non-codegen subtrees; a window sort over the inlined
    tree blew the 64 KB JVM method limit). Two withColumns pin host and
    domain to one evaluation each."""
    staged = df.withColumn("__host", extract_host(F.col(url_col)))
    out = staged.withColumn(domain_col, registered_domain(F.col("__host")))
    return out.drop("__host")


def domain_cap(df: DataFrame, n_per_domain: int, url_col: str = "url",
               key_col: str = "id", seed: int = 0) -> DataFrame:
    """At most n rows per registered domain, selected by the deterministic
    content-hash rank (sampling.sample_stratified): survivors are a pure
    function of (seed, data). Rows whose URL yields no host (NULL domain)
    form their own stratum — they are capped too, not dropped."""
    capped = sample_stratified(
        with_domain(df, url_col, "_rd"), "_rd", n_per_domain,
        key_col=key_col, seed=seed)
    return capped.drop("_rd")


def blocklist_filter(df: DataFrame, blocked_domains, url_col: str = "url") -> DataFrame:
    """Drop rows whose registered domain is blocklisted. Small lists are a
    literal NOT IN (pushdown-friendly); large ones a broadcast anti-join.
    NULL domains (unparseable URLs) are KEPT — blocklisting is a positive
    match, and unparseable URLs are a separate quality signal."""
    blocked = sorted({b.lower() for b in blocked_domains})
    staged = with_domain(df, url_col, "_rd")
    d = F.col("_rd")
    if len(blocked) <= _ISIN_CAP:
        return staged.filter(d.isNull() | ~d.isin(blocked)).drop("_rd")
    spark = df.sparkSession
    bdf = spark.createDataFrame([(b,) for b in blocked], "_bd string")
    return (
        staged.join(F.broadcast(bdf), d == F.col("_bd"), "left_anti")
        .drop("_rd")
    )


# --- DuckDB oracle twins ------------------------------------------------------

def host_sql(url_expr: str) -> str:
    """DuckDB twin of extract_host."""
    with_scheme = (f"regexp_extract({url_expr}, "
                   f"'{_HOST_RE}', 1)")
    bare = f"regexp_extract({url_expr}, '{_BARE_RE}', 1)"
    host = (f"lower(CASE WHEN {with_scheme} <> '' THEN {with_scheme} "
            f"ELSE {bare} END)")
    host = f"regexp_replace({host}, '\\.$', '')"
    host = f"regexp_replace({host}, '^www\\.', '')"
    return f"nullif({host}, '')"


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of registered_domain (expects a host expression)."""
    sfx = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    parts = f"string_split({host_expr}, '.')"
    return f"""(
  CASE WHEN {host_expr} IS NULL THEN NULL
       WHEN len({parts}) >= 3 AND list_contains([{sfx}],
            ({parts})[-2] || '.' || ({parts})[-1])
         THEN ({parts})[-3] || '.' || ({parts})[-2] || '.' || ({parts})[-1]
       WHEN len({parts}) >= 2 THEN ({parts})[-2] || '.' || ({parts})[-1]
       ELSE {host_expr} END)"""


def domain_cap_sql(table_sql: str, n_per_domain: int, url_expr: str = "url",
                   key_expr: str = "id", seed: int = 0) -> str:
    """DuckDB twin of domain_cap: same stratified-quota machinery over the
    derived domain column, helper column excluded from the output."""
    dom = registered_domain_sql(host_sql(url_expr))
    inner = f"(SELECT *, {dom} AS _rd FROM {table_sql})"
    capped = sample_stratified_sql(inner, "_rd", n_per_domain,
                                   key_expr=key_expr, seed=seed)
    return f"SELECT * EXCLUDE (_rd) FROM ({capped})"


def blocklist_filter_sql(table_sql: str, blocked_domains,
                         url_expr: str = "url") -> str:
    """DuckDB twin of blocklist_filter."""
    blocked = sorted({b.lower() for b in blocked_domains})
    dom = registered_domain_sql(host_sql(url_expr))
    in_list = ", ".join("'" + b.replace("'", "''") + "'" for b in blocked)
    return (f"SELECT * FROM {table_sql} "
            f"WHERE ({dom}) IS NULL OR ({dom}) NOT IN ({in_list})")
