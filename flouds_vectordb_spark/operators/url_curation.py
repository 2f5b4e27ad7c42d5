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
- `registered_domain` / `with_domain`: public-suffix reduction to the
  "site" key (example.co.uk -> example.co.uk, a.b.example.com ->
  example.com). The primary path (r9) evaluates the FULL Mozilla Public
  Suffix List — bundled at data/public_suffix_list.dat (public data,
  MPL-2.0, header preserved in the file; the same file Debian ships as
  the `publicsuffix` package) — with complete PSL semantics: longest
  match, wildcard rules (*.nagoya.jp), exception rules
  (!city.nagoya.jp), and the implicit "*" default. Matching is a
  bounded set of per-label-count broadcast joins against the parsed
  rule table, never a giant literal expression (the r8 inline 76-entry
  array blew the 64 KB codegen method limit once composed into a
  filter). The compact TWO_LEVEL_SUFFIXES literal remains as the
  no-data-file fallback (use_psl=False or a stripped install).
- `domain_cap`: deterministic per-domain quota — at most n docs per
  registered domain, chosen by the same content-hash rank as
  sampling.sample_stratified, so the survivors are a pure function of the
  data (partitioning- and engine-independent).
- `blocklist_filter`: drop rows whose registered domain is in a blocklist
  (literal IN for small lists; broadcast anti-join above _ISIN_CAP).

Every operator has a *_sql DuckDB twin (oracle parity).

Documented deviation from the `publicsuffix` python library (ADVICE r9):
a host that exactly EQUALS a public suffix ('co.uk', 'web.nagoya.jp',
'localhost') returns itself as the registered domain, where PSL
reference implementations return no registrable domain (NULL). Both
engines and the tests pin this same behavior, so there is no
cross-engine divergence; the practical effect is that domain_cap /
blocklist_filter treat a bare public suffix as an ordinary site key —
the right call for corpus curation, where "docs whose URL is literally
a registry root" should still be cappable/blockable rather than
escaping the domain stage with a NULL key.

Scale shape: host/domain are O(1)-width scalars computed in one
projection; the cap's only shuffle is a (domain, hash, key)-scalar window;
the blocklist is a broadcast. The text payload never shuffles.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.sampling import sample_stratified, sample_stratified_sql

_PSL_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "data", "public_suffix_list.dat")

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


@lru_cache(maxsize=4)
def psl_rules(include_private: bool = True) -> tuple | None:
    """The bundled Mozilla Public Suffix List, parsed: a sorted tuple of
    (name, n_labels, is_normal, is_wild, is_exc). Wildcard rules
    (*.nagoya.jp) are stored under their PARENT name (nagoya.jp,
    is_wild); exception rules (!city.nagoya.jp) under the exception name
    itself. include_private=False stops at the ICANN/private boundary
    (private entries like blogspot.com treat each user site as its own
    registrable domain — what per-site corpus caps usually want, so the
    default keeps them). Returns None when the data file is absent."""
    if not os.path.exists(_PSL_PATH):
        return None
    agg: dict[str, list[bool]] = {}
    private = False
    with open(_PSL_PATH, encoding="utf-8") as f:
        for ln in f:
            s = ln.strip()
            if not s or s.startswith("//"):
                if "BEGIN PRIVATE" in s:
                    private = True
                continue
            if private and not include_private:
                continue
            exc = s.startswith("!")
            wild = s.startswith("*.")
            name = s[1:] if exc else (s[2:] if wild else s)
            e = agg.setdefault(name, [False, False, False])
            e[0] |= not (exc or wild)
            e[1] |= wild
            e[2] |= exc
    return tuple(sorted((n, n.count(".") + 1, a, b, c)
                        for n, (a, b, c) in agg.items()))


def _psl_depths(rules) -> tuple[int, int]:
    """(k_match, k_reg): deepest rule label count to probe, and deepest
    suffix the registered-domain CASE can index (ps_len + 1)."""
    kn = max((k for _, k, a, _, _ in rules if a), default=1)
    kw = max((k for _, k, _, b, _ in rules if b), default=0)
    ke = max((k for _, k, _, _, c in rules if c), default=0)
    k_match = max(kn, kw, ke, 1)
    k_reg = max(kn, kw + 1) + 1
    return k_match, k_reg


# One-slot cache: (applicationId, rules-object) -> staged rule DataFrame.
# The full PSL is ~10k rows; driver-side createDataFrame conversion costs
# ~0.5 s PER CALL while the rule set is module-constant — build once per
# session. A single slot (not a dict) so session restarts evict the
# previous entry instead of pinning DataFrames of stopped sessions. The
# slot holds a STRONG reference to the rules object and compares by
# identity, so an id()-reuse after GC can never alias a different rules
# list to the cached DataFrame.
_RULE_DF_SLOT: list = [None, None, None]  # [appId, rules obj, DataFrame]


def _rule_df(spark, rules) -> DataFrame:
    app = spark.sparkContext.applicationId
    if _RULE_DF_SLOT[0] != app or _RULE_DF_SLOT[1] is not rules:
        # Build first, publish after: if createDataFrame raises (e.g. a
        # transient session failure) the slot keys must NOT already match
        # (appId, rules), or a retry would return the stale DataFrame
        # left in slot[2] by a previous session.
        # local_df (VALUES LocalRelation), not createDataFrame: a
        # LogicalRDD re-runs a defaultParallelism-task scan stage inside
        # EVERY per-depth broadcast build on every execution (~5 x 32
        # empty tasks per pass at gate scale); a LocalRelation broadcasts
        # straight from driver memory with no task stage. Parse cost is
        # once per session (the slot caches the frame).
        from flouds_vectordb_spark.functions.local import local_df

        built = local_df(
            spark, [(nm, k, a, b, c) for nm, k, a, b, c in rules],
            "nm string, nl int, rn boolean, rw boolean, re boolean")
        _RULE_DF_SLOT[0] = app
        _RULE_DF_SLOT[1] = rules
        _RULE_DF_SLOT[2] = built
    return _RULE_DF_SLOT[2]


def _psl_domain(df: DataFrame, host_col: str, domain_col: str,
                rules) -> DataFrame:
    """host -> registered domain under full PSL semantics via bounded
    broadcast joins: stage the split ONCE, stage one suffix string per
    candidate label count (NULL when the host is shorter — concat_ws
    would otherwise silently skip missing labels and alias short hosts
    onto deep suffixes), left-broadcast-join the per-depth rule slices,
    then a bounded CASE picks: exception name if one matched (the
    exception IS the registrable domain), else longest-match public
    suffix + one label, else the implicit "*" rule (last label)."""
    spark = df.sparkSession
    k_match, k_reg = _psl_depths(rules)
    h = F.col(host_col)
    d = df.withColumn("__p", F.split(h, r"\.")) \
          .withColumn("__n", F.size("__p"))
    n = F.col("__n")
    helper = ["__p", "__n"]
    for k in range(1, max(k_match, k_reg) + 1):
        d = d.withColumn(
            f"__s{k}",
            F.when(n >= k, F.concat_ws(
                ".", *[F.try_element_at(F.col("__p"), F.lit(-i))
                       for i in range(k, 0, -1)])))
        helper.append(f"__s{k}")
    rule_df = _rule_df(spark, rules)
    for k in range(1, k_match + 1):
        rk = (rule_df.filter(F.col("nl") == k)
              .select(F.col("nm").alias(f"__nm{k}"),
                      F.col("rn").alias(f"__rn{k}"),
                      F.col("rw").alias(f"__rw{k}"),
                      F.col("re").alias(f"__re{k}")))
        d = d.join(F.broadcast(rk),
                   F.col(f"__s{k}") == F.col(f"__nm{k}"), "left") \
             .drop(f"__nm{k}")
        helper += [f"__rn{k}", f"__rw{k}", f"__re{k}"]
    cands = [F.lit(1)]
    for k in range(1, k_match + 1):
        cands.append(F.when(F.coalesce(F.col(f"__rn{k}"), F.lit(False)),
                            F.lit(k)).otherwise(F.lit(1)))
        # a wildcard rule adds one label; it only matches when that label
        # exists (host == parent falls through to shorter rules)
        cands.append(F.when(F.coalesce(F.col(f"__rw{k}"), F.lit(False))
                            & (n >= k + 1),
                            F.lit(k + 1)).otherwise(F.lit(1)))
    ps = F.greatest(*cands)
    exc = None
    for k in range(k_match, 0, -1):
        e = F.when(F.coalesce(F.col(f"__re{k}"), F.lit(False)),
                   F.col(f"__s{k}"))
        exc = e if exc is None else F.coalesce(exc, e)
    by_len = F.when(n <= ps, h)
    for k in range(1, k_reg):
        by_len = by_len.when(ps == k, F.col(f"__s{k + 1}"))
    domain = F.when(h.isNull(), F.lit(None).cast("string")) \
        .otherwise(F.coalesce(exc, by_len))
    return d.withColumn(domain_col, domain).drop(*helper)


def with_domain(df: DataFrame, url_col: str = "url",
                domain_col: str = "domain",
                use_psl: bool | None = None) -> DataFrame:
    """df + normalized registered-domain column. Host extraction is
    STAGED as its own projection: inlining
    registered_domain(extract_host(url)) repeats the regex host
    expression once per reference (~12x) — per-row cost AND a codegen
    bomb (the repo's documented expression-evaluation lesson: Catalyst
    does not CSE non-codegen subtrees; a window sort over the inlined
    tree blew the 64 KB JVM method limit).

    use_psl: None = auto (full bundled PSL when present, literal
    two-level fallback otherwise); True = require the PSL file; False =
    force the compact literal path."""
    staged = df.withColumn("__host", extract_host(F.col(url_col)))
    rules = psl_rules() if use_psl in (None, True) else None
    if rules is None:
        if use_psl is True:
            raise FileNotFoundError(f"PSL data file missing: {_PSL_PATH}")
        out = staged.withColumn(domain_col, registered_domain(F.col("__host")))
        return out.drop("__host")
    return _psl_domain(staged, "__host", domain_col, rules).drop("__host")


def domain_cap(df: DataFrame, n_per_domain: int, url_col: str = "url",
               key_col: str = "id", seed: int = 0,
               use_psl: bool | None = None) -> DataFrame:
    """At most n rows per registered domain, selected by the deterministic
    content-hash rank (sampling.sample_stratified): survivors are a pure
    function of (seed, data). Rows whose URL yields no host (NULL domain)
    form their own stratum — they are capped too, not dropped."""
    capped = sample_stratified(
        with_domain(df, url_col, "_rd", use_psl=use_psl), "_rd", n_per_domain,
        key_col=key_col, seed=seed)
    return capped.drop("_rd")


def blocklist_filter(df: DataFrame, blocked_domains, url_col: str = "url",
                     use_psl: bool | None = None) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. Small lists are a
    literal NOT IN (pushdown-friendly); large ones a broadcast anti-join.
    NULL domains (unparseable URLs) are KEPT — blocklisting is a positive
    match, and unparseable URLs are a separate quality signal."""
    blocked = sorted({b.lower() for b in blocked_domains})
    staged = with_domain(df, url_col, "_rd", use_psl=use_psl)
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


def psl_domain_sql(table_sql: str, url_expr: str = "url",
                   domain_alias: str = "domain",
                   include_private: bool = True) -> str:
    """DuckDB twin of the full-PSL with_domain: a derived table computing
    `SELECT *, <registered domain> AS {domain_alias}` over table_sql.
    Generated from the SAME psl_rules() parse the Spark side joins
    against (identical names, flags, and depth bounds), with the same
    staged-suffix + per-depth-left-join + bounded-CASE structure, so the
    two engines cannot diverge on PSL semantics."""
    rules = psl_rules(include_private)
    if rules is None:
        raise FileNotFoundError(f"PSL data file missing: {_PSL_PATH}")
    k_match, k_reg = _psl_depths(rules)
    k_all = max(k_match, k_reg)
    vals = ", ".join(
        f"('{nm}', {k}, {str(bool(a)).upper()}, {str(bool(b)).upper()}, "
        f"{str(bool(c)).upper()})"
        for nm, k, a, b, c in rules)
    sfx = ", ".join(
        f"CASE WHEN __n >= {k} THEN array_to_string(__p[-{k}:], '.') END AS __s{k}"
        for k in range(1, k_all + 1))
    flag_cols = ", ".join(
        f"p{k}.rn AS __rn{k}, p{k}.rw AS __rw{k}, p{k}.re AS __re{k}"
        for k in range(1, k_match + 1))
    joins = " ".join(
        f"LEFT JOIN _pslr p{k} ON p{k}.nl = {k} AND _hs.__s{k} = p{k}.nm"
        for k in range(1, k_match + 1))
    ps_cands = ["1"]
    for k in range(1, k_match + 1):
        ps_cands.append(
            f"CASE WHEN coalesce(__rn{k}, FALSE) THEN {k} ELSE 1 END")
        ps_cands.append(
            f"CASE WHEN coalesce(__rw{k}, FALSE) AND __n >= {k + 1} "
            f"THEN {k + 1} ELSE 1 END")
    exc_branches = " ".join(
        f"WHEN coalesce(__re{k}, FALSE) THEN __s{k}"
        for k in range(k_match, 0, -1))
    by_len = " ".join([f"WHEN __n <= __ps THEN __host"] + [
        f"WHEN __ps = {k} THEN __s{k + 1}" for k in range(1, k_reg)])
    helpers = (["__host", "__p", "__n", "__ps"]
               + [f"__s{k}" for k in range(1, k_all + 1)]
               + [f"__{f}{k}" for k in range(1, k_match + 1)
                  for f in ("rn", "rw", "re")])
    excl = ", ".join(helpers)
    return f"""(
WITH _pslr(nm, nl, rn, rw, re) AS (VALUES {vals}),
_h0 AS (SELECT *, {host_sql(url_expr)} AS __host FROM {table_sql}),
_h1 AS (SELECT *, len(__p) AS __n FROM
        (SELECT *, string_split(__host, '.') AS __p FROM _h0)),
_hs AS (SELECT *, {sfx} FROM _h1),
_m AS (SELECT _hs.*, {flag_cols} FROM _hs {joins}),
_d AS (SELECT *, greatest({', '.join(ps_cands)}) AS __ps FROM _m)
SELECT * EXCLUDE ({excl}),
       CASE WHEN __host IS NULL THEN NULL
            ELSE coalesce(CASE {exc_branches} END,
                          CASE {by_len} END)
       END AS {domain_alias}
FROM _d)"""


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of registered_domain — the compact literal FALLBACK
    path (use_psl=False); the primary PSL twin is psl_domain_sql."""
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
                   key_expr: str = "id", seed: int = 0,
                   use_psl: bool | None = None) -> str:
    """DuckDB twin of domain_cap: same stratified-quota machinery over the
    derived domain column, helper column excluded from the output. The
    domain derivation mirrors with_domain's auto rule (full PSL when
    bundled, literal fallback otherwise)."""
    if use_psl is not False and psl_rules() is not None:
        inner = psl_domain_sql(table_sql, url_expr, "_rd")
    else:
        dom = registered_domain_sql(host_sql(url_expr))
        inner = f"(SELECT *, {dom} AS _rd FROM {table_sql})"
    capped = sample_stratified_sql(inner, "_rd", n_per_domain,
                                   key_expr=key_expr, seed=seed)
    return f"SELECT * EXCLUDE (_rd) FROM ({capped})"


def blocklist_filter_sql(table_sql: str, blocked_domains,
                         url_expr: str = "url",
                         use_psl: bool | None = None) -> str:
    """DuckDB twin of blocklist_filter (same auto PSL/fallback rule)."""
    blocked = sorted({b.lower() for b in blocked_domains})
    in_list = ", ".join("'" + b.replace("'", "''") + "'" for b in blocked)
    if use_psl is not False and psl_rules() is not None:
        inner = psl_domain_sql(table_sql, url_expr, "_rd")
        return (f"SELECT * EXCLUDE (_rd) FROM {inner} "
                f"WHERE _rd IS NULL OR _rd NOT IN ({in_list})")
    dom = registered_domain_sql(host_sql(url_expr))
    return (f"SELECT * FROM {table_sql} "
            f"WHERE ({dom}) IS NULL OR ({dom}) NOT IN ({in_list})")
