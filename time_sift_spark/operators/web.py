"""Web-crawl URL operators: normalization, registered-domain extraction,
per-domain cap sampling.

The front door of every large-scale crawl pipeline (CommonCrawl-style
corpora): raw URLs arrive with mixed-case schemes/hosts, default ports,
``www.`` prefixes, tracking query parameters, unordered query strings,
and fragments — so the SAME page appears under many spellings and naive
URL-level dedup misses most re-crawls.  Normalization canonicalizes the
spelling; registered-domain extraction gives the blocking/diversity key
(one publisher = one key, regardless of subdomain); the per-domain cap
is the standard corpus-diversity rule (a single boilerplate-heavy domain
must not dominate the training mix).

Everything here is dialect-paired SQL text (the Dialect convention of
functions/text_fns.py) over pure JVM/engine-native expressions — string
splits, regex extraction, array sort/filter — zero Python UDFs, zero
shuffles except where a rule is inherently an aggregation (the per-domain
rank).  At 100 TB: normalization and domain extraction are zero-shuffle
per-row projections that pipeline into the scan; the domain cap is ONE
shuffle on registered_domain (a window rank), with the md5 draw making
the kept subset reproducible on any cluster size.

Reference parity note: the reference engine (a Rust lag-matrix crate,
src/lib.rs) has no web surface; this module is charter extension surface
(SURVEY.md §2.5), modeled on the published CCNet/RefinedWeb/Dolma
pipeline stages (Wenzek et al. 2020; Penedo et al. 2023; Soldaini et al.
2024 — URL curation & per-domain balancing).
"""

from __future__ import annotations

from ..functions.text_fns import Dialect

__all__ = [
    "url_parts_ctes",
    "url_normalize_sql",
    "domain_cap_sample_sql",
]

# Multi-part public suffixes recognized by the registered-domain rule.
# A deliberately small, documented subset of the Public Suffix List
# (publicsuffix.org): the full list is data, not code — at production
# scale it becomes a broadcast relation exactly like this inline list,
# with identical semantics.  Single-label TLDs need no entry (the
# default "last two labels" rule covers them).
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au",
    "co.nz", "org.nz", "net.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg",
    "co.in", "co.za", "co.kr",
)

# Query parameters that identify the CLICK, not the page: stripping them
# is what makes two shares of the same article normalize to one URL.
_TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_eid|mc_cid"
    "|ref|ref_src|spm|yclid|_hsenc|_hsmi|s_kwcid)(=.*)?$"
)


def _el(d: Dialect, arr: str, idx: str) -> str:
    """1-indexed array element access."""
    if d.name == "spark":
        return f"element_at({arr}, {idx})"
    return f"list_extract({arr}, {idx})"


def _arr_sort(d: Dialect, arr: str) -> str:
    return f"array_sort({arr})" if d.name == "spark" else f"list_sort({arr})"


def _arr_join(d: Dialect, arr: str, sep: str) -> str:
    if d.name == "spark":
        return f"concat_ws('{sep}', {arr})"
    return f"array_to_string({arr}, '{sep}')"


def _rx_extract(d: Dialect, col: str, pattern: str, group: int) -> str:
    """Group extraction; both engines return '' when the pattern misses
    (Spark by definition; DuckDB regexp_extract returns '' on no match)."""
    return f"regexp_extract({col}, {d._q(pattern)}, {group})"


def registered_domain_expr(d: Dialect, host: str) -> str:
    """Registered domain of an already-normalized host expression.

    Last-2-labels by default, last-3 when the trailing 2 labels form a
    known multi-part public suffix (MULTI_PART_SUFFIXES).  Hosts with
    ≤ 2 labels (bare domains, localhost, IPv4 looks like 4 labels and
    takes the harmless 2-label branch) pass through the default rule.
    """
    labels = d.split(host, "\\.")
    n = d.size(labels)
    last2 = (
        f"concat({_el(d, labels, f'{n} - 1')}, '.', {_el(d, labels, n)})"
    )
    last3 = (
        f"concat({_el(d, labels, f'{n} - 2')}, '.', "
        f"{_el(d, labels, f'{n} - 1')}, '.', {_el(d, labels, n)})"
    )
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    return (
        f"CASE WHEN {n} <= 2 THEN {host} "
        f"WHEN {last2} IN ({suffixes}) THEN {last3} "
        f"ELSE {last2} END"
    )


def url_parts_ctes(d: Dialect, table: str, id_col: str, url_col: str) -> str:
    """CTE chain ``_u0`` → ``_uparts``: (id, url, scheme, host, path,
    query_norm, url_norm, registered_domain).

    Shared VERBATIM by url_normalize_sql and domain_cap_sample_sql (the
    shared-expression-text discipline — the two registered forms cannot
    drift).  Normalization rules, all engine-native:

    * scheme lowercased;
    * host lowercased, trailing dot stripped, leading ``www.`` stripped,
      default port stripped (``:80`` for http, ``:443`` for https —
      non-default ports are KEPT: a different port is a different
      origin);
    * fragment dropped (client-side only);
    * tracking query parameters removed (_TRACKING_PARAM_RE), surviving
      parameters sorted byte-lexicographically and rejoined — parameter
      order is transport noise, not identity;
    * path: '' → '/', trailing slash stripped on non-root paths
      (interior structure, including duplicate slashes, is preserved
      verbatim — rewriting it would conflate genuinely distinct URLs).
    """
    # raw pieces -----------------------------------------------------------
    query_pat = r"\?([^#]*)"
    scheme = f"lower({_rx_extract(d, url_col, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)})"
    hostport = f"lower({_rx_extract(d, url_col, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)})"
    path_raw = _rx_extract(d, url_col, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query_raw = _rx_extract(d, url_col, query_pat, 1)

    # host: strip trailing dot, then www., then the scheme's default port
    trailing_dot = d._q(r"\.$")
    www_prefix = d._q(r"^www\.")
    host0 = f"regexp_replace(hostport, {trailing_dot}, '')"
    host1 = f"regexp_replace({host0}, {www_prefix}, '')"
    host = (
        f"CASE WHEN scheme = 'http' THEN regexp_replace({host1}, {d._q(':80$')}, '') "
        f"WHEN scheme = 'https' THEN regexp_replace({host1}, {d._q(':443$')}, '') "
        f"ELSE {host1} END"
    )

    # query: drop tracking params, sort survivors.  The pattern is
    # anchored at both ends, so Spark's partial-match rlike and DuckDB's
    # partial-match regexp_matches agree.
    params = d.split("query_raw", "&")
    if d.name == "spark":
        is_tracking = f"p rlike {d._q(_TRACKING_PARAM_RE)}"
    else:
        is_tracking = f"regexp_matches(p, {d._q(_TRACKING_PARAM_RE)})"
    kept = d.filter(params, f"p -> p <> '' AND NOT ({is_tracking})")
    # DuckDB's array_to_string([]) is NULL (Spark's concat_ws is '') and
    # its concat SKIPS NULLs, which would render a stray '?' — normalize
    # the no-surviving-params case to '' on both engines
    query_norm = f"COALESCE({_arr_join(d, _arr_sort(d, kept), '&')}, '')"

    path = (
        "CASE WHEN path_raw = '' THEN '/' "
        "WHEN path_raw <> '/' AND path_raw LIKE '%/' "
        "THEN substr(path_raw, 1, length(path_raw) - 1) "
        "ELSE path_raw END"
    )
    url_norm = (
        "concat(scheme, '://', host, path, "
        "CASE WHEN query_norm = '' THEN '' ELSE concat('?', query_norm) END)"
    )
    return f"""
    _u0 AS (
      SELECT {id_col} AS _uid, {url_col} AS url,
             {scheme} AS scheme, {hostport} AS hostport,
             {path_raw} AS path_raw, {query_raw} AS query_raw
      FROM {table}
    ),
    _u1 AS (
      SELECT _uid, url, scheme, {host} AS host, path_raw, query_raw
      FROM _u0
    ),
    _u2 AS (
      SELECT _uid, url, scheme, host,
             {path} AS path,
             {query_norm} AS query_norm
      FROM _u1
    ),
    _uparts AS (
      SELECT _uid, url, scheme, host, path, query_norm,
             {url_norm} AS url_norm,
             {registered_domain_expr(d, "host")} AS registered_domain
      FROM _u2
    )
    """


def url_normalize_sql(d: Dialect, table: str, id_col: str, url_col: str) -> str:
    """One row per input: (id, url, url_norm, host, registered_domain,
    n_dup_spellings = how many input rows normalize to this url_norm) —
    the canonical-URL projection plus the dup-spelling audit column that
    shows what normalization bought."""
    return f"""
    WITH {url_parts_ctes(d, table, id_col, url_col)}
    SELECT _uid AS {id_col}, url, url_norm, host, registered_domain,
           COUNT(*) OVER (PARTITION BY url_norm) AS n_dup_spellings
    FROM _uparts
    """


def domain_cap_sample_sql(
    d: Dialect,
    table: str,
    id_col: str,
    url_col: str,
    *,
    cap: int = 20,
) -> str:
    """Per-registered-domain cap: keep at most ``cap`` documents per
    registered domain, chosen by the deterministic md5 draw (corpus-
    diversity balancing — the RefinedWeb/Dolma per-domain rule).  One
    URL-spelling survives per url_norm first (rank on the normalized
    key), then the per-domain rank caps the survivors.  Output: kept
    rows (id, url_norm, registered_domain, domain_rank), ordered.

    Shape at scale: zero-shuffle normalize → ONE shuffle on url_norm
    (spelling dedup) → ONE shuffle on registered_domain (the cap rank).
    The md5 draw makes both ranks reproducible on any partitioning.
    """
    draw = d.md5_long(f"concat('dcs|', CAST(_uid AS {'STRING' if d.name == 'spark' else 'VARCHAR'}))")
    return f"""
    WITH {url_parts_ctes(d, table, id_col, url_col)},
    _canon AS (
      SELECT _uid, url_norm, registered_domain,
             ROW_NUMBER() OVER (
               PARTITION BY url_norm ORDER BY {draw}, _uid
             ) AS _spell_rank
      FROM _uparts
    ),
    _ranked AS (
      SELECT _uid, url_norm, registered_domain,
             ROW_NUMBER() OVER (
               PARTITION BY registered_domain ORDER BY {draw}, _uid
             ) AS domain_rank
      FROM _canon WHERE _spell_rank = 1
    )
    SELECT _uid AS {id_col}, url_norm, registered_domain, domain_rank
    FROM _ranked
    WHERE domain_rank <= {cap}
    ORDER BY registered_domain, domain_rank
    """
