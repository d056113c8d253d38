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
    "html_title_expr",
    "html_text_expr",
    "html_extract_sql",
    "html_extract",
    "html_links_sql",
    "html_links",
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


# --------------------------------------------------------------------------
# HTML → main-text extraction (the step BEFORE url/dedup/quality in a real
# crawl pipeline: raw pages arrive as markup, not clean text)
# --------------------------------------------------------------------------

# The six entities every extractor must decode (the HTML4 core set that
# appears in running prose).  Decode order matters: named/numeric forms
# first, '&amp;' LAST, so '&amp;lt;' decodes to the literal '&lt;' the
# author escaped, never to '<' (the standard single-pass contract).
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# Tags whose CLOSE marks the end of a block of prose: each becomes a
# newline so the line-level boilerplate rule sees the page's visual
# line structure.  <br> is the one VOID tag with line semantics.
_BLOCK_END_PATTERN = (
    "(?i)</(p|div|h[1-6]|li|tr|td|th|blockquote|title|article|section"
    # only real <br> variants (<br>, <br/>, <br />, <br attr>) get line
    # semantics — '<br[^>]*>' also swallowed any tag NAMED br* (e.g. a
    # hypothetical <brand …>), which stage 4 should strip to a space
    "|header|footer|nav|ul|ol|table)>|<br(\\s[^>]*)?/?>"
)


def _rx_sub_nl(d: Dialect, col: str, pattern: str) -> str:
    """Global regex substitution with a NEWLINE replacement (chr(10) —
    an expression, not a quoted literal, so neither engine's string-
    escape rules are in play)."""
    if d.name == "spark":
        return f"regexp_replace({col}, {d._q(pattern)}, chr(10))"
    return f"regexp_replace({col}, {d._q(pattern)}, chr(10), 'g')"


def _entity_decode(d: Dialect, e: str) -> str:
    """Chain the six core entity replaces over an expression
    ('&amp;' last — see _HTML_ENTITIES)."""
    for ent, ch in _HTML_ENTITIES:
        e = f"replace({e}, {d._q(ent)}, {d._q(ch)})"
    return e


def html_title_expr(d: Dialect, col: str) -> str:
    """The page's <title> text (trimmed, entities decoded; '' when the
    page has none).  Both engines' regexp_extract return '' on no
    match."""
    raw = f"regexp_extract({col}, {d._q('(?is)<title[^>]*>(.*?)</title>')}, 1)"
    # trim AFTER decoding so entity-derived whitespace ('&nbsp;X' → ' X')
    # is trimmed too, matching the body path's decode-then-trim per line
    return f"trim({_entity_decode(d, raw)})"


def html_text_expr(d: Dialect, col: str) -> str:
    """Markup-stripped page text with the block line structure kept.

    The fixed strip chain (each stage is one global engine-native regex
    pass — Java regex on Spark, RE2 on DuckDB; every pattern below sits
    in the common subset: inline (?is) flags, non-greedy '.*?',
    character classes — no backreferences, which RE2 lacks):

    1. comments ``<!-- … -->`` → ' '  (they may CONTAIN markup; first)
    2. ``<script>…</script>`` / ``<style>…</style>`` blocks → ' '
       (their CONTENT is code, not prose — two passes because RE2 has
       no backreference to share one)
    3. block-closing tags and ``<br>`` → newline (visual line
       structure becomes literal line structure)
    4. every remaining tag ``<[^>]*>`` → ' '  (inline markup vanishes,
       its text content survives)
    5. the six core entities decode ('&amp;' last)
    6. horizontal whitespace collapses to single spaces

    Line-level trim/empty-drop happens in :func:`html_extract_sql`
    (the split side), not here — this expression stays a pure per-row
    projection that pipelines into the scan (zero shuffle).
    """
    e = d.regexp_sub(col, "(?s)<!--.*?-->", " ")
    e = d.regexp_sub(e, "(?is)<script[^>]*>.*?</script>", " ")
    e = d.regexp_sub(e, "(?is)<style[^>]*>.*?</style>", " ")
    e = _rx_sub_nl(d, e, _BLOCK_END_PATTERN)
    e = d.regexp_sub(e, "<[^>]*>", " ")
    e = _entity_decode(d, e)
    e = d.regexp_sub(e, "[ \\t\\r]+", " ")
    return e


def _hx_tail(
    d: Dialect,
    id_col: str,
    *,
    max_line_docs: int,
    min_line_chars: int,
) -> str:
    """The extraction tail over an ``_hx0`` relation (did, title,
    stripped) — shared VERBATIM by the one-statement form
    (:func:`html_extract_sql`, the oracle) and the staged front door
    (:func:`html_extract`), the _qq_tail/_drift_combine_sql shared-text
    discipline, so staged ≡ one-statement is structural."""
    lines_arr = d.split("stripped", "\\n")
    if d.name == "spark":
        ex = (
            # OUTER + null-filter ≡ plain posexplode (split() elements
            # are never NULL; the WHERE sees the generate output, not
            # the trim alias) — kills the inferred size(_ls)>0 scan
            # constraint (see dedup._ssr_pos_explode).
            f"SELECT did, pos, trim(line) AS line FROM "
            f"(SELECT did, {lines_arr} AS _ls FROM _hx0) "
            f"LATERAL VIEW OUTER posexplode(_ls) t AS pos, line "
            f"WHERE line IS NOT NULL"
        )
        reasm = (
            "concat_ws(chr(10), transform(array_sort(collect_list("
            "CASE WHEN NOT boiler THEN struct(pos, line) END)), s -> s.line))"
        )
    else:
        ex = (
            f"SELECT did, i AS pos, trim(_ls[i]) AS line FROM "
            f"(SELECT did, _ls, unnest(range(1, len(_ls) + 1)) AS i FROM "
            f"(SELECT did, {lines_arr} AS _ls FROM _hx0))"
        )
        reasm = (
            "string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT boiler)"
        )
    return f"""
    _hxl AS (
      SELECT did, pos, line,
             CASE WHEN length(line) >= {int(min_line_chars)}
                  THEN {d.md5_long("line")} END AS lkey
      FROM ({ex}) _hxe
      WHERE length(line) > 0
    ),
    _hxf AS (
      SELECT lkey, COUNT(DISTINCT did) AS ndocs
      FROM _hxl WHERE lkey IS NOT NULL GROUP BY lkey
    ),
    _hxg AS (
      SELECT l.did, l.pos, l.line,
             (l.lkey IS NOT NULL
              AND COALESCE(f.ndocs, 0) > {int(max_line_docs)}) AS boiler
      FROM _hxl l LEFT JOIN _hxf f ON f.lkey = l.lkey
    ),
    _hxa AS (
      SELECT did,
             COUNT(*) AS n_lines,
             SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS n_boiler,
             {reasm} AS main_text
      FROM _hxg GROUP BY did
    )
    SELECT b.did AS {id_col}, b.title,
           COALESCE(a.main_text, '') AS main_text,
           CAST(COALESCE(a.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(COALESCE(a.n_lines, 0) - COALESCE(a.n_boiler, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(a.n_boiler, 0) AS BIGINT) AS n_boiler
    FROM _hx0 b LEFT JOIN _hxa a ON a.did = b.did
    """


def html_extract_sql(
    d: Dialect,
    table: str,
    id_col: str,
    html_col: str,
    *,
    max_line_docs: int = 5,
    min_line_chars: int = 10,
) -> str:
    """HTML → main-text extraction: strip markup, then drop BOILERPLATE
    lines — the trafilatura/jusText step that turns a crawled page into
    training prose, re-based from per-page DOM heuristics to the
    engine's cross-corpus signal (the line_dedup/CCNet df rule,
    operators/dedup.py:line_dedup_sql): a line whose trimmed content
    appears in more than ``max_line_docs`` documents is chrome
    (navigation, cookie banners, share prompts, footers) — boilerplate
    repeats ACROSS pages while body prose does not.  Per-page
    extractors guess from tag context; the corpus-level rule MEASURES
    repetition, which is the scalable signal (Wenzek et al. 2020
    §3.1 applied at line granularity).

    Chain: :func:`html_text_expr` (per-row strip projection) → split
    on newline → trim each line → EMPTY lines drop structurally (markup
    residue, not content — unlike line_dedup's blank-line exemption,
    an extractor's output has no formatting to preserve) → short
    non-empty lines (< ``min_line_chars``) are EXEMPT from the df rule
    (headings, bullets) → one partial-aggregated line-key frequency
    count → key join back → per-doc ordered reassembly.

    Output: one row per input page — ({id_col}, title, main_text,
    n_lines, n_kept, n_boiler) where n_lines counts NON-EMPTY stripped
    lines and n_boiler the ones the df rule removed.  Pages whose every
    line is boilerplate extract to ''.

    Scale shape (the line_dedup posture): the strip chain and the split
    pipeline into the scan; ONE shuffle on the 60-bit line key for the
    frequency count (a line shared by a million pages costs one
    counter, never a pair join); ONE broadcast-friendly key join back;
    ONE groupBy(doc) reassembly.  The ``_hx0`` strip relation is
    referenced twice (explode chain + final join) — the Spark front
    door (:func:`html_extract`) STAGES it so the 6-pass regex chain
    runs once; the one-statement form here is the oracle/portability
    rendering.  The reference engine (a Rust lag-matrix crate,
    src/lib.rs) has no text surface; this is charter extension surface
    (SURVEY.md §2.5).
    """
    return f"""
    WITH _hx0 AS (
      SELECT {id_col} AS did, {html_title_expr(d, html_col)} AS title,
             {html_text_expr(d, html_col)} AS stripped
      FROM {table}
    ),
    {_hx_tail(d, id_col, max_line_docs=max_line_docs,
              min_line_chars=min_line_chars).strip()}
    """


def html_extract(
    df,
    id_col: str,
    html_col: str,
    *,
    max_line_docs: int = 5,
    min_line_chars: int = 10,
):
    """DataFrame front door for :func:`html_extract_sql`, with the
    strip relation STAGED (lazy localCheckpoint — the theil_sen/logrank
    convention): ``_hx0`` feeds both the explode chain and the final
    per-page join, and Catalyst inlines CTEs per reference, so the
    one-statement form would run the 6-pass regex chain twice."""
    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK as _S

    for c in (id_col, html_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    view = "_ts_hx_in"
    df.createOrReplaceTempView(view)
    staged = spark.sql(f"""
        SELECT {id_col} AS did, {html_title_expr(_S, html_col)} AS title,
               {html_text_expr(_S, html_col)} AS stripped
        FROM {view}
    """).localCheckpoint(eager=False)
    staged.createOrReplaceTempView("_ts_hx0_staged")
    return spark.sql(f"""
    WITH _hx0 AS (SELECT * FROM _ts_hx0_staged),
    {_hx_tail(_S, id_col, max_line_docs=max_line_docs,
              min_line_chars=min_line_chars).strip()}
    """)


# anchor tags: href in double quotes (the synthesized-corpus contract;
# single-quoted/bare href values are crawl-frontier variants a
# production pattern would add as alternates).  No backreferences —
# RE2-safe; non-greedy body so adjacent anchors don't merge.
_ANCHOR_PATTERN = '(?is)<a\\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def html_links_sql(
    d: Dialect,
    table: str,
    id_col: str,
    html_col: str,
) -> str:
    """Outlink extraction — the crawl-frontier/link-graph step: every
    ``<a href="...">`` in every page becomes one edge row
    ({id_col}, pos, href, anchor) where ``pos`` is the link's order on
    the page, ``href`` the raw target (feed it to url_normalize_sql /
    registered_domain_expr downstream), and ``anchor`` the link's
    VISIBLE text (inline tags stripped, entities decoded, whitespace
    collapsed, trimmed) — the classic web-IR relevance signal
    (anchor text describes the TARGET, not the source).

    Shape: regexp_extract_all finds whole-match anchor tags (one
    engine-native pass per row), posexplode/unnest fans them out, and
    href/anchor extract per match — a pure scan-side explode with ZERO
    shuffles; downstream aggregations (in-link counts, per-domain
    frontier dedup) decide their own keys.  Pages with no links emit
    no rows (edges, not pages, are the unit here — LEFT-join back to
    the page table when page coverage matters).
    """
    matches = d.regexp_extract_all(html_col, _ANCHOR_PATTERN)
    href = f"regexp_extract(m, {d._q(_ANCHOR_PATTERN)}, 1)"
    anchor_raw = f"regexp_extract(m, {d._q(_ANCHOR_PATTERN)}, 2)"
    anchor = d.regexp_sub(anchor_raw, "<[^>]*>", " ")
    anchor = _entity_decode(d, anchor)
    anchor_ws = d.regexp_sub(anchor, "[ \\t\\r\\n]+", " ")
    anchor = f"trim({anchor_ws})"
    if d.name == "spark":
        ex = (
            # OUTER + null-filter ≡ plain posexplode (regexp_extract_all
            # elements are never NULL) — the inferred size(_ms)>0 scan
            # constraint would re-run the anchor regex per row.
            f"SELECT did, pos, m FROM "
            f"(SELECT {id_col} AS did, {matches} AS _ms FROM {table}) "
            f"LATERAL VIEW OUTER posexplode(_ms) t AS pos, m "
            f"WHERE m IS NOT NULL"
        )
    else:
        ex = (
            f"SELECT did, i - 1 AS pos, _ms[i] AS m FROM "
            f"(SELECT did, _ms, unnest(range(1, len(_ms) + 1)) AS i FROM "
            f"(SELECT {id_col} AS did, {matches} AS _ms FROM {table}))"
        )
    return f"""
    SELECT did AS {id_col}, CAST(pos AS INT) AS pos,
           {href} AS href,
           {anchor} AS anchor
    FROM ({ex}) _hle
    """


def html_links(df, id_col: str, html_col: str):
    """DataFrame front door for :func:`html_links_sql` (single-pass
    projection + explode — nothing to stage)."""
    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK as _S

    for c in (id_col, html_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_hl_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(html_links_sql(_S, view, id_col, html_col))
