"""URL normalization / registered-domain / domain-cap unit tests.

The registered queries check Spark≡DuckDB on the synthesized corpus;
these tests pin the individual normalization RULES on handcrafted URLs,
cross-engine, so a rule regression is caught at the rule, not as an
opaque hash mismatch.
"""

import duckdb
import pandas as pd
import pytest

from time_sift_spark.functions.text_fns import DUCK, SPARK
from time_sift_spark.operators.web import domain_cap_sample_sql, url_normalize_sql

CASES = [
    # (raw URL, expected url_norm, expected registered_domain)
    ("HTTP://WWW.Example.COM/Path/a/", "http://example.com/Path/a", "example.com"),
    ("https://news.example.co.uk:443/x", "https://news.example.co.uk/x", "example.co.uk"),
    ("http://example.com:80/", "http://example.com/", "example.com"),
    # non-default port is identity — kept
    ("http://example.com:8080/x", "http://example.com:8080/x", "example.com:8080"),
    ("https://a.b.example.com.au/y#frag", "https://a.b.example.com.au/y", "example.com.au"),
    ("https://example.org", "https://example.org/", "example.org"),
    ("https://example.org./x", "https://example.org/x", "example.org"),
    (
        "https://example.org/x?utm_source=s&z=9&a=1&fbclid=abc",
        "https://example.org/x?a=1&z=9",
        "example.org",
    ),
    # tracking-only query string → no '?' at all
    ("https://example.org/x?utm_campaign=c", "https://example.org/x", "example.org"),
    # bare two-label and single-label hosts pass through the default rule
    ("https://localhost/x", "https://localhost/x", "localhost"),
    ("http://sub.deep.example.com/", "http://sub.deep.example.com/", "example.com"),
]


def _both(pdf: pd.DataFrame, sql_fn, *args, **kwargs):
    from tests.test_dialect_fuzz import _get_session

    spark = _get_session()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_t_urls")
    got = spark.sql(sql_fn(SPARK, "_t_urls", *args, **kwargs)).toPandas()
    con = duckdb.connect()
    con.register("_t_urls", pdf)
    exp = con.execute(sql_fn(DUCK, "_t_urls", *args, **kwargs)).df()
    return got, exp


def test_url_normalize_rules_cross_engine():
    pdf = pd.DataFrame(
        {"doc_id": range(len(CASES)), "url": [c[0] for c in CASES]}
    )
    got, exp = _both(pdf, url_normalize_sql, "doc_id", "url")
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for i, (_, want_norm, want_dom) in enumerate(CASES):
        row = got[got.doc_id == i].iloc[0]
        assert row.url_norm == want_norm, (i, row.url_norm, want_norm)
        # the registered_domain of a host with a kept port includes it
        # only because the port is part of the last label text — accept
        # the documented behavior for the one non-default-port case
        assert row.registered_domain == want_dom, (i, row.registered_domain, want_dom)


def test_domain_cap_cross_engine_and_cap():
    # 12 URLs on one registered domain (3 subdomains), 2 on another
    urls = [f"https://s{i % 3}.bigsite.com/p/{i}" for i in range(12)] + [
        "https://small.org/a",
        "https://small.org/b",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
    got, exp = _both(pdf, domain_cap_sample_sql, "doc_id", "url", cap=4)
    key = ["registered_domain", "domain_rank"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    by_dom = got.groupby("registered_domain").size().to_dict()
    assert by_dom == {"bigsite.com": 4, "small.org": 2}


def test_spelling_dedup_before_domain_cap():
    # two spellings of one URL + one distinct URL, cap well above count:
    # the url_norm rank must collapse the spellings to ONE kept row
    urls = [
        "https://WWW.site.com/x?utm_source=a",
        "https://site.com/x",
        "https://site.com/y",
    ]
    pdf = pd.DataFrame({"doc_id": range(3), "url": urls})
    got, _ = _both(pdf, domain_cap_sample_sql, "doc_id", "url", cap=10)
    assert len(got) == 2
    assert set(got.url_norm) == {"https://site.com/x", "https://site.com/y"}


# --------------------------------------------------------------------------
# HTML → main-text extraction (r12)
# --------------------------------------------------------------------------

_PAGES = [
    # 1: full page — title, style, script, comment, nav, unique body,
    #    entities, footer
    (
        1,
        '<html><head><title> Alpha &amp; Beta </title>'
        "<style>body{margin:0}</style><script>var a=1;</script></head>"
        '<body><div id="nav"><a href="/">Home</a> | <a href="/n">News</a>'
        "</div><!-- cms --><h1>Unique heading one</h1>"
        "<p>the quick brown fox jumps over the lazy dog</p>"
        "<p>Tags: a &amp; b &lt;en&gt; #1</p>"
        "<div>Copyright 2024 Example Media. All rights reserved.</div>"
        "</body></html>",
    ),
    (
        2,
        '<body><div id="nav"><a href="/">Home</a> | <a href="/n">News</a>'
        "</div><p>pack my box with five dozen liquor jugs</p>"
        "<div>Copyright 2024 Example Media. All rights reserved.</div></body>",
    ),
    (
        3,
        '<body><div id="nav"><a href="/">Home</a> | <a href="/n">News</a>'
        "</div><p>sphinx of black quartz judge my vow</p>"
        "<div>Copyright 2024 Example Media. All rights reserved.</div></body>",
    ),
    # 4: page that is ALL chrome — extracts to ''
    (
        4,
        '<body><div id="nav"><a href="/">Home</a> | <a href="/n">News</a>'
        "</div><div>Copyright 2024 Example Media. All rights reserved.</div>"
        "</body>",
    ),
]


def _extract_both(pdf: pd.DataFrame, **kwargs):
    from time_sift_spark.operators.web import html_extract, html_extract_sql

    from tests.test_dialect_fuzz import _get_session

    spark = _get_session()
    sdf = spark.createDataFrame(pdf)
    got = (
        html_extract(sdf, "doc_id", "html", **kwargs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("_t_pages", pdf)
    exp = (
        con.execute(html_extract_sql(DUCK, "_t_pages", "doc_id", "html", **kwargs))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return got, exp


def test_html_extract_rules_cross_engine():
    pdf = pd.DataFrame(
        {"doc_id": [p[0] for p in _PAGES], "html": [p[1] for p in _PAGES]}
    )
    got, exp = _extract_both(pdf, max_line_docs=2)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    by_id = {r.doc_id: r for r in got.itertuples()}
    # title extracted and trimmed, entity decoded
    assert by_id[1].title == "Alpha & Beta"
    assert by_id[2].title == ""
    # chrome lines (nav 3×>2, copyright 4×>2) dropped; prose kept
    assert "Home" not in by_id[1].main_text
    assert "Copyright" not in by_id[1].main_text
    assert "the quick brown fox jumps over the lazy dog" in by_id[1].main_text
    # script/style/comment content never surfaces
    assert "var a=1" not in by_id[1].main_text
    assert "margin" not in by_id[1].main_text
    assert "cms" not in by_id[1].main_text
    # entities decode exactly once; title text is a kept page line
    assert "Tags: a & b <en> #1" in by_id[1].main_text
    # all-chrome page extracts to '' but still emits its row
    assert by_id[4].main_text == ""
    assert by_id[4].n_kept == 0 and by_id[4].n_boiler == 2
    # line accounting: n_lines = kept + boiler, nonempty only
    assert all(r.n_lines == r.n_kept + r.n_boiler for r in got.itertuples())


def test_html_extract_short_line_exemption_and_df_cap():
    # the SAME short line ('Menu') in every page is EXEMPT from the df
    # rule (< min_line_chars); a long repeated line is dropped only
    # when df EXCEEDS the cap (> , not >=)
    pages = [
        (i, "<p>Menu</p><p>unique prose line number %d here</p>"
            "<p>a repeated long boilerplate line</p>" % i)
        for i in range(1, 5)
    ]
    pdf = pd.DataFrame({"doc_id": [p[0] for p in pages], "html": [p[1] for p in pages]})
    got, exp = _extract_both(pdf, max_line_docs=4, min_line_chars=10)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # df == 4 == cap → kept (strictly-greater rule)
    assert all("a repeated long boilerplate line" in t for t in got.main_text)
    got2, exp2 = _extract_both(pdf, max_line_docs=3, min_line_chars=10)
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)
    assert all("a repeated long boilerplate line" not in t for t in got2.main_text)
    # short 'Menu' survives every cap
    assert all("Menu" in t for t in got2.main_text)


def test_html_links_extraction_rules():
    from time_sift_spark.operators.web import html_links, html_links_sql

    from tests.test_dialect_fuzz import _get_session

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "html": [
            '<body><a href="/x">One &amp; two</a> mid '
            '<a class="z" href="/y"><b>Bold</b>  link</a>'
            '<a name="anchor-only">no href → no edge</a></body>',
            "<body>no links at all</body>",
        ],
    })
    spark = _get_session()
    sdf = spark.createDataFrame(pdf)
    got = (
        html_links(sdf, "doc_id", "html")
        .toPandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    import duckdb

    con = duckdb.connect()
    con.register("_t_hl", pdf)
    exp = (
        con.execute(html_links_sql(DUCK, "_t_hl", "doc_id", "html"))
        .df().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # href captured raw; anchor text tag-stripped, entity-decoded,
    # whitespace-collapsed; href-less anchors and linkless pages: no rows
    assert list(got.itertuples(index=False)) == [
        (1, 0, "/x", "One & two"),
        (1, 1, "/y", "Bold link"),
    ]


def test_title_nbsp_trim_and_br_variant_tightening():
    """ADVICE r12: (a) title trims AFTER entity decode, so
    '&nbsp;X' → 'X' not ' X'; (b) only real <br> variants get line
    semantics — a tag merely NAMED br* (<brand …>) strips to a space
    like any other inline tag instead of splitting the line."""
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "html": [
            "<html><head><title>&nbsp;Gamma&nbsp;</title></head>"
            "<body><p>first unique prose piece here<br/>"
            "second unique prose piece here</p></body>",
            "<body><p>alpha prose segment <brand x>omega prose segment"
            "</p><p>third line via br attr<br class=c>fourth line via"
            " self close<br /></p></body>",
            "<body><p>plain page with one single prose line</p></body>",
        ],
    })
    got, exp = _extract_both(pdf, max_line_docs=3)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    by_id = {r.doc_id: r for r in got.itertuples()}
    # decode-then-trim: no residual entity whitespace around the title
    assert by_id[1].title == "Gamma"
    # <br/> splits: the two prose pieces are SEPARATE lines
    lines1 = by_id[1].main_text.split("\n")
    assert "first unique prose piece here" in lines1
    assert "second unique prose piece here" in lines1
    # <brand x> does NOT split: both segments stay on ONE line
    lines2 = by_id[2].main_text.split("\n")
    assert any(
        "alpha prose segment" in ln and "omega prose segment" in ln
        for ln in lines2
    )
    # <br attr> and <br /> still split
    assert "third line via br attr" in lines2
    assert "fourth line via self close" in lines2


def test_streaming_twins_reject_numeric_time_column():
    """ADVICE r12: streaming_pettitt / streaming_ks_test enforce the
    same assert_time_dtype contract as their batch siblings — an
    epoch-long time column must raise, not CAST per-engine."""
    import pytest

    from time_sift_spark.operators.quality import streaming_ks_test
    from time_sift_spark.operators.trend import streaming_pettitt

    from tests.test_dialect_fuzz import _get_session

    spark = _get_session()
    pdf = pd.DataFrame({"u": ["a", "b"], "ts": [1_000_000, 2_000_000],
                        "v": [1.0, 2.0]})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(TypeError, match="dtype"):
        streaming_pettitt(sdf, "v", "ts", "u", query_name="_t_sp_reject")
    with pytest.raises(TypeError, match="dtype"):
        streaming_ks_test(sdf, sdf, "v", "ts", "u", "2024-01-01",
                          query_name="_t_sk_reject")
