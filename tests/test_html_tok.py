"""Tolerant HTML tokenizer (operators/html_tok.py) — unit pins for
every tolerance feature, plus the AGREEMENT property the module
promises: on well-formed pages the state machine emits exactly the
same (txt, wc, link_len) block structs as the regex path
(queries/web.html_block_stats), so the two tokenizers are
interchangeable input adapters in front of the same extraction rules.

Agreement domain (documented in html_tok.py): pages whose text lives
inside closed leaf block elements (no stray text between blocks — the
regex path merges it into the following block, the state machine
treats it as its own anonymous block, matching browser rendering),
anchors closed within their block with markup-free text, entities
from the named lt/gt/amp set (numeric references are a tokenizer-only
extension), and tags well-formed (no '>' inside attribute values — a
regex-path limitation, which is the point of the dirty gate).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from codegraph_spark.operators.html_tok import tokenize_blocks, unescape


# --- a faithful Python mirror of queries/web.html_block_stats ----------------
def regex_blocks(page: str) -> list[tuple[str, int, int]]:
    cleaned = re.sub(r"<script[^>]*>[^<]*</script>", "", page)
    cleaned = re.sub(r"<style[^>]*>[^<]*</style>", "", cleaned)
    lined = re.sub(r"</(p|div|title|h[1-6]|li)>|<br */?>", "\n", cleaned)
    out = []
    for raw in lined.split("\n"):
        sx = re.sub(r"<[^>]+>", "", raw).strip()
        if not sx:
            continue
        link = sum(len(t) for t in re.findall(r"<a[^>]*>([^<]*)</a>", raw))
        wc = sum(1 for w in sx.split(" ") if w)
        txt = (
            sx.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
        )
        out.append((txt, wc, link))
    return out


# --- unit pins: one per tolerance feature -------------------------------------
def test_script_body_with_markup_dropped():
    page = (
        "<p>real prose stays here fine</p>"
        '<script>if(a<b){document.write("<p>fake junk</p>");}</script>'
        "<p>more real prose stays too</p>"
    )
    assert [b[0] for b in tokenize_blocks(page)] == [
        "real prose stays here fine",
        "more real prose stays too",
    ]
    # and the regex path DOES leak it — the gap this module closes
    assert any("fake junk" in b[0] for b in regex_blocks(page))


def test_style_body_with_gt_dropped():
    page = "<style>p{margin:0}/*a>b*/</style><p>kept words here now ok</p>"
    assert tokenize_blocks(page) == [("kept words here now ok", 5, 0)]


def test_attr_value_with_gt():
    page = '<p class="c" data-q="5>3">five words live right here</p>'
    assert tokenize_blocks(page) == [("five words live right here", 5, 0)]
    assert regex_blocks(page) != tokenize_blocks(page)  # regex cuts at 5>


def test_comment_and_cdata_dropped():
    page = (
        "<!-- <p>ghost prose</p> --><p>a b c d e</p>"
        "<![CDATA[<p>cdata ghost</p>]]>"
    )
    assert tokenize_blocks(page) == [("a b c d e", 5, 0)]


def test_unterminated_comment_drops_to_eof():
    assert tokenize_blocks("<p>x y</p><!-- runaway <p>ghost</p>") == [
        ("x y", 2, 0)
    ]


def test_unclosed_p_recovered_at_next_block_open():
    page = "<p>first open block here<p>second block words</p>"
    assert [b[0] for b in tokenize_blocks(page)] == [
        "first open block here",
        "second block words",
    ]


def test_unclosed_rawtext_drops_to_eof():
    assert tokenize_blocks("<p>a b</p><script>var x = 1;") == [("a b", 2, 0)]


def test_numeric_entities():
    page = "<p>&#72;&#101;&#x6C;&#x6C;&#111; world of words</p>"
    (txt, wc, link), = tokenize_blocks(page)
    assert txt == "Hello world of words"
    assert wc == 4  # wc counts PRE-unescape words, entity clump = 1 word


def test_bare_lt_is_literal_text():
    assert tokenize_blocks("<p>a < b and c</p>") == [("a < b and c", 5, 0)]


def test_truncated_tag_at_eof_consumed():
    assert tokenize_blocks('<p>a b</p><div class="x') == [("a b", 2, 0)]


def test_anchor_link_len_raw_and_nested_anchor():
    page = '<p>pad <a href="/x">one &amp; two</a> tail</p>'
    (txt, wc, link), = tokenize_blocks(page)
    assert txt == "pad one & two tail"
    assert link == len("one &amp; two")  # RAW anchor text, like the regex path
    assert regex_blocks(page) == [(txt, wc, link)]


def test_unescape_matches_sequential_replace():
    for s in ["&amp;lt;", "&lt;amp;", "a&amp;&lt;b", "&amp;amp;", "a & b",
              "&ampx", "&amp;x", "x&y", "&"]:
        seq = s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
        assert unescape(s) == seq, s


def test_empty_and_whitespace_pages():
    assert tokenize_blocks("") == []
    assert tokenize_blocks("   ") == []
    assert tokenize_blocks("<p>   </p><div></div>") == []


# --- hypothesis: agreement with the regex path on well-formed pages ----------
_WORD = st.one_of(
    st.text(alphabet="abcdefghij", min_size=1, max_size=8),
    st.sampled_from(["&lt;", "&gt;", "&amp;", "x&y", "a1", "Z9"]),
)
_WORDS = st.lists(_WORD, min_size=0, max_size=10)


@st.composite
def _leaf_block(draw):
    tag = draw(st.sampled_from(["p", "div", "h2", "li"]))
    words = draw(_WORDS)
    pieces = []
    if words and draw(st.booleans()):
        # embed a closed anchor with markup-free text
        k = draw(st.integers(0, len(words) - 1))
        atext = " ".join(words[k:])
        pieces = [" ".join(words[:k]), f'<a href="/w">{atext}</a>']
        body = " ".join(p for p in pieces if p)
    else:
        body = " ".join(words)
    if draw(st.booleans()):
        body = body.replace(" ", "  ", 1)  # a double space survives both paths
    if words and draw(st.booleans()):
        body += "<br>" + " ".join(draw(_WORDS))  # br splits in both paths
    return f"<{tag}>{body}</{tag}>"


_PAGE = st.lists(_leaf_block(), min_size=0, max_size=6).map(
    lambda blocks: (
        "<html><head><title>tiny page title</title>"
        "<style>p{margin:0}</style><script>var t=1;</script></head><body>"
        + "".join(blocks)
        + "</body></html>"
    )
)


@settings(max_examples=300, deadline=None)
@given(_PAGE)
def test_agreement_with_regex_path_on_wellformed(page):
    assert tokenize_blocks(page) == regex_blocks(page)


# --- agreement on the ACTUAL wrap corpus (Spark regex path vs tokenizer) ------
@pytest.mark.usefixtures("spark")
def test_agreement_on_html_wrap_corpus(spark, sf_dir):
    """The engine-level pin: html_block_stats (the JVM column program)
    and tokenize_blocks emit identical block structs over every
    html_wrap page of the test corpus — the two tokenizers are
    interchangeable in front of the same rules."""
    from pyspark.sql import functions as F

    from codegraph_spark.queries.web import html_block_stats, html_wrap
    from codegraph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    page = html_wrap(F.col("text"), F.col("doc_id"), F.col("source"))
    rows = (
        docs.select(
            "doc_id",
            page.alias("page"),
            html_block_stats(page).alias("b"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert rows
    for r in rows:
        got = tokenize_blocks(r["page"])
        want = [(s["txt"], s["wc"], s["link_len"]) for s in r["b"]]
        assert got == want, f"doc {r['doc_id']} diverged"
