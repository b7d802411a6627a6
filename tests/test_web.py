"""Raw-web front door: rule-level pins for the HTML main-content
extraction column programs (codegraph_spark/queries/web.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraph_spark.queries.web import (
    _keep,
    html_block_stats,
    html_wrap,
)


@pytest.fixture(scope="module")
def spark():
    from codegraph_spark.session import get_spark

    s = get_spark(app_name="test-web")
    yield s


def _blocks(spark, page: str):
    df = spark.createDataFrame([(page,)], "page string")
    out = df.select(
        html_block_stats(F.col("page")).alias("b"),
        F.filter(html_block_stats(F.col("page")), _keep).alias("k"),
    ).first()
    return [r.asDict() for r in out["b"]], [r.asDict() for r in out["k"]]


def test_rules_on_handcrafted_page(spark):
    page = (
        "<html><head><title>Tiny title</title>"
        "<style>p{x:1}</style><script>var a=1;</script></head><body>"
        '<div><a href="/">Home</a><a href="/x">X</a></div>'
        "<p>seven plain words of honest body prose</p>"
        '<p>words around <a href="/in">an inline anchor</a> stay whole here</p>'
        '<p><a href="/a">Link farm one</a> <a href="/b">link farm two</a></p>'
        "<p>too short</p>"
        "</body></html>"
    )
    blocks, kept = _blocks(spark, page)
    txts = [b["txt"] for b in blocks]
    # style/script gone entirely, not just dropped
    assert not any("var a" in t or "x:1" in t for t in txts)
    # title present as a block but under the word floor
    assert "Tiny title" in txts
    kept_txts = [k["txt"] for k in kept]
    assert kept_txts == [
        "seven plain words of honest body prose",
        "words around an inline anchor stay whole here",
    ]
    # the link farm fails DENSITY, not the word floor (6 words >= 5)
    farm = next(b for b in blocks if "farm" in b["txt"])
    assert farm["wc"] >= 5
    assert farm["link_len"] * 10 > len(farm["txt"]) * 4


def test_entity_unescape_and_density_integer_rule(spark):
    page = "<p>alpha &amp; beta &lt;tag&gt; gamma delta</p>"
    blocks, kept = _blocks(spark, page)
    assert kept and kept[0]["txt"] == "alpha & beta <tag> gamma delta"
    # wc counts pre-unescape tokens: 6 words
    assert kept[0]["wc"] == 6


def test_wrap_is_pure_function_of_inputs(spark):
    df = spark.createDataFrame(
        [(7, "one two three four five six seven eight nine ten eleven "
             "twelve thirteen spark", "srcA")],
        "doc_id long, text string, source string",
    )
    page = df.select(
        html_wrap(F.col("text"), F.col("doc_id"), F.col("source")).alias("p")
    ).first()["p"]
    assert page.startswith("<html><head><title>Doc 7 srcA</title>")
    # 14 words -> two <p> chunks; 'spark' linkified inside the second
    assert page.count("<p>") == 3  # 2 body chunks + the planted link farm
    assert '<a href="/w/spark">spark</a>' in page
    df2 = spark.createDataFrame([(page,)], "page string")
    out = df2.select(
        F.filter(html_block_stats(F.col("page")), _keep).alias("k")
    ).first()["k"]
    assert [r["txt"] for r in out] == [
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    # trailing 2-word chunk ('thirteen spark') is under the word floor
