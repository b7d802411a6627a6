"""robots.txt gate semantics pins: group attribution (the badbot decoy
group must NOT leak into '*' rules), prefix matching ('/a/1' blocks
'/a/10'), longest-match with Allow winning ties, default-allow when no
rule matches, and Crawl-delay extraction."""

from __future__ import annotations

import os
import tempfile

import pytest


def test_parse_robots_group_attribution(spark):
    from codegraph_spark.queries.web import parse_robots

    robots = spark.createDataFrame(
        [(
            "d.example.org",
            "User-agent: badbot\nDisallow: /\n\n"
            "User-agent: *\nCrawl-delay: 7\nDisallow: /x\nAllow: /x/ok\n"
            "Disallow: \n",  # empty pattern = allow-all no-op, dropped
        )],
        "domain string, txt string",
    )
    rules, delays = parse_robots(robots)
    got = sorted((r["allow"], r["pat"]) for r in rules.collect())
    # the badbot group's 'Disallow: /' must be absent
    assert got == [(0, "/x"), (1, "/x/ok")]
    assert delays.collect()[0]["crawl_delay_s"] == 7


def test_parse_robots_merged_ua_group(spark):
    # RFC 9309 §2.2.1: consecutive User-agent lines form ONE group.
    # '*' is FIRST here, so a last-UA-wins parser would hand these
    # rules to otherbot and return nothing for '*'.
    from codegraph_spark.queries.web import parse_robots

    robots = spark.createDataFrame(
        [(
            "d.example.org",
            "User-agent: *\nUser-agent: otherbot\n"
            "Crawl-delay: 3\nDisallow: /y\n\n"
            "User-agent: otherbot\nDisallow: /only-other\n",
        )],
        "domain string, txt string",
    )
    rules, delays = parse_robots(robots)
    got = sorted((r["allow"], r["pat"]) for r in rules.collect())
    # the merged group's rule is kept; the otherbot-only group's is not
    assert got == [(0, "/y")]
    assert delays.collect()[0]["crawl_delay_s"] == 3


@pytest.fixture(scope="module")
def robots_dir(spark):
    # src0 (d=0): Disallow /a/0, Allow /a/0?, Disallow /private,
    #             Disallow /   (d%4==0 -> default-deny domain)
    # src1 (d=1): Disallow /a/1, Allow /a/1?, Disallow /private,
    #             Disallow /a/*7$   (d%3==1 -> wildcard rule)
    # doc_id picks the URL variant (doc_id%5) and path bucket
    # (doc_id%37) per the corpus URL rule:
    #   5   src0 v0 pid 5  -> /a/5        blocked by '/' (len 1)
    #   222 src0 v2 pid 0  -> /a/0?id=0   Allow '/a/0?' (5) beats
    #                                      Disallow '/a/0' (4) and '/'
    #   10  src1 v0 pid 10 -> /a/10       blocked: '/a/1' PREFIX match
    #   38  src1 v3 pid 1  -> /a/1#sec    fragment stripped -> blocked
    #   77  src1 v2 pid 3  -> /a/3?id=3   no rule matches -> default
    #   112 src1 v2 pid 1  -> /a/1?id=1   Allow '/a/1?' wins by length
    #   81  src1 v1 pid 7  -> /a/7        only '/a/*7$' matches
    #                                     (wildcard + end anchor, len 6)
    # src2 (d=2): MERGED UA group ('*' then otherbot) owns the rules —
    #             a last-UA-wins parser loses them all:
    #   76  src2 v1 pid 2  -> /a/2        blocked by '/a/2' (len 4)
    docs = spark.createDataFrame(
        [
            (5, "t", "src0"),
            (222, "t", "src0"),
            (10, "t", "src1"),
            (38, "t", "src1"),
            (77, "t", "src1"),
            (112, "t", "src1"),
            (81, "t", "src1"),
            (76, "t", "src2"),
        ],
        "doc_id long, text string, source string",
    )
    d = tempfile.mkdtemp(prefix="robots_")
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_gate_decisions(spark, robots_dir):
    from codegraph_spark.queries.web import web_robots_gate

    rows = {
        r["domain"]: r.asDict()
        for r in web_robots_gate(spark, robots_dir).collect()
    }
    assert rows["src0.example.org"] == {
        "domain": "src0.example.org",
        "crawl_delay_s": 1,
        "n_urls": 2,
        "n_allowed": 1,
        "n_blocked": 1,
        "blocked_idsum": 5,
        "n_default": 0,
        "rule_lensum": 1 + 5,
    }
    assert rows["src1.example.org"] == {
        "domain": "src1.example.org",
        "crawl_delay_s": 2,
        "n_urls": 5,
        "n_allowed": 2,
        "n_blocked": 3,
        "blocked_idsum": 10 + 38 + 81,
        "n_default": 1,
        # 10 and 38 via '/a/1' (4), 112 via '/a/1?' (5), 81 via the
        # wildcard '/a/*7$' (6) — the lensum pins the wildcard fired
        "rule_lensum": 4 + 4 + 5 + 6,
    }
    assert rows["src2.example.org"] == {
        "domain": "src2.example.org",
        "crawl_delay_s": 3,  # 1 + 2%3 — proves the merged group parsed
        "n_urls": 1,
        "n_allowed": 0,
        "n_blocked": 1,
        "blocked_idsum": 76,
        "n_default": 0,
        "rule_lensum": 4,
    }
