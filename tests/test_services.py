"""Service-surface tests (SURVEY §2.9): LSP lookups, advanced
analytics, MCP tools.

Edge types the ingestion pipelines never emit (IMPLEMENTS,
EXPOSES_API, FLOWS_TO — SURVEY §1.3 note) are exercised on a synthetic
graph, exactly as the reference leaves them query-only (§7.3 risk 5).
The MCP source-retrieval path runs against the self-indexed repo."""

from __future__ import annotations

import os

import pytest

from codegraph_spark.graph import PropertyGraph
from codegraph_spark.services import AdvancedService, LSPService, MCPService

REPO_PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)), "codegraph_spark")

NODE_SCHEMA = (
    "id string, label string, name string, symbol string, path string,"
    " start_line int, end_line int, complexity int, signature string,"
    " docstring string"
)


@pytest.fixture(scope="module")
def synth(spark):
    """Symbol S defined by interface I, implemented by class C;
    functions f1→f2→f3 CALLS chain; f3 EXPOSES_API route R;
    parameter p FLOWS_TO v1 FLOWS_TO v2."""
    nodes = spark.createDataFrame(
        [
            ("sym:S", "Symbol", "S", "scip-go gomod other v1 S#", None, None, None, None, None, None),
            ("iface:I", "Interface", "I", None, "i.go", 1, 10, None, None, None),
            ("class:C", "Class", "C", None, "c.go", 1, 20, None, None, None),
            ("fn:f1", "Function", "f1", None, "f.go", 1, 5, 3, "f1()", None),
            ("fn:f2", "Function", "f2", None, "f.go", 7, 12, 15, "f2()", None),
            ("fn:f3", "Function", "f3", None, "f.go", 14, 30, 8, "f3()", None),
            ("api:R", "APIRoute", "/r", None, None, None, None, None, None, None),
            ("param:p", "Parameter", "p", None, "f.go", 1, 1, None, None, None),
            ("var:v1", "Variable", "v1", None, "f.go", 2, 2, None, None, None),
            ("var:v2", "Variable", "v2", None, "f.go", 3, 3, None, None, None),
        ],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            ("iface:I", "sym:S", "DEFINES"),
            ("class:C", "iface:I", "IMPLEMENTS"),
            ("fn:f1", "fn:f2", "CALLS"),
            ("fn:f2", "fn:f3", "CALLS"),
            ("fn:f3", "api:R", "EXPOSES_API"),
            ("param:p", "var:v1", "FLOWS_TO"),
            ("var:v1", "var:v2", "FLOWS_TO"),
            ("fn:f1", "sym:S", "CALLS"),       # cross-package call for deps
            ("sym:S", "sym:S", "DEFINES"),     # self-define so deps resolve
            ("fn:f2", "sym:S", "REFERENCES"),  # usage site for find_references
        ],
        "src string, dst string, type string",
    )
    return PropertyGraph(nodes, edges).persist()


def test_go_to_definition(synth):
    lsp = LSPService(synth)
    out = lsp.go_to_definition("scip-go gomod other v1 S#")
    assert out is not None
    assert out["name"] == "I" and out["kind"] == "Interface"
    assert out["location"]["filePath"] == "i.go"
    assert lsp.go_to_definition("nope") is None


def test_find_implementations(synth):
    impls = LSPService(synth).find_implementations("scip-go gomod other v1 S#")
    assert [i["name"] for i in impls] == ["C"]


def test_search_and_completion(synth):
    lsp = LSPService(synth)
    hits = lsp.search("f")
    # rank: Function/Method first (query.go:368-380)
    assert hits[0]["label"] == "Function"
    assert lsp.get_completion("f") == ["f1", "f2", "f3"]
    assert lsp.get_hover("x")["error"] == "hover not implemented"


def test_analyze_impact(synth):
    out = AdvancedService(synth).analyze_impact("scip-go gomod other v1 S#")
    # S defined by I; nothing CALLS I — but fn:f1 CALLS sym:S directly,
    # and callers-of-callers walk backwards: f1 ← nothing.
    names = {r["name"] for r in out["affectedFunctions"]}
    assert names == {"f1"}


def test_impact_walks_call_chain(synth):
    # Impact of f3: callers f2 (1 hop) then f1 (2 hops); f3 EXPOSES R.
    adv = AdvancedService(synth)
    seeds = synth.nodes.filter("id = 'fn:f3'")
    from codegraph_spark.operators.traversal import bfs_reachable

    up = bfs_reachable(synth.edges, seeds.select("id"), 10,
                       edge_type="CALLS", direction="in")
    assert {r.id: r.hops for r in up.collect()} == {"fn:f2": 1, "fn:f1": 2}


def test_trace_data_flow(synth):
    out = AdvancedService(synth).trace_data_flow("param:p")
    paths = {tuple(f["path"]) for f in out["flows"]}
    assert ("param:p", "var:v1") in paths
    assert ("param:p", "var:v1", "var:v2") in paths


def test_analyze_dependencies(synth):
    out = AdvancedService(synth).analyze_dependencies("mypkg")
    deps = out["dependencies"]
    assert len(deps) == 1
    assert deps[0]["foreignServiceName"] == "other"
    assert deps[0]["callingFunctions"] == ["f1"]


def test_analyze_complexity(synth):
    out = AdvancedService(synth).analyze_complexity(threshold=10)
    assert out["totalFunctions"] == 3
    assert out["maxComplexity"] == 15
    assert out["highComplexityCount"] == 1


def test_build_call_graph(synth):
    out = AdvancedService(synth).build_call_graph("fn:f1", "out", 5)
    ids = {n["id"] for n in out["nodes"]}
    assert {"fn:f1", "fn:f2", "fn:f3"} <= ids
    assert {"src": "fn:f1", "dst": "fn:f2"} in out["edges"]


@pytest.fixture(scope="module")
def self_graph(spark):
    from codegraph_spark.sources.static_index import index_project, walk_sources

    nodes, edges = index_project(spark, REPO_PKG)
    g = PropertyGraph(nodes, edges).persist()
    files = walk_sources(spark, REPO_PKG).persist()
    return g, files


def test_mcp_on_self_index(self_graph):
    g, files = self_graph
    mcp = MCPService(g, files=files)
    assert mcp.list_tools() == ["search", "get_source", "find_references",
                                "analyze_function"]

    out = mcp.call("get_source", function_name="merge_upsert")
    assert out["source"] is not None
    assert "def merge_upsert" in out["source"]
    assert out["location"]["filePath"].endswith("operators/upsert.py")

    res = mcp.call("search", term="upsert")
    assert len(res["results"]) > 0

    an = mcp.call("analyze_function", name="merge_upsert")
    assert an["metadata"]["signature"].startswith("merge_upsert(")
    # merge_upsert is called by idempotent() in the same module
    assert "idempotent" not in an["callees"]
    assert an["error"] if "error" in an else True

    missing = mcp.call("get_source", function_name="zz_no_such")
    assert "error" in missing


def test_mcp_callers_resolved(self_graph):
    g, files = self_graph
    mcp = MCPService(g, files=files)
    an = mcp.call("analyze_function", name="idempotent")
    assert "merge_upsert" in an["callees"]


def test_find_references_include_declaration(synth):
    """IncludeDeclaration flag (FindReferencesRequest, lsp.go:90-93 —
    TODO in the reference, implemented here): declarations (DEFINES
    in-neighbors) are prepended, plain call returns usages only."""
    lsp = LSPService(synth)
    plain = lsp.find_references("scip-go gomod other v1 S#")
    assert [r["location"]["filePath"] for r in plain] == ["f.go"]
    assert all("is_declaration" not in r for r in plain)

    with_decl = lsp.find_references(
        "scip-go gomod other v1 S#", include_declaration=True
    )
    assert len(with_decl) == len(plain) + 2  # iface:I and sym:S self-define
    assert with_decl[0].get("is_declaration") is True
    decl_files = {r["location"].get("filePath") for r in with_decl if r.get("is_declaration")}
    assert "i.go" in decl_files
