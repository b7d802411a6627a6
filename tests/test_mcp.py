"""MCP stdio protocol tests (SURVEY §3.3 entry point).

``handle_request`` is driven as a pure request→response function with
the reference's JSON-RPC shapes (mcp-server/main.go:111-122 dispatch,
:525-548 framing), and ``serve`` is driven through StringIO as the
line-delimited loop including the -32700 parse-error path."""

from __future__ import annotations

import io
import json

import pytest

from codegraph_spark.graph import PropertyGraph
from codegraph_spark.mcp import TOOL_DEFINITIONS, handle_request, serve
from codegraph_spark.services import MCPService

NODE_SCHEMA = (
    "id string, label string, name string, symbol string, path string,"
    " start_line int, end_line int, complexity int, signature string,"
    " docstring string"
)


@pytest.fixture(scope="module")
def svc(spark):
    nodes = spark.createDataFrame(
        [
            ("sym:S", "Symbol", "S", "scip-go gomod other v1 S#", None, None, None, None, None, None),
            ("fn:f1", "Function", "f1", None, "f.go", 1, 5, 3, "f1()", None),
            ("fn:f2", "Function", "f2", None, "f.go", 7, 12, 15, "f2()", None),
        ],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            ("fn:f1", "fn:f2", "CALLS"),
            ("fn:f1", "sym:S", "REFERENCES"),
        ],
        "src string, dst string, type string",
    )
    return MCPService(PropertyGraph(nodes, edges).persist())


def test_initialize(svc):
    resp = handle_request(svc, {"id": 1, "method": "initialize"})
    assert resp["jsonrpc"] == "2.0" and resp["id"] == 1
    r = resp["result"]
    assert r["protocolVersion"] == "2024-11-05"
    assert "tools" in r["capabilities"]
    assert r["serverInfo"]["name"]


def test_tools_list(svc):
    resp = handle_request(svc, {"id": 2, "method": "tools/list"})
    names = [t["name"] for t in resp["result"]["tools"]]
    assert names == [
        "codegraph_search",
        "codegraph_get_source",
        "codegraph_find_references",
        "codegraph_analyze_function",
    ]
    assert all("inputSchema" in t for t in TOOL_DEFINITIONS)


def test_tool_call_search(svc):
    resp = handle_request(
        svc,
        {
            "id": 3,
            "method": "tools/call",
            "params": {"name": "codegraph_search", "arguments": {"query": "f1"}},
        },
    )
    body = json.loads(resp["result"]["content"][0]["text"])
    assert any(r["name"] == "f1" for r in body["results"])
    assert "isError" not in resp["result"]


def test_tool_call_analyze_function(svc):
    resp = handle_request(
        svc,
        {
            "id": 4,
            "method": "tools/call",
            "params": {
                "name": "codegraph_analyze_function",
                "arguments": {"function_name": "f1"},
            },
        },
    )
    body = json.loads(resp["result"]["content"][0]["text"])
    assert body["name"] == "f1"
    assert body["metadata"]["signature"] == "f1()"
    assert "f2" in body["callees"]


def test_tool_call_missing_required_arg_is_in_band_error(svc):
    resp = handle_request(
        svc,
        {"id": 5, "method": "tools/call", "params": {"name": "codegraph_search", "arguments": {}}},
    )
    assert resp["result"]["isError"] is True


def test_protocol_errors(svc):
    assert handle_request(svc, {"id": 6, "method": "nope"})["error"]["code"] == -32601
    assert (
        handle_request(
            svc, {"id": 7, "method": "tools/call", "params": {"name": "bad_tool"}}
        )["error"]["code"]
        == -32601
    )
    assert (
        handle_request(svc, {"id": 8, "method": "tools/call", "params": {}})["error"]["code"]
        == -32602
    )


def test_serve_loop(svc):
    stdin = io.StringIO(
        "\n"
        + json.dumps({"id": 1, "method": "initialize"})
        + "\n{not json}\n"
        + json.dumps({"id": 2, "method": "tools/list"})
        + "\n"
    )
    stdout = io.StringIO()
    serve(svc, stdin, stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(lines) == 3
    assert lines[0]["id"] == 1 and "result" in lines[0]
    assert lines[1]["error"]["code"] == -32700
    assert lines[2]["id"] == 2 and "tools" in lines[2]["result"]
