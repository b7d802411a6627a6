"""CLI surface: parser shape parity with the reference's command tree
(cmd/codegraph/main.go). End-to-end CLI runs spawn their own
SparkSession, so here we check parsing only; the commands themselves
are the service methods covered by tests/test_services.py."""

from __future__ import annotations

import pytest

from codegraph_spark.__main__ import _build_parser


@pytest.mark.parametrize(
    "argv,expect",
    [
        (["index", "project", "./src", "--out", "/tmp/g"], ("index", "project")),
        (["index", "scip", "x.scip", "--out", "/tmp/g"], ("index", "scip")),
        (["--graph", "/tmp/g", "query", "search", "Client", "--limit", "10"], ("query", "search")),
        (["--graph", "/tmp/g", "query", "source", "fn"], ("query", "source")),
        (["--graph", "/tmp/g", "lsp", "definition", "scip-go gomod m v1 T#"], ("lsp", "definition")),
        (["--graph", "/tmp/g", "lsp", "completion", "pre", "--limit", "5"], ("lsp", "completion")),
        (["--sf-dir", "/d", "analyze", "impact", "sym", "--max-depth", "5"], ("analyze", "impact")),
        (["--sf-dir", "/d", "analyze", "callgraph", "n1", "--direction", "both"], ("analyze", "callgraph")),
        (["--graph", "/tmp/g", "schema", "validate"], ("schema", "validate")),
        (["--graph", "/tmp/g", "schema", "info"], ("schema", "info")),
        (["--graph", "/tmp/g", "schema", "create"], ("schema", "create")),
        (["--graph", "/tmp/g", "schema", "drop"], ("schema", "drop")),
        (["index", "docs", "./docs", "--out", "/tmp/g"], ("index", "docs")),
    ],
)
def test_cli_parses_reference_command_tree(argv, expect):
    args = _build_parser().parse_args(argv)
    assert (args.cmd, args.what) == expect


def test_cli_rejects_unknown_command():
    with pytest.raises(SystemExit):
        _build_parser().parse_args(["frobnicate"])


def test_cli_references_include_declaration_flag():
    """lsp references grows --include-declaration (lsp.go:90-93)."""
    from codegraph_spark.__main__ import _build_parser

    args = _build_parser().parse_args(
        ["lsp", "references", "sym", "--include-declaration"]
    )
    assert args.include_declaration is True
    args = _build_parser().parse_args(["lsp", "references", "sym"])
    assert args.include_declaration is False


def test_cli_status_command():
    """status is a top-level command (main.go:98-128)."""
    args = _build_parser().parse_args(["status"])
    assert args.cmd == "status"


def test_cli_audit_corpus_parses():
    args = _build_parser().parse_args(
        ["--sf-dir", "/d", "audit", "corpus", "--limit", "5"]
    )
    assert (args.cmd, args.what, args.limit) == ("audit", "corpus", 5)


def test_cli_audit_corpus_runs(spark, sf_dir):
    from codegraph_spark.__main__ import _build_parser, run_command

    out = run_command(
        _build_parser().parse_args(["--sf-dir", sf_dir, "audit", "corpus", "--limit", "3"]),
        spark,
    )
    assert set(out["tables"]) == {
        "corpus_mix_summary",
        "corpus_source_audit",
        "corpus_dedup_rate",
        "corpus_quality_calibration",
    }
    for t in out["tables"].values():
        assert t["columns"] and len(t["rows"]) <= 3


def test_cli_audit_web_runs(spark, sf_dir):
    from codegraph_spark.__main__ import _build_parser, run_command

    out = run_command(
        _build_parser().parse_args(
            ["--sf-dir", sf_dir, "audit", "web", "--limit", "3"]
        ),
        spark,
    )
    assert set(out["tables"]) == {
        "text_html_boilerplate_audit",
        "text_html_extract",
    }
    for t in out["tables"].values():
        assert t["columns"] and len(t["rows"]) <= 3


def test_cli_index_docs_code_graph_flag():
    args = _build_parser().parse_args(
        ["index", "docs", "./docs", "--out", "/tmp/g", "--code-graph", "/tmp/code"]
    )
    assert args.code_graph == "/tmp/code"


def test_schema_apply_and_drop_all(spark, sf_dir):
    """schema create/drop semantics (schema.go:206-263, :343-407):
    apply reports created constraints against the live graph; drop
    clears the registry."""
    from codegraph_spark.graph import PropertyGraph
    from codegraph_spark.schema import SchemaManager

    g = PropertyGraph.from_tpch_recast(spark, sf_dir)
    sm = SchemaManager()
    applied = sm.apply(g)
    assert applied["created"]            # recast graph satisfies the keys
    assert not applied["failed"]
    dropped = sm.drop_all()
    assert len(dropped["dropped"]) == len(applied["created"]) + len(applied["skipped"])
    assert sm.constraints == []
