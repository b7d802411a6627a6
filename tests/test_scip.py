"""SCIP pipeline tests: wire-format round-trip, A8 first-seen dedup,
F9 byte offsets (golden check: slicing the document text at
[start_byte, end_byte) must reproduce the occurrence token — the
reference's oracle at system_test.go:454-512), graph assembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraph_spark.sources.scip import (
    ROLE_DEFINITION,
    byte_offsets,
    decode_scip,
    encode_scip,
    scip_dataframes,
    scip_to_graph,
)

TEXT_A = "package main\n\nfunc Add(a int, b int) int {\n\treturn a + b\n}\n"
TEXT_B = "package main\n\nfunc Use() int {\n\treturn Add(1, 2)\n}\n"

FIXTURE = [
    {
        "relative_path": "a.go",
        "language": "Go",
        "text": TEXT_A,
        "occurrences": [
            # "Add" at line 2, cols 5-8 (0-based)
            {"symbol": "scip-go gomod m v1 Add().", "symbol_roles": ROLE_DEFINITION,
             "range": [2, 5, 2, 8]},
        ],
        "symbols": [
            {"symbol": "scip-go gomod m v1 Add().", "documentation": "adds",
             "kind": 12, "display_name": "Add"},
        ],
    },
    {
        "relative_path": "b.go",
        "language": "Go",
        "text": TEXT_B,
        "occurrences": [
            {"symbol": "scip-go gomod m v1 Use().", "symbol_roles": ROLE_DEFINITION,
             "range": [2, 5, 2, 8]},
            # reference to Add at line 3, cols 8-11
            {"symbol": "scip-go gomod m v1 Add().", "symbol_roles": 0,
             "range": [3, 8, 3, 11]},
            # duplicate definition occurrence (dedup target)
            {"symbol": "scip-go gomod m v1 Add().", "symbol_roles": ROLE_DEFINITION,
             "range": [3, 8, 3, 11]},
        ],
        "symbols": [],
    },
]


def test_wire_roundtrip():
    data = encode_scip(FIXTURE)
    idx = decode_scip(data)
    assert [d["relative_path"] for d in idx["documents"]] == ["a.go", "b.go"]
    assert len(idx["occurrences"]) == 4
    occ = idx["occurrences"][0]
    assert occ == {
        "symbol": "scip-go gomod m v1 Add().", "symbol_roles": 1,
        "start_line": 2, "start_col": 5, "end_line": 2, "end_col": 8,
        "path": "a.go",
    }
    assert idx["symbols"][0]["display_name"] == "Add"
    assert idx["symbols"][0]["kind"] == 12


def test_three_element_range():
    data = encode_scip([{
        "relative_path": "c.go", "language": "Go", "text": "x\n",
        "occurrences": [{"symbol": "s", "symbol_roles": 0, "range": [7, 1, 4]}],
        "symbols": [],
    }])
    occ = decode_scip(data)["occurrences"][0]
    assert (occ["start_line"], occ["start_col"], occ["end_line"], occ["end_col"]) \
        == (7, 1, 7, 4)


def test_byte_offsets_golden(spark):
    """Slicing text at the computed [start_byte, end_byte) must yield
    the occurrence's token — byte-precision parity."""
    docs, occs, _ = scip_dataframes(spark, encode_scip(FIXTURE))
    out = byte_offsets(docs, occs).collect()
    texts = {"a.go": TEXT_A, "b.go": TEXT_B}
    add_occs = [r for r in out if r.symbol.endswith("Add().")]
    assert len(add_occs) == 3
    for r in add_occs:
        assert texts[r.path][r.start_byte:r.end_byte] == "Add"
    use = [r for r in out if r.symbol.endswith("Use().")][0]
    assert texts["b.go"][use.start_byte:use.end_byte] == "Use"


def test_graph_assembly(spark):
    nodes, edges = scip_to_graph(*scip_dataframes(spark, encode_scip(FIXTURE)))
    nodes, edges = nodes.persist(), edges.persist()

    by_label = {r["label"]: r["n"] for r in
                nodes.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert by_label["File"] == 2
    assert by_label["Symbol"] == 2
    assert by_label["Function"] == 2        # Add + Use definitions
    assert by_label["Reference"] == 1

    # A8: the duplicate Add definition deduped to the FIRST seen
    # (ordered by path, line, col) — a.go wins over b.go.
    add_def = nodes.filter("id = 'def:scip-go gomod m v1 Add().'").collect()[0]
    assert add_def.path == "a.go"
    assert add_def.start_line == 2

    by_type = {r["type"]: r["n"] for r in
               edges.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert by_type["DEFINES"] == 2
    assert by_type["REFERENCES"] == 1
    assert by_type["CONTAINS"] == 3         # 2 defs + 1 ref

    # integrity: every edge endpoint resolves (indexing_test.go:412-466)
    ids = nodes.select("id")
    assert edges.join(ids, edges.src == ids.id, "left_anti").isEmpty()
    assert edges.join(ids, edges.dst == ids.id, "left_anti").isEmpty()

    # Symbol docstring joined from SymbolInformation
    sym = nodes.filter("id = 'symbol:scip-go gomod m v1 Add().'").collect()[0]
    assert sym.documentation == "adds"
    assert sym.name == "Add"


def test_kind_and_display_name(spark):
    from codegraph_spark.sources.scip import display_name, infer_kind

    df = spark.createDataFrame(
        [("scip-go gomod m v1 Type#",),
         ("scip-go gomod m v1 Type#Get().",),
         ("scip-go gomod m v1 Run().",),
         ("scip-go gomod m v1 pkg/",),
         ("scip-go gomod m v1 field.",)],
        "symbol string",
    ).select(
        infer_kind(F.col("symbol")).alias("kind"),
        display_name(F.col("symbol")).alias("dn"),
    )
    got = [(r.kind, r.dn) for r in df.collect()]
    assert got == [
        ("type", "Type"), ("method", "Get"), ("function", "Run"),
        ("package", "pkg"), ("variable", "field"),
    ]


def test_empty_index(spark):
    nodes, edges = scip_to_graph(*scip_dataframes(spark, b""))
    assert nodes.isEmpty() and edges.isEmpty()


def test_generate_scip_index_fake_binary(spark, tmp_path):
    """S3 generator hook (generateSCIPIndex, scip_indexer.go:97-132;
    pluggable binary per SetSCIPBinary :368-371): a fake scip-go that
    emits the wire-format fixture; the full pipeline decodes it."""
    import os
    import stat

    from codegraph_spark.sources.scip import generate_scip_index, index_scip_project

    project = tmp_path / "proj"
    project.mkdir()
    fixture = tmp_path / "fixture.scip"
    fixture.write_bytes(encode_scip(FIXTURE))

    fake = tmp_path / "fake-scip-go"
    fake.write_text(
        "#!/bin/sh\n"
        '# args: --module-name N --module-version V --output OUT\n'
        f'cp "{fixture}" "$6"\n'
    )
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)

    out = generate_scip_index(str(project), scip_binary=str(fake))
    assert out == str(project / "index.scip") and os.path.exists(out)

    nodes, edges = index_scip_project(spark, str(project), scip_binary=str(fake))
    assert nodes.count() > 0 and edges.count() > 0


def test_generate_scip_index_missing_binary(tmp_path):
    """Reference behavior when scip-go is absent: install-hint error."""
    import pytest as _pytest

    from codegraph_spark.sources.scip import generate_scip_index

    with _pytest.raises(FileNotFoundError, match="not found in PATH"):
        generate_scip_index(str(tmp_path), scip_binary="scip-go-definitely-absent")


def test_index_scip_project_fallback_to_existing(spark, tmp_path):
    """No binary + checked-in index.scip → decode the existing file."""
    from codegraph_spark.sources.scip import index_scip_project

    project = tmp_path / "proj2"
    project.mkdir()
    (project / "index.scip").write_bytes(encode_scip(FIXTURE))
    nodes, _ = index_scip_project(
        spark, str(project), scip_binary="scip-go-definitely-absent"
    )
    assert nodes.count() > 0


def test_decode_malformed_raises_cleanly():
    """Truncated/over-length fields raise ValueError with a position,
    never a bare IndexError (a broken scip-go output should fail the
    ingest loudly and diagnosably)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated varint"):
        decode_scip(b"\x0a\xff\xff")
    with _pytest.raises(ValueError, match="claims"):
        decode_scip(b"\x0a\x05\x12")
    # unknown fields are skipped per protobuf semantics; empty is empty
    assert decode_scip(b"") == {"documents": [], "occurrences": [], "symbols": []}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=120))
def test_decode_fuzz_valueerror_only(data):
    """Arbitrary bytes either decode or raise ValueError — no other
    exception type escapes the wire-format reader."""
    try:
        out = decode_scip(data)
        assert set(out) == {"documents", "occurrences", "symbols"}
    except ValueError:
        pass
