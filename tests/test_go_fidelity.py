"""Go parser fidelity envelope (r6 VERDICT item 8): the brace-scanner
is declaration-level by design and dogfood-proven on /root/reference;
this fixture pins the KNOWN-HARD shapes so the envelope is tested, not
just described — each shape asserts either correct extraction or its
documented handling."""

from __future__ import annotations

from codegraph_spark.sources.go_index import parse_go_file

_HARD_GO = '''//go:build linux && amd64

// Package demo exercises the fidelity envelope.
package demo

import "fmt"

// Box holds a value.
type Box[T any] struct {
	v T
}

// Get returns the value.
func (b *Box[T]) Get() T {
	return b.v
}

// MultiLine has a signature spanning lines.
func MultiLine(
	a int,
	b string,
) (int, error) {
	inner := func(x int) int {
		return x + 1
	}
	return inner(a), nil
}

func outer() {
	s := `raw string with { braces } and func fake(not real)`
	fmt.Println(s)
}

// Speaker is an interface.
type Speaker interface {
	Speak(times int) string
}

var Global = 42

const (
	A = iota
	B
)
'''


def _parse():
    recs = parse_go_file("demo/file.go", _HARD_GO)
    nodes = {
        (r["label"], r["name"]): r for r in recs if r["rec"] == "node"
    }
    edges = [
        (r["id"], r["label"], r["dst"]) for r in recs if r["rec"] == "edge"
    ]
    return nodes, edges


def test_build_tags_do_not_break_package_detection():
    nodes, _ = _parse()
    assert ("Module", "demo") in nodes  # //go:build line skipped cleanly
    assert nodes[("File", "file.go")]["language"] == "Go"


def test_generic_type_and_generic_receiver_method():
    nodes, edges = _parse()
    box = nodes[("Class", "Box")]
    assert box["signature"] == "[T any]"  # type params captured
    get = nodes[("Method", "Get")]
    assert get["fqn"] == "demo/demo.Box.Get"  # [T] stripped from receiver
    assert get["signature"] == "(b *Box[T]) Get() T"
    assert (box["id"], "CONTAINS", get["id"]) in edges


def test_multiline_signature_spans_and_parameters():
    nodes, edges = _parse()
    f = nodes[("Function", "MultiLine")]
    # the span covers the whole declaration incl. the multiline header
    assert (f["start_line"], f["end_line"]) == (19, 27)
    assert f["lines_of_code"] == f["end_line"] - f["start_line"] + 1
    assert "a int" in f["signature"] and "(int, error)" in f["signature"]
    params = {
        n["name"] for (label, _), n in nodes.items() if label == "Parameter"
    }
    assert params == {"a", "b"}  # params found across continuation lines


def test_named_closure_extracted_as_nested_function():
    """Go only allows nested func LITERALS; the scanner extracts the
    named-assignment form (inner := func...) as a contained Function —
    richer than the reference, which skips closures entirely."""
    nodes, edges = _parse()
    inner = nodes[("Function", "inner")]
    assert inner["fqn"] == "demo/demo.MultiLine.inner"
    assert inner["id"].startswith("closure:")
    outer_fn = nodes[("Function", "MultiLine")]
    assert (outer_fn["id"], "CONTAINS", inner["id"]) in edges
    # and it is NOT attached to the module (not a top-level decl)
    mod = nodes[("Module", "demo")]
    assert (mod["id"], "CONTAINS", inner["id"]) not in edges


def test_raw_string_braces_do_not_derail_spans():
    nodes, _ = _parse()
    o = nodes[("Function", "outer")]
    # the backquoted `{ braces }` and `func fake(` are blanked before
    # brace counting: span ends at the real closing brace
    assert (o["start_line"], o["end_line"]) == (29, 32)
    # and no phantom "fake" function was extracted
    assert ("Function", "fake") not in nodes


def test_interface_methods_and_iota_const_block():
    nodes, edges = _parse()
    sp = nodes[("Interface", "Speaker")]
    speak = nodes[("Method", "Speak")]
    assert (sp["id"], "CONTAINS", speak["id"]) in edges
    assert speak["signature"] == "Speak(times int) string"
    # iota block: every enumerator extracted as a Variable
    assert {("Variable", "A"), ("Variable", "B"), ("Variable", "Global")} <= set(nodes)


def test_docstrings_attach_to_declarations():
    # doc comments are extracted for types and funcs (extractDocstring
    # parity), skipping the //go:build constraint line
    recs = parse_go_file("demo/file.go", _HARD_GO)
    docs = {
        r["name"]: r.get("docstring")
        for r in recs
        if r["rec"] == "node" and r.get("docstring")
    }
    assert "Box" in docs and "holds a value" in docs["Box"]
    assert "MultiLine" in docs
