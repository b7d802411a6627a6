"""SCIP index ingestion — the Spark analog of the reference's SCIP
pipeline (pkg/indexer/static/scip_indexer.go + scip_parser.go).

Reference flow (SURVEY §3.2): read ``index.scip`` protobuf → extract
documents/occurrences → first-seen symbol dedup (scip_parser.go:103-133,
an O(n²) host-side scan) → per-entity Neo4j MERGE round-trips.

Spark flow: decode the protobuf ONCE on the driver (a SCIP index is one
file per project — same boundary as the reference, which also parses on
the host), then ``createDataFrame`` and do every transform distributed:

- A8 first-seen dedup → one window, not O(n²);
- F6 display-name extraction, F7 kind inference → column expressions;
- node/edge assembly → joins; loading → one batched upsert instead of
  the reference's N+1 MERGE round-trips (research.md:258-278 calls this
  out as the fix).

The container has no ``protobuf`` package, so :func:`decode_scip` is a
minimal hand-rolled reader of the public protobuf wire format (varint +
length-delimited groups), covering exactly the fields this pipeline
needs. Field numbers follow the public ``scip.proto``
(github.com/sourcegraph/scip): Index.documents=2;
Document{relative_path=1, occurrences=2, symbols=3, language=4,
text=5}; Occurrence{range=1 (packed sint-less int32), symbol=2,
symbol_roles=3}; SymbolInformation{symbol=1, documentation=3, kind=5,
display_name=6}. :func:`encode_scip` writes the same subset so tests
round-trip without the real toolchain.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# SCIP SymbolRole bitmask (scip.proto): Definition = 0x1.
ROLE_DEFINITION = 0x1


# ---------------------------------------------------------------------------
# protobuf wire format (public spec: varint = wire type 0, length-delimited
# = wire type 2; tag = field_number << 3 | wire_type)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if i >= len(buf):
            raise ValueError(
                f"malformed SCIP index: truncated varint at byte {i}"
            )
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _fields(buf: bytes) -> list[tuple[int, int, Any]]:
    """Decode a message into (field_number, wire_type, value) triples.
    Only wire types 0 (varint) and 2 (bytes) appear in the SCIP subset."""
    i, out = 0, []
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        fno, wt = tag >> 3, tag & 0x7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            if i + ln > len(buf):
                raise ValueError(
                    f"malformed SCIP index: field at byte {i} claims "
                    f"{ln} bytes, {len(buf) - i} remain"
                )
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32 (not used by our subset; skip)
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:  # fixed64
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt} at byte {i}")
        out.append((fno, wt, v))
    return out


def _packed_int32s(v: bytes) -> list[int]:
    i, out = 0, []
    while i < len(v):
        n, i = _read_varint(v, i)
        out.append(n)
    return out


def _as_bytes(v: Any, wt: int, what: str) -> bytes:
    """Wire-type guard: the schema expects a length-delimited field here.
    A varint in its place means the index is malformed (or adversarial)
    — fail with a diagnosis instead of leaking AttributeError."""
    if wt != 2 or not isinstance(v, (bytes, bytearray)):
        raise ValueError(
            f"malformed SCIP index: {what} has wire type {wt}, "
            "expected length-delimited"
        )
    return bytes(v)


def _as_int(v: Any, wt: int, what: str) -> int:
    if wt != 0 or not isinstance(v, int):
        raise ValueError(
            f"malformed SCIP index: {what} has wire type {wt}, expected varint"
        )
    return v


def decode_scip(data: bytes) -> dict[str, list[dict]]:
    """Decode an ``index.scip`` byte string into plain dicts:
    ``{"documents": [...], "occurrences": [...], "symbols": [...]}``.
    The SCIP range convention: [startLine, startCol, endLine, endCol],
    or 3 elements when the occurrence is single-line. Malformed input
    raises ValueError (never a stray AttributeError/IndexError) — the
    fuzz contract in tests/test_scip.py."""
    documents: list[dict] = []
    occurrences: list[dict] = []
    symbols: list[dict] = []
    for fno, wt, v in _fields(data):
        if fno != 2:  # Index.documents
            continue
        doc: dict[str, Any] = {"relative_path": "", "language": "", "text": ""}
        for dfno, dwt, dv in _fields(_as_bytes(v, wt, "Index.documents")):
            if dfno == 1:
                doc["relative_path"] = _as_bytes(dv, dwt, "Document.relative_path").decode()
            elif dfno == 4:
                doc["language"] = _as_bytes(dv, dwt, "Document.language").decode()
            elif dfno == 5:
                doc["text"] = _as_bytes(dv, dwt, "Document.text").decode()
            elif dfno == 2:  # occurrence
                occ = {"symbol": "", "symbol_roles": 0, "range": []}
                for ofno, owt, ov in _fields(_as_bytes(dv, dwt, "Document.occurrences")):
                    if ofno == 1:
                        occ["range"] = (
                            _packed_int32s(ov) if owt == 2
                            else [_as_int(ov, owt, "Occurrence.range")]
                        )
                    elif ofno == 2:
                        occ["symbol"] = _as_bytes(ov, owt, "Occurrence.symbol").decode()
                    elif ofno == 3:
                        occ["symbol_roles"] = _as_int(ov, owt, "Occurrence.symbol_roles")
                r = occ.pop("range")
                if len(r) == 3:  # single-line shorthand
                    r = [r[0], r[1], r[0], r[2]]
                if len(r) != 4:
                    raise ValueError(
                        f"malformed SCIP index: occurrence range has {len(r)} "
                        "elements, expected 3 or 4"
                    )
                occ.update(
                    start_line=r[0], start_col=r[1], end_line=r[2], end_col=r[3],
                    path=doc["relative_path"],
                )
                occurrences.append(occ)
            elif dfno == 3:  # SymbolInformation
                si = {"symbol": "", "documentation": "", "kind": 0,
                      "display_name": ""}
                for sfno, swt, sv in _fields(_as_bytes(dv, dwt, "Document.symbols")):
                    if sfno == 1:
                        si["symbol"] = _as_bytes(sv, swt, "SymbolInformation.symbol").decode()
                    elif sfno == 3:
                        si["documentation"] = _as_bytes(sv, swt, "SymbolInformation.documentation").decode()
                    elif sfno == 5:
                        si["kind"] = _as_int(sv, swt, "SymbolInformation.kind")
                    elif sfno == 6:
                        si["display_name"] = _as_bytes(sv, swt, "SymbolInformation.display_name").decode()
                symbols.append(si)
        documents.append({k: doc[k] for k in ("relative_path", "language", "text")})
    return {"documents": documents, "occurrences": occurrences, "symbols": symbols}


def encode_scip(documents: list[dict]) -> bytes:
    """Encode the same subset (test fixture writer). Each document dict:
    ``{relative_path, language, text, occurrences: [{symbol,
    symbol_roles, range:[4 ints]}], symbols: [{symbol, documentation,
    kind, display_name}]}``."""

    def ld(fno: int, payload: bytes) -> bytes:  # length-delimited field
        return _write_varint(fno << 3 | 2) + _write_varint(len(payload)) + payload

    def vi(fno: int, n: int) -> bytes:
        return _write_varint(fno << 3 | 0) + _write_varint(n)

    out = bytearray()
    for doc in documents:
        body = bytearray()
        body += ld(1, doc["relative_path"].encode())
        if doc.get("language"):
            body += ld(4, doc["language"].encode())
        if doc.get("text"):
            body += ld(5, doc["text"].encode())
        for occ in doc.get("occurrences", []):
            ob = bytearray()
            packed = b"".join(_write_varint(n) for n in occ["range"])
            ob += ld(1, packed)
            ob += ld(2, occ["symbol"].encode())
            if occ.get("symbol_roles"):
                ob += vi(3, occ["symbol_roles"])
            body += ld(2, bytes(ob))
        for si in doc.get("symbols", []):
            sb = bytearray()
            sb += ld(1, si["symbol"].encode())
            if si.get("documentation"):
                sb += ld(3, si["documentation"].encode())
            if si.get("kind"):
                sb += vi(5, si["kind"])
            if si.get("display_name"):
                sb += ld(6, si["display_name"].encode())
            body += ld(3, bytes(sb))
        out += ld(2, bytes(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# DataFrame transforms
# ---------------------------------------------------------------------------

def scip_dataframes(
    spark: SparkSession, data: bytes
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S4: driver-side decode → three DataFrames (documents,
    occurrences, symbol_infos). One small decode on the driver, exactly
    like the reference's host-side proto.Unmarshal (scip_parser.go:25-38);
    everything after is distributed."""
    idx = decode_scip(data)
    docs = spark.createDataFrame(
        idx["documents"] or [{"relative_path": "", "language": "", "text": ""}],
        "relative_path string, language string, text string",
    )
    occs = spark.createDataFrame(
        idx["occurrences"]
        or [{"symbol": "", "symbol_roles": 0, "start_line": 0, "start_col": 0,
             "end_line": 0, "end_col": 0, "path": ""}],
        "symbol string, symbol_roles int, start_line int, start_col int,"
        " end_line int, end_col int, path string",
    )
    syms = spark.createDataFrame(
        idx["symbols"]
        or [{"symbol": "", "documentation": "", "kind": 0, "display_name": ""}],
        "symbol string, documentation string, kind int, display_name string",
    )
    if not idx["documents"]:
        docs = docs.limit(0)
    if not idx["occurrences"]:
        occs = occs.limit(0)
    if not idx["symbols"]:
        syms = syms.limit(0)
    return docs, occs, syms


def infer_kind(symbol: F.Column) -> F.Column:
    """F7 kind inference from descriptor shape (scip_parser.go:208-221):
    ``#``&``().`` → method, ``().`` → function, ``#`` → type,
    ``/`` → package, else variable."""
    desc = F.element_at(F.split(symbol, " ", 5), 5)
    return (
        F.when(desc.contains("#") & desc.contains("()."), "method")
        .when(desc.contains("()."), "function")
        .when(desc.contains("#"), "type")
        .when(desc.endswith("/"), "package")
        .otherwise("variable")
    )


def display_name(symbol: F.Column) -> F.Column:
    """F6 display-name extraction (scip_parser.go:223-246): last segment
    after ``#`` or ``/``, with ``().``/``.`` suffix trimmed."""
    desc = F.element_at(F.split(symbol, " ", 5), 5)
    trimmed = F.regexp_replace(desc, r"[#/.()]+$", "")  # drop suffix markers
    return F.element_at(F.split(trimmed, "[#/]"), -1)


def language_from_path(path: F.Column) -> F.Column:
    """F8 (scip_parser.go:266-277)."""
    return (
        F.when(path.endswith(".go"), "Go")
        .when(path.endswith(".py"), "Python")
        .when(path.endswith(".ts"), "TypeScript")
        .when(path.endswith(".js"), "JavaScript")
        .when(path.endswith(".java"), "Java")
        .otherwise("Unknown")
    )


def byte_offsets(docs: DataFrame, occs: DataFrame) -> DataFrame:
    """F9: line/col → byte offsets via cumulative line lengths
    (scip_indexer.go:382-409 re-reads each file; here one window over an
    exploded-lines table — no re-reads, no driver loop).

    Returns occurrences + ``start_byte``/``end_byte`` (0-based, matching
    the reference's convention, SURVEY §7.3.4)."""
    lines = docs.select(
        F.col("relative_path").alias("path"),
        F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
    )
    w = (
        Window.partitionBy("path").orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    starts = lines.select(
        "path", "line_no",
        F.coalesce(F.sum(F.length("line") + 1).over(w), F.lit(0)).alias("line_start"),
    )
    s = starts.alias("s")
    e = starts.alias("e")
    o = occs.alias("o")
    return (
        o.join(s, (F.col("o.path") == F.col("s.path"))
               & (F.col("o.start_line") == F.col("s.line_no")))
        .join(e, (F.col("o.path") == F.col("e.path"))
              & (F.col("o.end_line") == F.col("e.line_no")))
        .select(
            "o.*",
            (F.col("s.line_start") + F.col("o.start_col")).alias("start_byte"),
            (F.col("e.line_start") + F.col("o.end_col")).alias("end_byte"),
        )
    )


def scip_to_graph(
    docs: DataFrame, occs: DataFrame, syms: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Occurrences → (nodes, edges), the distributed form of the
    reference's two-pass load (scip_indexer.go:174-229):

    - pass 1: first definition per symbol (A8 window dedup,
      scip_parser.go:103-133) → definition node + DEFINES + CONTAINS;
    - pass 2: every non-definition occurrence → Reference node +
      REFERENCES + CONTAINS (scip_indexer.go:341-352).
    """
    occs = byte_offsets(docs, occs)

    is_def = (F.col("symbol_roles").bitwiseAND(ROLE_DEFINITION)) != 0
    w = Window.partitionBy("symbol").orderBy("path", "start_line", "start_col")
    defs = (
        occs.filter(is_def)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    refs = occs.filter(~is_def)

    kind = infer_kind(F.col("symbol"))
    label = (
        F.when(kind == "method", "Method")
        .when(kind == "function", "Function")
        .when(kind == "type", "Class")
        .when(kind == "package", "Module")
        .otherwise("Variable")
    )

    file_nodes = docs.select(
        F.concat(F.lit("file:"), "relative_path").alias("id"),
        F.lit("File").alias("label"),
        F.col("relative_path").alias("name"),
        F.col("relative_path").alias("path"),
        F.coalesce(
            F.nullif("language", F.lit("")), language_from_path(F.col("relative_path"))
        ).alias("language"),
        F.lit(None).cast("string").alias("symbol"),
        F.lit(None).cast("int").alias("start_line"),
        F.lit(None).cast("int").alias("end_line"),
        F.lit(None).cast("long").alias("start_byte"),
        F.lit(None).cast("long").alias("end_byte"),
        F.lit(None).cast("string").alias("documentation"),
    )
    symbol_nodes = (
        occs.select("symbol").distinct()
        .join(syms.withColumnRenamed("symbol", "s2"),
              F.col("symbol") == F.col("s2"), "left")
        .select(
            F.concat(F.lit("symbol:"), "symbol").alias("id"),
            F.lit("Symbol").alias("label"),
            display_name(F.col("symbol")).alias("name"),
            F.lit(None).cast("string").alias("path"),
            F.lit(None).cast("string").alias("language"),
            F.col("symbol"),
            F.lit(None).cast("int").alias("start_line"),
            F.lit(None).cast("int").alias("end_line"),
            F.lit(None).cast("long").alias("start_byte"),
            F.lit(None).cast("long").alias("end_byte"),
            F.col("documentation"),
        )
    )
    def_nodes = defs.select(
        F.concat(F.lit("def:"), "symbol").alias("id"),
        label.alias("label"),
        display_name(F.col("symbol")).alias("name"),
        F.col("path"),
        language_from_path(F.col("path")).alias("language"),
        F.col("symbol"),
        F.col("start_line"), F.col("end_line"),
        F.col("start_byte"), F.col("end_byte"),
        F.lit(None).cast("string").alias("documentation"),
    )
    ref_nodes = refs.select(
        F.concat_ws(":", F.lit("ref"), "symbol", "path",
                    F.col("start_line").cast("string"),
                    F.col("start_col").cast("string")).alias("id"),
        F.lit("Reference").alias("label"),
        display_name(F.col("symbol")).alias("name"),
        F.col("path"),
        language_from_path(F.col("path")).alias("language"),
        F.col("symbol"),
        F.col("start_line"), F.col("end_line"),
        F.col("start_byte"), F.col("end_byte"),
        F.lit(None).cast("string").alias("documentation"),
    )
    nodes = (
        file_nodes.unionByName(symbol_nodes)
        .unionByName(def_nodes).unionByName(ref_nodes)
    )

    def_edges = defs.select(
        F.concat(F.lit("def:"), "symbol").alias("src"),
        F.concat(F.lit("symbol:"), "symbol").alias("dst"),
        F.lit("DEFINES").alias("type"),
        F.lit(None).cast("boolean").alias("is_definition"),
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("column"),
    )
    def_contains = defs.select(
        F.concat(F.lit("file:"), "path").alias("src"),
        F.concat(F.lit("def:"), "symbol").alias("dst"),
        F.lit("CONTAINS").alias("type"),
        F.lit(None).cast("boolean").alias("is_definition"),
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("column"),
    )
    ref_id = F.concat_ws(":", F.lit("ref"), "symbol", "path",
                         F.col("start_line").cast("string"),
                         F.col("start_col").cast("string"))
    ref_edges = refs.select(
        ref_id.alias("src"),
        F.concat(F.lit("symbol:"), "symbol").alias("dst"),
        F.lit("REFERENCES").alias("type"),
        F.lit(False).alias("is_definition"),
        F.col("start_line").alias("line"),
        F.col("start_col").alias("column"),
    )
    ref_contains = refs.select(
        F.concat(F.lit("file:"), "path").alias("src"),
        ref_id.alias("dst"),
        F.lit("CONTAINS").alias("type"),
        F.lit(None).cast("boolean").alias("is_definition"),
        F.lit(None).cast("int").alias("line"),
        F.lit(None).cast("int").alias("column"),
    )
    edges = (
        def_edges.unionByName(def_contains)
        .unionByName(ref_edges).unionByName(ref_contains)
        .dropDuplicates(["src", "dst", "type"])
    )
    return nodes.dropDuplicates(["id"]), edges


def index_scip(spark: SparkSession, scip_path: str) -> tuple[DataFrame, DataFrame]:
    """End-to-end: read index.scip → (nodes, edges). The reference's
    IndexProject minus the scip-go subprocess (S3 stays out-of-band,
    scip_indexer.go:98-132 shells out exactly the same way)."""
    with open(scip_path, "rb") as f:
        data = f.read()
    return scip_to_graph(*scip_dataframes(spark, data))


def generate_scip_index(
    project_path: str,
    scip_binary: str = "scip-go",
    module_name: str | None = None,
    module_version: str = "v0",
) -> str:
    """S3 generator hook: shell out to ``scip-go`` to produce
    ``<project>/index.scip`` (generateSCIPIndex, scip_indexer.go:97-132;
    the binary is pluggable exactly like SetSCIPBinary, :368-371).

    Driver-side by design — index generation is a per-project subprocess
    in the reference too; the *decode* of its output is the distributed
    part (scip_dataframes). Raises FileNotFoundError with the
    reference's install hint when the binary is absent."""
    import os
    import shutil
    import subprocess

    if shutil.which(scip_binary) is None:
        raise FileNotFoundError(
            f"{scip_binary} not found in PATH. Install with: "
            "go install github.com/sourcegraph/scip-go/cmd/scip-go@latest"
        )
    output_file = os.path.join(project_path, "index.scip")
    cmd = [
        shutil.which(scip_binary),
        "--module-name", module_name or os.path.basename(project_path.rstrip("/")),
        "--module-version", module_version,
        "--output", output_file,
    ]
    proc = subprocess.run(cmd, cwd=project_path, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"{scip_binary} command failed (rc={proc.returncode}):\n"
            f"{proc.stdout}{proc.stderr}"
        )
    if not os.path.exists(output_file):
        raise RuntimeError(f"SCIP index file was not generated: {output_file}")
    return output_file


def index_scip_project(
    spark: SparkSession, project_path: str, scip_binary: str = "scip-go"
) -> tuple[DataFrame, DataFrame]:
    """IndexProject parity for the SCIP pipeline (scip_indexer.go:60-95):
    generate via the pluggable binary, fall back to a pre-existing
    ``index.scip`` when the toolchain is absent (this container has no
    Go toolchain; the reference hard-fails instead — our fallback keeps
    ingestion usable from checked-in indexes)."""
    import os

    try:
        path = generate_scip_index(project_path, scip_binary)
    except FileNotFoundError:
        path = os.path.join(project_path, "index.scip")
        if not os.path.exists(path):
            raise
    return index_scip(spark, path)
