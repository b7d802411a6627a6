"""Tolerant HTML block tokenizer — the input adapter the raw-web front
door promises (queries/web.py:20-24: "a real crawl's adversarial HTML
would route the SAME rules through a tolerant tokenizer; the rules are
the operator, the tokenizer is an input adapter").

The regex tokenizer in queries/web.py (``html_block_stats``) is exact
on well-formed single-line pages but mis-tokenizes real-crawl HTML:
``<script[^>]*>[^<]*</script>`` fails on script bodies containing
``<``; ``<[^>]+>`` ends a tag at the first ``>`` even inside a quoted
attribute value; comments, CDATA sections and unclosed block tags are
invisible to it; only the three named entities lt/gt/amp unescape.
This module is a single-pass STATE MACHINE over the page string that
handles all of those and emits the SAME ``(txt, wc, link_len)`` block
structs, so the extraction rules (``web._keep``'s word floor +
link-density ceiling) and every downstream gate are unchanged.

Tokenizer semantics (HTML5-flavored, chosen to AGREE with the regex
path on well-formed pages — pinned by tests/test_html_tok.py):

- text outside tags accumulates into the current block; a literal
  newline flushes the block (the regex path splits on ``\\n`` too);
- ``<script>``/``<style>`` enter RAWTEXT mode: everything up to the
  matching case-insensitive ``</script``/``</style`` is dropped, so
  bodies containing ``<``, ``>`` or markup-in-strings never leak;
- ``<!-- ... -->`` comments and ``<![CDATA[ ... ]]>`` sections are
  dropped whole (tolerant to a missing terminator: drops to EOF);
  other ``<!``/``<?`` declarations drop to the next ``>``;
- tag ends are found by a QUOTE-AWARE scan, so ``>`` inside a quoted
  attribute value does not end the tag;
- CLOSING a block-level tag (p, div, title, h1-h6, li — the regex
  path's set) flushes the block, and so does ``<br>``; OPENING a
  block-level tag ALSO flushes — this is the unclosed-``<p>``
  tolerance, and it agrees with the closing-only regex path on any
  page whose inter-block gaps are tag-or-whitespace-only (an empty
  buffer flushes to nothing);
- ``<a>``/``</a>`` track anchor depth; raw text arriving at depth > 0
  accrues ``link_len`` (the regex path measures RAW anchor-text
  length, entities unexpanded — matched here); anchor depth resets at
  block flush (an anchor left open across a block boundary is
  malformed; jusText measures link density per block the same way);
- a bare ``<`` not opening a tag/comment/declaration is literal text;
  a tag truncated by EOF is consumed silently;
- block text is trimmed; ``wc`` counts non-empty ``' '``-separated
  words of the PRE-unescape text and ``txt`` is the unescaped text —
  exactly ``html_block_stats``'s order of operations; unescape covers
  the regex path's named set (lt/gt/amp) PLUS numeric ``&#NN;`` /
  ``&#xHH;`` references (left-to-right single pass, which agrees with
  the sequential replace on the named set — replacements never create
  new matches in either formulation).

Scale shape: pure per-row Python inside an Arrow-batched kernel
(``mapInPandas``) — the codec-module precedent (operators/
jpeg_stdlib.py): no shuffle, no state, one pass per document, and the
kernel's output is narrow stats, never the page. At 100 TB this is a
map-only stage whose cost is the tokenizer's single scan per page.
"""

from __future__ import annotations

import re

#: block-level elements — MUST stay equal to the regex path's
#: ``</(p|div|title|h[1-6]|li)>`` set (queries/web.py)
BLOCK_TAGS = frozenset(
    ["p", "div", "title", "h1", "h2", "h3", "h4", "h5", "h6", "li"]
)
#: elements whose content is raw text, dropped whole
RAWTEXT_TAGS = frozenset(["script", "style"])

_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9]*")
_ENT_RE = re.compile(r"(#[xX][0-9a-fA-F]+|#[0-9]+|lt|gt|amp);")
_NAMED = {"lt": "<", "gt": ">", "amp": "&"}


def unescape(s: str) -> str:
    """Left-to-right entity expansion: lt/gt/amp (the regex path's
    named set) + numeric decimal/hex character references. An ``&``
    that heads no recognized entity stays literal."""
    if "&" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while True:
        j = s.find("&", i)
        if j == -1:
            out.append(s[i:])
            break
        out.append(s[i:j])
        m = _ENT_RE.match(s, j + 1)
        if m:
            e = m.group(1)
            if e[0] == "#":
                try:
                    cp = int(e[2:], 16) if e[1] in "xX" else int(e[1:])
                    out.append(chr(cp) if 0 < cp <= 0x10FFFF else "")
                except (ValueError, OverflowError):
                    out.append("")
            else:
                out.append(_NAMED[e])
            i = m.end()
        else:
            out.append("&")
            i = j + 1
    return "".join(out)


def _tag_end(s: str, i: int) -> int:
    """Index of the ``>`` ending the tag whose attributes start at
    ``i``, honoring single/double-quoted attribute values; -1 if the
    tag is truncated by EOF."""
    q = ""
    n = len(s)
    while i < n:
        ch = s[i]
        if q:
            if ch == q:
                q = ""
        elif ch == '"' or ch == "'":
            q = ch
        elif ch == ">":
            return i
        i += 1
    return -1


def tokenize_blocks(page: str) -> list[tuple[str, int, int]]:
    """page → list of non-empty text blocks as ``(txt, wc, link_len)``
    tuples — the tolerant twin of ``queries.web.html_block_stats``."""
    blocks: list[tuple[str, int, int]] = []
    buf: list[str] = []
    link_len = 0
    a_depth = 0
    lower = page.lower()
    n = len(page)

    def flush() -> None:
        nonlocal link_len, a_depth
        raw = "".join(buf)
        buf.clear()
        sx = raw.strip()
        if sx:
            wc = sum(1 for w in sx.split(" ") if w)
            blocks.append((unescape(sx), wc, link_len))
        link_len = 0
        a_depth = 0

    def text(piece: str) -> None:
        nonlocal link_len
        if not piece:
            return
        if "\n" in piece:
            parts = piece.split("\n")
            for k, part in enumerate(parts):
                if part:
                    buf.append(part)
                    if a_depth > 0:
                        link_len += len(part)
                if k < len(parts) - 1:
                    flush()
            return
        buf.append(piece)
        if a_depth > 0:
            link_len += len(piece)

    i = 0
    while i < n:
        j = page.find("<", i)
        if j == -1:
            text(page[i:])
            break
        if j > i:
            text(page[i:j])
        i = j
        # dispatch on what follows '<'
        if page.startswith("<!--", i):
            k = page.find("-->", i + 4)
            i = n if k == -1 else k + 3
            continue
        if page.startswith("<![CDATA[", i):
            k = page.find("]]>", i + 9)
            i = n if k == -1 else k + 3
            continue
        if page.startswith("<!", i) or page.startswith("<?", i):
            k = page.find(">", i + 2)
            i = n if k == -1 else k + 1
            continue
        closing = page.startswith("</", i)
        m = _NAME_RE.match(page, i + (2 if closing else 1))
        if not m:
            text("<")  # bare '<': literal text (tolerance)
            i += 1
            continue
        name = m.group(0).lower()
        end = _tag_end(page, m.end())
        self_closing = end > 0 and page[end - 1] == "/"
        i = n if end == -1 else end + 1
        if closing:
            if name in BLOCK_TAGS:
                flush()
            elif name == "a":
                if a_depth > 0:
                    a_depth -= 1
            continue
        if name in RAWTEXT_TAGS:
            close = "</" + name
            k = lower.find(close, i)
            if k == -1:
                i = n
            else:
                g = page.find(">", k)
                i = n if g == -1 else g + 1
            continue
        if name in BLOCK_TAGS or name == "br":
            flush()
        elif name == "a" and not self_closing:
            a_depth += 1
    flush()
    return blocks
