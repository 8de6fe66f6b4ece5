"""HTML boilerplate stripping with DOM text-density heuristics (north_star).

A DOM-lite pass over the HTML payload of an input span:
- <script>/<style>/... subtrees dropped entirely;
- <nav>/<footer>/<header>/<aside> subtrees are boilerplate;
- remaining block-level elements become candidate text blocks, kept only if
  they carry >= MIN_BLOCK_CHARS of text and their link density (anchor
  chars / total chars) is <= MAX_LINK_DENSITY — the classic text-density
  main-content heuristic;
- <table> subtrees are captured as cell grids (tr/td|th);
- <input>/<select>/<textarea> elements inside <form> become form fields.

The reference extracts the same four content families from PDFs with four
competing engines (/root/reference/src/pdf_extractor.py:102-257); here one
deterministic pass over HTML yields text/table/form in a single walk.
Pure stdlib (html.parser) — runs identically in the oracle and in Spark
workers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from sparkextract import config
from sparkextract.core.normalize import collapse_ws


@dataclass
class HtmlContent:
    """Result of one HTML span extraction."""

    text_blocks: list[str] = field(default_factory=list)
    tables: list[list[list[str]]] = field(default_factory=list)
    form_fields: list[tuple[str, str]] = field(default_factory=list)  # (name, value)


class _Walker(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out = HtmlContent()
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._form_depth = 0
        # current candidate block: [text_chars, link_chars, pieces]
        self._block_texts: list[str] = []
        self._block_link_chars = 0
        # table capture
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._cell: list[str] | None = None

    # -- block lifecycle ---------------------------------------------------
    def _flush_block(self) -> None:
        text = collapse_ws(" ".join(self._block_texts))
        link_chars = self._block_link_chars
        self._block_texts = []
        self._block_link_chars = 0
        if self._boiler_depth > 0:
            return
        if len(text) < config.MIN_BLOCK_CHARS:
            return
        if link_chars / max(len(text), 1) > config.MAX_LINK_DENSITY:
            return
        self.out.text_blocks.append(text)

    # -- parser callbacks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in config.HTML_DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "table":
            if self._table_depth == 0:
                self._flush_block()
                self._rows = []
            self._table_depth += 1
            return
        if self._table_depth:
            if tag == "tr":
                self._rows.append([])
            elif tag in ("td", "th"):
                self._cell = []
            return
        if tag in config.HTML_BOILER_TAGS:
            self._flush_block()
            self._boiler_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag == "form":
            self._form_depth += 1
        if self._form_depth and tag in ("input", "select", "textarea"):
            d = dict(attrs)
            name = (d.get("name") or "").strip()
            if name:
                self.out.form_fields.append((name, (d.get("value") or "").strip()))
        if tag in config.HTML_BLOCK_TAGS:
            self._flush_block()
        if tag == "br":
            self._block_texts.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in config.HTML_DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "table" and self._table_depth:
            self._table_depth -= 1
            if self._table_depth == 0 and self._boiler_depth == 0:
                rows = [r for r in self._rows if r]
                if rows:
                    self.out.tables.append(rows)
                self._rows = []
            return
        if self._table_depth:
            if tag in ("td", "th") and self._cell is not None:
                if self._rows:
                    self._rows[-1].append(collapse_ws(" ".join(self._cell)))
                self._cell = None
            return
        if tag in config.HTML_BOILER_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag == "form":
            self._form_depth = max(0, self._form_depth - 1)
        if tag in config.HTML_BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if self._table_depth:
            if self._cell is not None:
                self._cell.append(data)
            return
        stripped = collapse_ws(data)
        if not stripped:
            return
        self._block_texts.append(stripped)
        if self._link_depth:
            self._block_link_chars += len(stripped)

    def close(self) -> None:  # noqa: D102 — flush the trailing block
        super().close()
        self._flush_block()


def extract_html(html: str) -> HtmlContent:
    """Parse one HTML payload into main-content blocks, tables, form fields."""
    walker = _Walker()
    try:
        walker.feed(html)
        walker.close()
    except Exception:
        # malformed markup: fall back to whatever was accumulated; the
        # parser is tolerant so this is a belt-and-braces guard, not a path
        # that changes semantics between oracle and Spark (both run this
        # exact code).
        pass
    return walker.out
