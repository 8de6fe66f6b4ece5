"""q212 (posting encoding advisor) and q213 (zone-map pruning):
pure-Python re-derivations at sf0.001."""

import hashlib
import os

import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5ai-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _docs(cols):
    return pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=cols).to_pylist()


def test_q212_matches_python_sizes(spark):
    from sparkextract.queries.round5ai import _Q212_TOPK, q212_posting_encoding_advisor

    docs = _docs(["doc_id", "text"])
    postings: dict[str, list] = {}
    for d in docs:
        for t in set(x for x in d["text"].split(" ") if x):
            postings.setdefault(t, []).append(d["doc_id"])
    u = max(d["doc_id"] for d in docs) + 1

    def sizes(lst):
        lst = sorted(lst)
        n = len(lst)
        l = max((u // n).bit_length() - 1, 0)
        ef = n * (2 + l)
        varint = 0
        prev = None
        for x in lst:
            g = x + 1 if prev is None else x - prev
            varint += 8 * ((g.bit_length() + 6) // 7)
            prev = x
        return ef, u, varint

    order = sorted(postings, key=lambda t: (-len(postings[t]), t))[:_Q212_TOPK]
    rows = q212_posting_encoding_advisor(spark, SF_DIR).collect()
    assert [r["token"] for r in rows] == order
    for r in rows:
        lst = postings[r["token"]]
        ef, bitmap, varint = sizes(lst)
        assert r["df"] == len(lst)
        assert r["universe"] == u
        assert (r["ef_bits"], r["bitmap_bits"], r["varint_bits"]) == (
            ef,
            bitmap,
            varint,
        )
        best = min(
            [("elias_fano", ef), ("bitmap", bitmap), ("varint", varint)],
            key=lambda kv: (kv[1], ["elias_fano", "bitmap", "varint"].index(kv[0])),
        )[0]
        assert r["best_encoding"] == best
        # the economics the advisor encodes: dense lists (n > u/2) are
        # where the bitmap must win — EF pays >= 2 bits/element
        if len(lst) > u / 2:
            assert r["best_encoding"] == "bitmap"


def test_q213_matches_python_and_zorder_wins(spark):
    from sparkextract.queries.round5ai import (
        _Q213_C_HI,
        _Q213_C_LO,
        _Q213_K_HI,
        _Q213_K_LO,
        _Q213_QBITS,
        _Q213_ZONES,
        q213_zone_map_pruning,
    )

    docs = _docs(["doc_id", "n_chars"])
    dmin = min(d["doc_id"] for d in docs)
    dspan = max(d["doc_id"] for d in docs) - dmin + 1
    cmax = max(d["n_chars"] for d in docs) + 1
    zones: dict[tuple, list] = {}
    for d in docs:
        c = d["n_chars"]
        k = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16) % 1024
        zl = (_Q213_ZONES * (d["doc_id"] - dmin)) // dspan
        qa = ((1 << _Q213_QBITS) * c) // cmax
        qb = k // (1024 // (1 << _Q213_QBITS))
        morton = 0
        for i in range(_Q213_QBITS):
            morton += ((qa >> i) & 1) << (2 * i + 1)
            morton += ((qb >> i) & 1) << (2 * i)
        zz = morton // ((1 << (2 * _Q213_QBITS)) // _Q213_ZONES)
        zones.setdefault(("linear", zl), []).append((c, k))
        zones.setdefault(("zorder", zz), []).append((c, k))
    stats = {"linear": [0, 0, 0, 0], "zorder": [0, 0, 0, 0]}
    for (layout, _), pts in zones.items():
        cs = [p[0] for p in pts]
        ks = [p[1] for p in pts]
        pruned = (
            max(cs) < _Q213_C_LO
            or min(cs) > _Q213_C_HI
            or max(ks) < _Q213_K_LO
            or min(ks) > _Q213_K_HI
        )
        match = sum(
            1
            for c, k in pts
            if _Q213_C_LO <= c <= _Q213_C_HI and _Q213_K_LO <= k <= _Q213_K_HI
        )
        s = stats[layout]
        s[0] += 1
        s[1] += 1 if pruned else 0
        s[2] += 0 if pruned else len(pts)
        s[3] += match
    rows = {r["layout"]: r for r in q213_zone_map_pruning(spark, SF_DIR).collect()}
    assert set(rows) == {"linear", "zorder"}
    for layout, (nz, np_, scanned, matched) in stats.items():
        r = rows[layout]
        assert (r["n_zones"], r["n_pruned"]) == (nz, np_)
        assert (r["rows_scanned"], r["rows_matched"]) == (scanned, matched)
        if matched:
            assert r["scan_amp_u"] == (1000000 * scanned) // matched
    # both layouts see the SAME matches; z-order must scan strictly less
    assert rows["linear"]["rows_matched"] == rows["zorder"]["rows_matched"]
    assert rows["zorder"]["rows_scanned"] < rows["linear"]["rows_scanned"]
    assert rows["zorder"]["n_pruned"] > rows["linear"]["n_pruned"]
