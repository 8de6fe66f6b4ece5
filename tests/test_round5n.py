"""q169 (LSH s-curve sweep) and q170 (incremental view maintenance):
pure-Python re-derivations of both verdicts at sf0.001."""

import hashlib
import os
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5n-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _md5_bucket(s: str, n: int) -> int:
    return int(_md5(s)[:8], 16) % n


def _q169_python(sf_dir):
    from sparkextract.queries.round5n import (
        _Q169_CONFIGS,
        _Q169_NPERM,
        _Q169_SAMPLE_BUCKETS,
    )

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    tbl = [
        r for r in tbl if _md5_bucket(str(r["doc_id"]), _Q169_SAMPLE_BUCKETS) == 0
    ]
    corpus = [(r["doc_id"], r["text"][:256]) for r in tbl]
    corpus += [
        (r["doc_id"] + 2000000, ("x" * 10 + r["text"][10:])[:256])
        for r in tbl
        if r["doc_id"] % 11 == 0
    ]
    ssets = {}
    sigs = {}
    for doc_id, head in corpus:
        n = max(len(head) - 7, 1)
        sset = {head[i : i + 8] for i in range(n)}
        ssets[doc_id] = sset
        sigs[doc_id] = [
            min(_md5(f"p{j}|" + s) for s in sset) for j in range(_Q169_NPERM)
        ]
    out = {}
    for b, r in _Q169_CONFIGS:
        cfg = f"{b}x{r}"
        buckets = defaultdict(list)
        for doc_id, sig in sigs.items():
            for band in range(b):
                key = "|".join(sig[band * r + j] for j in range(r))
                buckets[(band, key)].append(doc_id)
        cands = set()
        for members in buckets.values():
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    cands.add((members[i], members[j]))
        n_true = 0
        for l, rr in cands:
            inter = len(ssets[l] & ssets[rr])
            if 2 * inter >= len(ssets[l]) + len(ssets[rr]) - inter:
                n_true += 1
        out[cfg] = (len(cands), n_true)
    return out


def test_q169_matches_python_and_s_curve_monotone(spark):
    from sparkextract.queries.round5n import q169_lsh_s_curve_sweep

    rows = {
        r["config"]: r for r in q169_lsh_s_curve_sweep(spark, SF_DIR).collect()
    }
    expected = _q169_python(SF_DIR)
    assert set(rows) == set(expected)
    for cfg, (n_cand, n_true) in expected.items():
        assert rows[cfg]["n_candidates"] == n_cand, cfg
        assert rows[cfg]["n_true_pairs"] == n_true, cfg
        if n_cand:
            assert rows[cfg]["precision_u"] == round(n_true * 1000000.0 / n_cand)
    # s-curve shape: more bands (lower similarity threshold) can only
    # ADD candidates relative to fewer bands at the same signature width
    assert rows["16x1"]["n_candidates"] >= rows["8x2"]["n_candidates"]
    assert rows["8x2"]["n_candidates"] >= rows["4x4"]["n_candidates"]
    assert rows["4x4"]["n_candidates"] >= rows["2x8"]["n_candidates"]
    # the planted 10-char-prefix mutations are >=0.5-Jaccard near-dups of
    # their sources: the high-band layouts must catch a non-empty true set
    assert rows["16x1"]["n_true_pairs"] > 0


def test_q170_maintained_equals_full_and_dirty_set(spark):
    from sparkextract.queries.round5n import (
        _Q170_BUCKETS,
        _Q170_GHOST_BUCKET,
        q170_incremental_view_maintenance,
    )

    rows = q170_incremental_view_maintenance(spark, SF_DIR).collect()
    # the maintenance algebra must reproduce the from-scratch view exactly
    assert rows and all(r["matches_full"] for r in rows)

    tbl = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    ).to_pylist()
    dirty = set()
    full = defaultdict(lambda: [0, 0, None, None])
    for r in tbl:
        b = _md5_bucket(str(r["doc_id"]), _Q170_BUCKETS)
        if b in (0, 1, _Q170_GHOST_BUCKET):
            dirty.add(r["source"])
        st = full[r["source"]]
        n = len(r["text"])
        st[0] += 1
        st[1] += n
        st[2] = n if st[2] is None else min(st[2], n)
        st[3] = n if st[3] is None else max(st[3], n)
    got = {r["source"]: r for r in rows}
    assert set(got) == set(full)
    assert {s for s, r in got.items() if r["dirty"]} == dirty
    for s, st in full.items():
        r = got[s]
        assert (r["n_docs"], r["sum_chars"], r["min_chars"], r["max_chars"]) == (
            st[0],
            st[1],
            st[2],
            st[3],
        )
