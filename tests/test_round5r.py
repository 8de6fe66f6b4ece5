"""q181 (sample-churn audit) and q182 (HITS): pure-Python
re-derivations at sf0.001."""

import hashlib
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5r-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _md5_bucket(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n


def test_q181_id_keyed_sample_is_stable_content_keyed_churns(spark):
    from sparkextract.queries.round5r import (
        _Q181_SAMPLE_DEN,
        _Q181_SNAP_BUCKETS,
        q181_sample_churn_audit,
    )

    rows = {r["policy"]: r for r in q181_sample_churn_audit(spark, SF_DIR).collect()}
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    old = {
        r["doc_id"]: (
            "v0 " + r["text"]
            if _md5_bucket(str(r["doc_id"]), _Q181_SNAP_BUCKETS) == 1
            else r["text"]
        )
        for r in docs
        if _md5_bucket(str(r["doc_id"]), _Q181_SNAP_BUCKETS) != 0
    }
    new = {r["doc_id"]: r["text"] for r in docs}
    preds = {
        "id_keyed": lambda d, t: _md5_bucket(f"s|{d}", _Q181_SAMPLE_DEN) == 0,
        "content_keyed": lambda d, t: _md5_bucket(t, _Q181_SAMPLE_DEN) == 0,
    }
    for policy, pred in preds.items():
        so = {d for d, t in old.items() if pred(d, t)}
        sn = {d for d, t in new.items() if pred(d, t)}
        r = rows[policy]
        assert r["n_sampled_old"] == len(so)
        assert r["n_sampled_new"] == len(sn)
        assert r["n_overlap"] == len(so & sn)
        assert r["n_lost_surviving"] == len((so - sn) & set(new))
        assert r["churn_u"] == (
            0
            if not so
            else (1000000 * (len(so) - len(so & sn))) // len(so)
        )
    # the stability contract: id-keyed membership never rotates for a
    # surviving doc; content-keyed measurably does (the changed bucket)
    assert rows["id_keyed"]["n_lost_surviving"] == 0
    assert rows["content_keyed"]["n_lost_surviving"] > 0


def test_q182_matches_python_hits_iteration(spark):
    from sparkextract.queries.round5r import (
        _Q182_FANOUT,
        _Q182_TOPK,
        _Q182_UNIT,
        q182_hits_hubs_authorities,
    )

    out = q182_hits_hubs_authorities(spark, SF_DIR).collect()
    ids = [
        r["doc_id"]
        for r in pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"]
        ).to_pylist()
    ]
    n = len(ids)
    edges = []
    for d in ids:
        for j in range(_Q182_FANOUT):
            dst = int(hashlib.md5(f"{d}#{j}".encode()).hexdigest()[:8], 16) % n
            if dst != d:
                edges.append((d, dst))
    indeg = Counter(dst for _s, dst in edges)
    a_raw = {v: _Q182_UNIT * c for v, c in indeg.items()}
    amx = max(a_raw.values())
    an = {v: (r * _Q182_UNIT) // amx for v, r in a_raw.items()}
    h_raw = Counter()
    for s, d in edges:
        h_raw[s] += an.get(d, 0)
    hmx = max(h_raw.values())
    hn = {u: (r * _Q182_UNIT) // hmx for u, r in h_raw.items()}
    for role, scores in (("authority", an), ("hub", hn)):
        top = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:_Q182_TOPK]
        got = sorted(
            (r for r in out if r["role"] == role), key=lambda r: r["rnk"]
        )
        assert [(r["doc_id"], r["score_u"]) for r in got] == top
        assert [r["rnk"] for r in got] == list(range(1, len(top) + 1))
