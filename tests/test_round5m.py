"""q167 (partition-skew audit) and q168 (matryoshka truncation recall):
pure-Python/numpy re-derivations of both verdicts."""

import hashlib
import os
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5m-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _md5_bucket(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n


def _gini(xs):
    xs = sorted(xs)
    n = len(xs)
    tot = sum(xs)
    return (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * tot) / (
        n * tot
    )


def test_q167_matches_python_and_salting_helps(spark):
    from sparkextract.queries.round5m import (
        _Q167_B,
        _Q167_SALTS,
        q167_partition_skew_audit,
    )

    rows = {r["policy"]: r for r in q167_partition_skew_audit(spark, SF_DIR).collect()}
    tbl = pq.read_table(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_type", "event_id"]
    ).to_pylist()
    for policy in ("hash", "salted"):
        counts = Counter()
        for r in tbl:
            key = (
                r["event_type"]
                if policy == "hash"
                else f"{r['event_type']}|{r['event_id'] % _Q167_SALTS}"
            )
            counts[_md5_bucket(key, _Q167_B)] += 1
        loads = [counts.get(b, 0) for b in range(_Q167_B)]
        got = rows[policy]
        assert got["n_empty"] == sum(1 for x in loads if x == 0)
        assert got["max_rows"] == max(loads)
        # engines round HALF_UP; Python round() is half-even
        assert got["gini_u"] == int(np.floor(1e6 * _gini(loads) + 0.5))
    # the audit's whole point: salting reduces both imbalance and Gini
    assert rows["salted"]["imbalance_u"] < rows["hash"]["imbalance_u"]
    assert rows["salted"]["gini_u"] < rows["hash"]["gini_u"]
    assert rows["hash"]["n_empty"] >= _Q167_B - 5  # only 5 event types


def test_q168_matches_numpy_reference(spark):
    from sparkextract.queries.round5m import (
        _Q168_PREFIX,
        _Q168_QBUCKETS,
        _Q168_TOPK,
        q168_matryoshka_recall,
    )

    got = {
        r["query_id"]: r["n_overlap"]
        for r in q168_matryoshka_recall(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_pylist()
    V = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)

    def topk(qi, prefix):
        q = V[qi][:prefix] if prefix else V[qi]
        out = []
        for ci, cid in enumerate(ids):
            if cid == ids[qi]:
                continue
            c = V[ci][:prefix] if prefix else V[ci]
            cos = round(
                float(np.dot(c, q) / (np.linalg.norm(c) * np.linalg.norm(q))), 6
            )
            out.append((-cos, cid))
        out.sort()
        return {cid for _, cid in out[:_Q168_TOPK]}

    qids = [i for i, v in enumerate(ids) if _md5_bucket(str(v), _Q168_QBUCKETS) == 0]
    assert qids and set(got) == {ids[i] for i in qids}
    for qi in qids:
        expect = len(topk(qi, None) & topk(qi, _Q168_PREFIX))
        assert got[ids[qi]] == expect
