"""q214 (grid DBSCAN-lite) and q215 (design effect): pure-Python
re-derivations at sf0.001."""

import math
import os

import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5aj-tests", master="local[4]", shuffle_partitions=8)
    yield s


def test_q214_matches_python_grid_dbscan(spark):
    from sparkextract.queries.round5aj import (
        _Q214_GRID,
        _Q214_MINPTS,
        q214_grid_dbscan,
    )

    emb = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"), columns=["embedding"]
    ).to_pylist()
    pts = [(float(e["embedding"][0]), float(e["embedding"][1])) for e in emb]
    x1 = [p[0] for p in pts]
    x2 = [p[1] for p in pts]
    b = (min(x1), max(x1), min(x2), max(x2))
    cells: dict[tuple, int] = {}
    for e1, e2 in pts:
        cx = min(int(math.floor(_Q214_GRID * (e1 - b[0]) / (b[1] - b[0] + 1e-9))), _Q214_GRID - 1)
        cy = min(int(math.floor(_Q214_GRID * (e2 - b[2]) / (b[3] - b[2] + 1e-9))), _Q214_GRID - 1)
        cells[(cx, cy)] = cells.get((cx, cy), 0) + 1
    dense = {c for c, n in cells.items() if n >= _Q214_MINPTS}
    # connected components of dense cells (4-neighborhood), min-id label
    label = {c: c[0] * _Q214_GRID + c[1] for c in dense}
    changed = True
    while changed:
        changed = False
        for cx, cy in dense:
            for nx, ny in ((cx + 1, cy), (cx - 1, cy), (cx, cy + 1), (cx, cy - 1)):
                if (nx, ny) in dense:
                    m = min(label[(cx, cy)], label[(nx, ny)])
                    if label[(cx, cy)] != m or label[(nx, ny)] != m:
                        label[(cx, cy)] = label[(nx, ny)] = m
                        changed = True
    rows = {(r["cx"], r["cy"]): r for r in q214_grid_dbscan(spark, SF_DIR).collect()}
    assert set(rows) == set(cells)
    n_clusters = len(set(label.values())) if label else 0
    for c, n in cells.items():
        r = rows[c]
        assert r["n_points"] == n
        assert r["dense"] == (c in dense)
        if c in dense:
            assert r["cluster_id"] == label[c]
        else:
            assert r["cluster_id"] == -1
    # density structure is non-trivial: some dense cells, some noise
    assert dense and len(dense) < len(cells)
    assert n_clusters >= 1


def test_q215_matches_python_anova(spark):
    from sparkextract.queries.round5aj import q215_design_effect

    (r,) = q215_design_effect(spark, SF_DIR).collect()
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["source", "n_chars"]
    ).to_pylist()
    groups: dict[str, list] = {}
    for d in docs:
        groups.setdefault(d["source"], []).append(d["n_chars"])
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s1 = sum(sum(v) for v in groups.values())
    s2 = sum(x * x for v in groups.values() for x in v)
    grand = s1 * s1 / n
    sst = s2 - grand
    ssb = sum(sum(v) ** 2 / len(v) for v in groups.values()) - grand
    msb = ssb / (k - 1)
    msw = (sst - ssb) / (n - k)
    m_bar = n / k
    rho = (msb - msw) / (msb + (m_bar - 1) * msw)
    deff = 1 + (m_bar - 1) * round(rho, 6)
    assert (r["n_sources"], r["n_docs"]) == (k, n)
    assert abs(r["m_bar"] - round(m_bar, 6)) < 1e-9
    assert abs(r["sst"] - round(sst, 6)) < 1e-4
    assert abs(r["ssb"] - round(ssb, 6)) < 1e-4
    assert abs(r["rho"] - round(rho, 6)) < 1e-6
    assert abs(r["deff"] - round(deff, 6)) < 1e-4
    # sanity: rho in [-1, 1], deff positive
    assert -1.0 <= r["rho"] <= 1.0
    assert r["deff"] > 0
