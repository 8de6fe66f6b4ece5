"""q185 (A-priori association rules): pure-Python re-derivation at
sf0.001."""

import os
from collections import Counter
from itertools import combinations

import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5t-tests", master="local[4]", shuffle_partitions=8)
    yield s


def test_q185_matches_python_apriori(spark):
    from sparkextract.queries.round5t import (
        _Q185_MINCONF_U,
        _Q185_SUP_DEN,
        q185_association_rules,
    )

    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in q185_association_rules(spark, SF_DIR).collect()
    }
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    ).to_pylist()
    sets = [set(t for t in r["text"].split(" ") if t) for r in docs]
    n = len(sets)
    minsup = n // _Q185_SUP_DEN
    df = Counter(t for s in sets for t in s)
    freq = {t for t, c in df.items() if c >= minsup}
    pair_df = Counter()
    for s in sets:
        for a, b in combinations(sorted(s & freq), 2):
            pair_df[(a, b)] += 1
    expected = {}
    for (a, b), c in pair_df.items():
        if c < minsup:
            continue
        for ante, cons in ((a, b), (b, a)):
            conf_u = (1000000 * c) // df[ante]
            if conf_u >= _Q185_MINCONF_U:
                lift_u = (1000000 * c * n) // (df[ante] * df[cons])
                expected[(ante, cons)] = (df[ante], df[cons], c, conf_u, lift_u)
    assert set(rows) == set(expected)
    for key, (da, dc, dab, conf, lift) in expected.items():
        r = rows[key]
        assert (
            r["df_ante"],
            r["df_cons"],
            r["df_ab"],
            r["conf_u"],
            r["lift_u"],
        ) == (da, dc, dab, conf, lift)
    # every rule's support clears minsup and confidence its floor
    assert all(r["df_ab"] >= minsup for r in rows.values())
    assert all(r["conf_u"] >= _Q185_MINCONF_U for r in rows.values())
