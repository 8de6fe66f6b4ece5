"""q210 (fuzzy minhash decontamination) and q211 (dedup ROI curve):
pure-Python re-derivations at sf0.001."""

import hashlib
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from sparkextract.spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparkextract-r5ah-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _docs():
    return pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()


def _tri(w):
    return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)] if len(w) >= 3 else []


def _kg(w, k):
    return (
        [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)] if len(w) >= k else []
    )


def test_q210_matches_python_and_catches_paraphrase(spark):
    from sparkextract.queries.round5ah import (
        _Q210_BANDS,
        _Q210_EVAL_BUCKETS,
        _Q210_EXACT_K,
        _Q210_MIN_JAC_U,
        _Q210_PERTURB_EVERY,
        q210_fuzzy_decontamination,
    )

    docs = _docs()
    words = {}
    ev = {}
    corpus = {}
    for d in docs:
        w = [t for t in d["text"].split(" ") if t]
        h = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16)
        if h % _Q210_EVAL_BUCKETS == 0:
            ev[d["doc_id"]] = w
        else:
            corpus[d["doc_id"]] = w
    for doc_id, w in ev.items():
        corpus[doc_id + 5000000] = [
            "zz" if (i + 1) % _Q210_PERTURB_EVERY == 0 else t
            for i, t in enumerate(w)
        ]

    def sigs(w):
        tri = _tri(w)
        if not tri:
            return None
        return tuple(
            min(hashlib.md5(f"f{b}|{s}".encode()).hexdigest() for s in tri)
            for b in range(_Q210_BANDS)
        )

    esig = {i: sigs(w) for i, w in ev.items() if sigs(w)}
    cand = set()
    for ci, cw in corpus.items():
        cs = sigs(cw)
        if not cs:
            continue
        for ei, es in esig.items():
            if any(cs[b] == es[b] for b in range(_Q210_BANDS)):
                cand.add((ci, ei))
    expected = {}
    for ci, ei in cand:
        ta, tb = set(_tri(corpus[ci])), set(_tri(ev[ei]))
        jac = (1000000 * len(ta & tb)) // len(ta | tb)
        if jac >= _Q210_MIN_JAC_U:
            exact = bool(
                set(_kg(corpus[ci], _Q210_EXACT_K)) & set(_kg(ev[ei], _Q210_EXACT_K))
            )
            expected[(ci, ei)] = (jac, exact)
    rows = {
        (r["corpus_id"], r["eval_id"]): r
        for r in q210_fuzzy_decontamination(spark, SF_DIR).collect()
    }
    assert set(rows) == set(expected)
    for key, (jac, exact) in expected.items():
        assert rows[key]["jac_u"] == jac
        assert rows[key]["exact_contaminated"] == exact
    # the headline property: injected paraphrases are CAUGHT by the
    # fuzzy tier (banded LSH + a 0.5 Jaccard verify are probabilistic —
    # a 1-in-10 token edit leaves trigram Jaccard ~0.54, so a marginal
    # doc can dip under either gate; demand >= 80% recall, not 100%)
    # while remaining INVISIBLE to the exact 13-gram tier
    caught_paraphrase = {
        k for k in rows if k[0] >= 5000000 and k[0] - 5000000 == k[1]
    }
    long_evals = {i for i, w in ev.items() if len(w) >= 30}
    want = {(i + 5000000, i) for i in long_evals}
    assert len(want & caught_paraphrase) >= 0.8 * len(want)
    assert caught_paraphrase
    for k in caught_paraphrase:
        assert not rows[k]["exact_contaminated"]
        # sanity on the perturbation itself
        w = ev[k[1]]
        assert not (
            set(_kg(corpus[k[0]], _Q210_EXACT_K)) & set(_kg(w, _Q210_EXACT_K))
        )


def test_q211_matches_python_roi(spark):
    from sparkextract.queries.round5ah import _Q211_TOPK, q211_dedup_roi_curve

    docs = _docs()
    corpus = [(d["doc_id"], d["text"]) for d in docs] + [
        (d["doc_id"] + 1000000, d["text"]) for d in docs if d["doc_id"] % 13 == 0
    ]
    clusters: dict[str, list] = {}
    for _, text in corpus:
        clusters.setdefault(hashlib.md5(text.encode()).hexdigest(), []).append(text)
    stats = {
        k: (len(v), len(v[0]), (len(v) - 1) * len(v[0])) for k, v in clusters.items()
    }
    total = sum(n * ln for n, ln, _ in stats.values())
    order = sorted(stats, key=lambda k: (-stats[k][2], k))[:_Q211_TOPK]
    rows = q211_dedup_roi_curve(spark, SF_DIR).collect()
    assert [r["ckey"] for r in rows] == order
    cum = 0
    for r, k in zip(rows, order):
        n, ln, rem = stats[k]
        cum += rem
        assert (r["cluster_size"], r["removable_chars"]) == (n, rem)
        assert r["cum_removable"] == cum
        assert r["total_chars"] == total
        assert r["cum_saved_frac_u"] == (1000000 * cum) // total
    # injected verbatim copies guarantee a non-trivial ROI
    assert rows[0]["removable_chars"] > 0
