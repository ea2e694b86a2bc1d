"""Dedup + similarity operator tests: recall of the approximate scale paths
against their exact baselines, and kernel parity against pure-python
references (SURVEY §5 tier-2 style: explicit inputs, expected outputs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from core_spark.operators import dedup as dd
from core_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


# ---------------------------------------------------------------- winnowing


def _winnow_ref(s: str, k: int, w: int):
    """Pure-python MOSS winnowing (rightmost window minimum)."""
    b = s.encode()
    if len(b) >= k:
        vs = [int.from_bytes(b[i : i + k], "big") for i in range(len(b) - k + 1)]
    else:
        vs = [int.from_bytes(b.ljust(k, b"\x00"), "big")]
    hs = [int(dd._splitmix64(np.uint64(v))) for v in vs]
    sel = set()
    if len(hs) <= w:
        sel.add(min(hs))
    else:
        for i in range(len(hs) - w + 1):
            win = hs[i : i + w]
            m = min(win)
            j = max(jj for jj in range(w) if win[jj] == m)
            sel.add(hs[i + j])
    return sorted(int(np.int64(np.uint64(x))) for x in sel)


def test_winnow_kernel_matches_reference():
    for s in [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",
        "ab",
        "",
        "hello world hello world hello world",
    ]:
        got = sorted(dd._winnow_one(s, 5, 4).tolist())
        assert got == _winnow_ref(s, 5, 4), s


def test_winnow_guarantee_shared_substring():
    # winnowing guarantees: a shared substring of length >= k+w-1 (here 8)
    # yields at least one shared fingerprint
    k, w = 5, 4
    core = "zqxjvkwpbyfgmdh"  # 15 chars >> k+w-1
    a = dd._winnow_one("left padding " + core + " tail a", k, w)
    b = dd._winnow_one("other prefix " + core + " endings", k, w)
    assert len(np.intersect1d(a, b)) >= 1


def test_winnow_pairs_finds_near_dups(spark, docs):
    pairs = dd.winnow_pairs(docs, threshold=0.5).collect()
    assert len(pairs) > 0
    assert all(r["containment"] >= 0.5 for r in pairs)
    # winnow pairs should contain the exact duplicates (identical text)
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dd.exact_duplicates(docs).collect()
    }
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs}
    assert exact <= got, f"missing exact dups: {exact - got}"


def test_ngram_candidate_strategies_agree(spark, docs):
    """ngram_jaccard_pairs is EXACT under every candidate strategy: the
    bitmap-block (auto), array-block, and rarity-prefix paths must return
    identical pair sets with identical jaccard values — each filter only
    prunes pairs provably below the threshold."""

    def run(**kw):
        return {
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in dd.ngram_jaccard_pairs(
                docs, threshold=0.8, block_cols=["lang"], **kw
            ).collect()
        }

    bitmap = run()
    assert bitmap == run(bitmap_max_vocab=0)  # array verify
    assert bitmap == run(prefix_filter=True)  # prefix candidates
    assert bitmap  # non-vacuous: the corpus has near-dup pairs


def test_ngram_prefix_path_never_materializes_on_driver(spark, docs, monkeypatch):
    """The rarity-prefix candidate path must stay fully distributed: no
    toPandas()/collect() during plan build OR execution — at 10^12 docs the
    shingle vocabulary is billions of rows and any driver pass OOMs. The
    array-verify knob (bitmap_max_vocab=0) also skips the block path's
    bounded vocab probe, so the whole query runs with driver collection
    hard-disabled."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **kw):  # pragma: no cover - failure path
        raise AssertionError("driver-side materialization in prefix path")

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    out = dd.ngram_jaccard_pairs(
        docs, threshold=0.8, prefix_filter=True, bitmap_max_vocab=0
    )
    assert out.count() > 0


# ---------------------------------------------------------------- minhash/lsh


def test_minhash_recall_vs_exact_jaccard(spark, docs):
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    approx = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dd.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    # precision is exact by construction (candidates re-verified)
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.9


# ---------------------------------------------------------------- ANN


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_vs_brute_force(spark, embeddings):
    qids = list(range(10))
    brute = _topk_sets(sim.brute_force_topk(embeddings, qids, k=10).collect())
    ivf = _topk_sets(sim.ivf_topk(embeddings, qids, k=10, n_probe=4).collect())
    recalls = [
        len(brute[q] & ivf.get(q, set())) / len(brute[q]) for q in brute
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_deterministic(spark, embeddings):
    a = sorted(map(tuple, sim.ivf_topk(embeddings, [0, 1], k=5).collect()))
    b = sorted(map(tuple, sim.ivf_topk(embeddings, [0, 1], k=5).collect()))
    assert a == b


def test_lsh_recall_vs_brute_force(spark, embeddings):
    qids = list(range(10))
    brute = _topk_sets(sim.brute_force_topk(embeddings, qids, k=10).collect())
    lsh = _topk_sets(sim.lsh_topk(embeddings, qids, k=10).collect())
    recalls = [len(brute[q] & lsh.get(q, set())) / len(brute[q]) for q in brute]
    assert sum(recalls) / len(recalls) >= 0.3, recalls  # sign-LSH theory for near-random 64-d: 1-(1-p^6)^12 ~ 0.44


def test_knn_classify_majority_vote(spark):
    # 3 tight clusters in 2-D; every query's 4 nearest neighbours are its own
    # cluster mates => prediction == true label, 4 votes each.
    import math

    rows = []
    centers = {0: (1.0, 0.0), 1: (0.0, 1.0), 2: (-1.0, -1.0)}
    vid = 0
    for lbl, (cx, cy) in centers.items():
        for j in range(5):
            eps = 0.01 * j
            n = math.hypot(cx + eps, cy + eps) or 1.0
            rows.append((vid, [(cx + eps) / n, (cy + eps) / n], lbl))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    from core_spark.operators import similarity as sim

    out = sim.knn_classify(df, query_ids=[0, 5, 10], k=4).collect()
    by_q = {r["query_id"]: r for r in out}
    assert by_q[0]["predicted_label"] == 0 and by_q[0]["correct"] == 1
    assert by_q[5]["predicted_label"] == 1 and by_q[5]["votes"] == 4
    assert by_q[10]["predicted_label"] == 2


def test_dedup_components_chain_and_fixpoint(spark):
    # chain 1-2-3-4 plus isolated pair (10,11): two components, min labels
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    got = {
        r["doc_id"]: (r["component_id"], r["group_size"])
        for r in dd.dedup_components(pairs).collect()
    }
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 2), 11: (10, 2),
    }


def test_cosine_near_dup_lsh_recall_vs_exact(spark):
    """Default (multi-table sign-LSH) candidate generation: precision stays
    exact (every candidate re-scored) and recall vs the exact quadratic path
    is near-1 for high-cosine pairs (8 tables x 8 planes)."""
    rng = np.random.default_rng(11)
    rows, vid = [], 0
    for i in range(40):
        v = rng.normal(size=64)
        v /= np.linalg.norm(v)
        rows.append((vid, v.tolist()))
        vid += 1
        if i < 15:  # plant a near-dup (cos ~0.99) for the first 15
            w = v + rng.normal(scale=0.02, size=64)
            w /= np.linalg.norm(w)
            rows.append((vid, w.tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in sim.cosine_near_dup_pairs(df, threshold=0.95, exact=True).collect()
    }
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in sim.cosine_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert len(exact) >= 15  # the plants are above threshold
    assert lsh <= exact  # precision exact by construction
    assert len(lsh) / len(exact) >= 0.9  # multi-table OR recall


def test_line_dedup_first_occurrence(spark):
    from core_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),       # beta dies (doc1 pos1 wins)
            (3, "gamma\nbeta"),       # both die
            (4, "epsilon"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines_kept"], r["text"])
        for r in dd.line_dedup(docs, "doc_id", "text").collect()
    }
    assert out[1] == (3, "alpha\nbeta\ngamma")  # untouched, order kept
    assert out[2] == (1, "delta")
    assert 3 not in out  # fully deduplicated docs vanish
    assert out[4] == (1, "epsilon")


def test_pii_scrub_and_counts(spark):
    import pandas as pd

    from core_spark.functions import text as tx
    from pyspark.sql import functions as F

    raw = (
        "mail me at john.doe+x@corp.example.org, call (555) 123-4567, "
        "ssn 987-65-4321, card 1234-5678-9012-3456, host 192.168.0.12"
    )
    df = spark.createDataFrame(pd.DataFrame({"t": [raw, "clean text"]}))
    counts = tx.pii_counts(F.col("t"))
    row = (
        df.select(
            tx.pii_scrub(F.col("t")).alias("s"),
            *[v.alias(k) for k, v in counts.items()],
        )
        .collect()
    )
    hit, clean = (row[0], row[1]) if "clean" not in row[0]["s"] else (row[1], row[0])
    assert "<EMAIL>" in hit["s"] and "<PHONE>" in hit["s"]
    assert "<SSN>" in hit["s"] and "<CARD>" in hit["s"] and "<IPV4>" in hit["s"]
    # nothing PII-shaped survives
    import re

    assert not re.search(r"\d{3}-\d{2}-\d{4}", hit["s"])
    assert "@" not in hit["s"]
    assert (hit["email"], hit["ssn"], hit["card"], hit["phone"], hit["ipv4"]) == (
        1, 1, 1, 1, 1,
    )
    assert clean["s"] == "clean text"
    assert sum(clean[k] for k in ("email", "ssn", "card", "phone", "ipv4")) == 0
