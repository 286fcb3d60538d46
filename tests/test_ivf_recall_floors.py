"""IVF recall floors across data regimes (r16, VERDICT r15 item 8).

The structure-aware nprobe law (``suggest_ivf_nprobe``'s margin ramp)
is replayed by the DuckDB oracle from the same statistic, so an oracle
pass verifies REPLAY, not the law: a constants change that tanked
recall would still hash-match.  The standing guards are the recall
artifacts (SCALE_CLUSTERED.json) and ``sf1_invariants``'s
``IVF_RECALL_FLOOR`` — but until r16 the pytest-run floor was asserted
only on the ISOTROPIC fixture.  This module pins floors on all three
measured regimes (isotropic, clustered sigma=.06, clustered sigma=.12 —
the ``gen_scale_data.py --clusters`` recipe, seeds fixed), so the next
constants change cannot pass on replay alone in any regime.

Floors are set a small step under the measured values at n=2000
(deterministic corpora + the hash-seeded deterministic quantizer →
deterministic recall; the margin law's POINT is recall ~flat in n,
the same contract the sf1 campaign asserts): measured mean recall
0.90 / 1.00 / 1.00 at k=10 over 8 queries — the same regime split
SCALE_CLUSTERED.json measured at n=20,000 (0.88 / 1.0 / 1.0).  A drop
below 0.85/0.95/0.95 is a law regression, not noise.
"""

from __future__ import annotations

import numpy as np
import pytest

from k8stream_spark.analytics import similarity

N = 2000
DIM = 64
K = 10
QIDS = tuple(range(8))

#: (name, clusters, sigma, mean-recall floor) — clusters=0 → isotropic.
REGIMES = (
    ("isotropic", 0, 0.0, 0.85),
    ("clustered_s06", 12, 0.06, 0.95),
    ("clustered_s12", 12, 0.12, 0.95),
)


def _corpus(clusters: int, sigma: float) -> np.ndarray:
    rng = np.random.default_rng(42)
    if clusters <= 0:
        full = rng.standard_normal((N, DIM))
    else:
        centers = rng.standard_normal((clusters, DIM))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        w = rng.dirichlet(np.full(clusters, 2.0))
        assign = rng.choice(clusters, size=N, p=w)
        full = centers[assign] + sigma * rng.standard_normal((N, DIM))
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    return full.astype(np.float32)


@pytest.mark.parametrize("name,clusters,sigma,floor", REGIMES)
def test_ivf_default_nprobe_recall_floor(
    spark, name, clusters, sigma, floor
):
    X = _corpus(clusters, sigma)
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<float>",
    )
    got: dict[int, set[int]] = {q: set() for q in QIDS}
    for r in similarity.cosine_topk_ivf(emb, QIDS, k=K).collect():
        got[int(r.query_id)].add(int(r.neighbor_id))
    Xd = X.astype(np.float64)
    sims = Xd[list(QIDS)] @ Xd.T
    recalls = []
    for qi, q in enumerate(QIDS):
        s = sims[qi].copy()
        s[q] = -np.inf  # self excluded, same as the operator
        exact = set(np.argsort(-s)[:K].tolist())
        recalls.append(len(got[q] & exact) / K)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= floor, (name, mean_recall, sorted(recalls))
