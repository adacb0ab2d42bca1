"""Out-of-sample query (reference annchor/query_functions.py:10-212).

Re-uses the fitted regression + error model (no retraining) and the
same batched device kernels, with the asymmetric query-side bounds

    lb = max_a |D[i,a] - QD[j,a]|     ub = min_a (D[i,a] + QD[j,a]).

Each candidate pair is (database index, query index); every query's
pair list lives in the same padded incidence layout as the fit path.
"""

from __future__ import annotations

import numpy as np

from annchor_tpu.ops import pairs as pair_ops
from annchor_tpu.ops.features import bounds_and_dad
from annchor_tpu.ops.locality import query_candidates


def _anchor_objects(X, A):
    try:
        return np.asarray(X)[np.asarray(A, dtype=int)]
    except Exception:
        return [X[int(a)] for a in A]


def get_query_anchor_dists(ann, Q, geq):
    """nq x na exact anchor distances for the queries
    (reference query_functions.py:10-15)."""
    nq = len(Q)
    na = ann.n_anchors
    XA = _anchor_objects(ann.X, ann.A)
    IJ = np.array(
        [[i, j] for j in range(nq) for i in range(na)], dtype=np.int64
    )
    D = np.asarray(geq(ann.f, XA, Q, IJ), dtype=np.float64)
    return D.reshape(nq, na)


def get_query_features(ann, Q, QD, check):
    """Pairs, padded index and features for the query candidates
    (reference query_functions.py:40-129)."""
    nq = len(Q)
    IJs = np.concatenate(
        [
            np.stack(
                [check[i], np.full(check[i].shape, i, dtype=np.int64)], axis=1
            )
            for i in range(nq)
        ]
    ).astype(np.int64)
    P_idx, P_cnt = pair_ops.build_point_index_single(IJs[:, 1], nq)

    lb, ub, dad = bounds_and_dad(ann.D, IJs[:, 0], IJs[:, 1], DJ=QD)
    if len(ann.A):
        anchors = np.isin(IJs[:, 0], np.asarray(ann.A, dtype=int)).astype(
            np.float64
        )
    else:
        anchors = np.zeros(IJs.shape[0])
    Qfeatures = np.stack([lb, ub, dad, anchors], axis=1)
    Qncm = Qfeatures[:, 3] < 1
    return IJs, P_idx, P_cnt, Qfeatures, Qncm


def select_refine_candidate_query_pairs(
    ann, IJs, Q, P_idx, P_cnt, QRA, Qncm, Qerrors, p_work, nn, geq
):
    """One-shot refinement with the query work budget
    (reference query_functions.py:132-180)."""
    nq = len(Q)
    thresh = np.asarray(
        pair_ops.kth_smallest_per_point(QRA, P_idx, nn), dtype=np.float64
    )
    QRA = pair_ops.guarantee_nmin(QRA, Qncm, P_idx, P_cnt, 3 * nn // 2)

    p = (thresh[IJs[:, 1]] - QRA)[Qncm]
    prob = pair_ops.empirical_cdf_probs(
        p, Qerrors[Qncm], ann.error_predictor.errs
    )

    nbf = nq * ann.nx
    na = ann.n_anchors * nq
    n_refine = int(p_work * nbf - na) + 1
    n_refine = max(0, min(n_refine, prob.shape[0]))

    if n_refine >= prob.shape[0]:
        candidates = np.arange(prob.shape[0])
    else:
        candidates = np.argpartition(-prob, n_refine)[:n_refine]
    mapback = np.arange(Qncm.shape[0])[Qncm][candidates]

    exact = np.asarray(
        geq(ann.f, ann.X, Q, IJs[mapback]), dtype=np.float64
    )
    QRA[mapback] = exact
    Qncm[mapback] = False
    return QRA, Qncm


def query_(ann, Q, nn=15, p_work=0.3, get_exact_query_ijs=None):
    """Full query pipeline (reference query_functions.py:183-212).

    Returns (ngi, ngd): the nn nearest database indices/distances per
    query row.
    """
    if get_exact_query_ijs is not None:
        ann.get_exact_query_ijs = get_exact_query_ijs
    geq = ann._get_exact_query_ijs_for(ann.f)

    QD = get_query_anchor_dists(ann, Q, geq)
    check = query_candidates(ann.S, QD, ann.locality, ann.loc_thresh)
    IJs, P_idx, P_cnt, Qfeatures, Qncm = get_query_features(
        ann, Q, QD, check
    )

    Qpred = ann.regression.predict(Qfeatures, ann.feature_names)
    ilb = ann.feature_names.index("lower bound")
    iub = ann.feature_names.index("upper bound")
    Qpred = np.clip(Qpred, Qfeatures[:, ilb], Qfeatures[:, iub])
    Qerrors = ann.error_predictor.predict(Qfeatures, ann.feature_names)
    QRA = Qpred.copy()

    QRA, Qncm = select_refine_candidate_query_pairs(
        ann, IJs, Q, P_idx, P_cnt, QRA, Qncm, Qerrors, p_work, nn, geq
    )

    ngi, ngd, _ = pair_ops.knn_from_pairs(QRA, IJs, P_idx, Qncm, nn)
    return ngi, ngd
