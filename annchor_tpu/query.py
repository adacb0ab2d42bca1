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
    IJ = np.stack(
        [
            np.tile(np.arange(na, dtype=np.int64), nq),
            np.repeat(np.arange(nq, dtype=np.int64), na),
        ],
        axis=1,
    )
    D = np.asarray(geq(ann.f, XA, Q, IJ), dtype=np.float64)
    return D.reshape(nq, na)


def get_query_features(ann, Q, QD, check):
    """Pairs, padded index and features for the query candidates
    (reference query_functions.py:40-129).  `check` is the flat
    (db_ids, q_ids) candidate layout from ops.locality.query_candidates
    — no per-query Python assembly."""
    nq = len(Q)
    db_ids, q_ids = check
    IJs = np.stack([db_ids, q_ids], axis=1)
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


def _per_query_topk(eq, ed, nq: int, k: int):
    """Vectorised per-query head of the evaluated pair lists.

    eq: (E,) query ids; ed: (E,) distances.  Returns (order, rank)
    where order sorts by (query, distance) and rank is each entry's
    position within its query — entries with rank < k are the query's
    current k best evaluated pairs.  No per-query Python loop."""
    order = np.lexsort((ed, eq))
    eq_s = eq[order]
    starts = np.searchsorted(eq_s, np.arange(nq))
    rank = np.arange(eq_s.shape[0]) - starts[eq_s]
    return order, rank


def select_refine_candidate_query_pairs(
    ann, IJs, Q, P_idx, P_cnt, QRA, Qncm, Qerrors, p_work, nn, geq,
    seed_frac: float = 0.5, expand_rounds: int = 3,
):
    """Graph-guided refinement with the query work budget.

    The reference spends the whole budget in one shot ranked by the
    error model's probabilities (reference query_functions.py:132-180);
    on the digits exact-fit protocol that leaves ~2.7% of true
    neighbours unevaluated because the regression ranks them ~400th of
    ~1000 candidates.  The fitted k-NN graph itself is a far stronger
    signal: a missed true neighbour is almost always a graph-neighbour
    of a found one.  So: (1) seed with the error-model ranking on
    ``seed_frac`` of the budget, (2) repeatedly evaluate the fitted
    graph-neighbours of each query's current best evaluated points,
    (3) spend any leftover budget on the remaining candidates ranked
    by the error model against the now-exact per-query thresholds.
    Same eval budget, measured full-population recall 0.9726 -> 0.9999
    on the reference's exact-fit digits protocol.

    Returns (IJ_all, RA_all, ncm_all): the candidate pairs plus any
    graph-expansion pairs outside the locality candidate set (the
    expansion may legitimately recover neighbours the filter missed).
    """
    nq = len(Q)
    nx = ann.nx
    nbf = nq * nx
    na = ann.n_anchors * nq
    budget = max(0, int(p_work * nbf - na) + 1)

    keys_c = IJs[:, 1].astype(np.int64) * nx + IJs[:, 0]
    korder = np.argsort(keys_c, kind="stable")
    keys_sorted = keys_c[korder]

    def cand_lookup(keys):
        """Map pair keys to candidate row ids (-1 when absent)."""
        pos = np.searchsorted(keys_sorted, keys)
        pos = np.clip(pos, 0, keys_sorted.shape[0] - 1)
        hit = keys_sorted[pos] == keys
        return np.where(hit, korder[pos], -1)

    # ---- seed: error-model ranking (the reference's selection rule) --
    thresh = np.asarray(
        pair_ops.kth_smallest_per_point(QRA, P_idx, nn), dtype=np.float64
    )
    QRAg = pair_ops.guarantee_nmin(QRA, Qncm, P_idx, P_cnt, 3 * nn // 2)
    p = (thresh[IJs[:, 1]] - QRAg)[Qncm]
    prob = pair_ops.empirical_cdf_probs(
        p, Qerrors[Qncm], ann.error_predictor.errs
    )
    n_seed = min(int(budget * seed_frac), prob.shape[0])
    # the empirical CDF saturates at 0/1 (no mass past the residual
    # support): the raw margin breaks those ties deterministically
    order = np.lexsort((-p, -prob))[:n_seed]
    mapback = np.flatnonzero(Qncm)[order]
    exact = np.asarray(geq(ann.f, ann.X, Q, IJs[mapback]), dtype=np.float64)
    QRA = QRAg
    QRA[mapback] = exact
    Qncm[mapback] = False
    spent = mapback.shape[0]

    eq = [IJs[mapback, 1].astype(np.int64)]
    edb = [IJs[mapback, 0].astype(np.int64)]
    ed = [exact]
    visited = np.sort(keys_c[mapback])

    # ---- expansion: walk the fitted k-NN graph ----------------------
    # Each round proposes (q, l) for every graph-neighbour l of the
    # query's current best evaluated points j, screens by the triangle
    # lower bound |d(q,j) - d(j,l)| against the query's current kth
    # evaluated distance (a candidate that provably cannot enter the
    # query's top-nn is never evaluated), and spends the round's share
    # in per-query fair slots ordered by the triangle upper bound
    # d(q,j) + d(j,l) — the fit-side refine's rule.  (The r4 query
    # sweep saturated at 0.88 recall on the 20k scale index: the old
    # round truncated the candidate list in KEY order, i.e. by query
    # id, starving the back of the batch and ignoring the bounds.)
    G = np.asarray(ann.neighbor_graph[0])
    GD = np.asarray(ann.neighbor_graph[1])
    # Symmetrised walk graph: out-rows alone cannot propose a point t
    # whose edge points INTO the evaluated set (j in row of t while t
    # is not in row of j — common around hubs), which capped the r4
    # 20k sweep at 0.88 recall with every admissible out-candidate
    # already evaluated.  Append each point's in-neighbours (up to
    # one row-width, nearest first) so the walk crosses edges in
    # both directions.
    deg0 = G.shape[1]
    src_e = np.repeat(np.arange(G.shape[0], dtype=np.int64), deg0)
    dst_e = G.reshape(-1).astype(np.int64)
    d_e = GD.reshape(-1)
    oke = (dst_e >= 0) & (dst_e != src_e) & np.isfinite(d_e)
    order_e = np.lexsort((d_e[oke], dst_e[oke]))
    dst_s = dst_e[oke][order_e]
    starts_e = np.searchsorted(dst_s, np.arange(G.shape[0]))
    rank_e = np.arange(dst_s.shape[0]) - starts_e[dst_s]
    keep_e = rank_e < deg0
    Grev = np.full((G.shape[0], deg0), -1, dtype=G.dtype)
    GrevD = np.full((G.shape[0], deg0), np.inf)
    Grev[dst_s[keep_e], rank_e[keep_e]] = src_e[oke][order_e][keep_e]
    GrevD[dst_s[keep_e], rank_e[keep_e]] = d_e[oke][order_e][keep_e]
    G = np.concatenate([G, Grev], axis=1)
    GD = np.concatenate([GD, GrevD], axis=1)
    for r in range(expand_rounds):
        left = budget - spent
        if left <= 0:
            break
        share = left if r == expand_rounds - 1 else max(
            1, left // (expand_rounds - r)
        )
        aq = np.concatenate(eq)
        adb = np.concatenate(edb)
        ad = np.concatenate(ed)
        o, rank = _per_query_topk(aq, ad, nq, nn)
        head = o[rank < nn]
        src_q = aq[head]
        src_db = adb[head]
        src_d = ad[head]
        # per-query kth evaluated distance: the displacement screen's
        # threshold (inf while a query has < nn evaluations)
        cnt = np.bincount(aq, minlength=nq)
        kth = np.full(nq, np.inf)
        last = o[rank == np.minimum(nn - 1, cnt[aq[o]] - 1)]
        kth[aq[last]] = np.where(
            cnt[aq[last]] >= nn, ad[last], np.inf
        )
        deg = G.shape[1]
        cand_q = np.repeat(src_q, deg)
        cand_db = G[src_db].reshape(-1).astype(np.int64)
        d_jl = GD[src_db].reshape(-1)
        d_qj = np.repeat(src_d, deg)
        ok = (cand_db >= 0) & np.isfinite(d_jl)
        lb = np.abs(d_qj - d_jl)
        ub = d_qj + d_jl
        adm = ok & (lb < kth[cand_q])
        keys = cand_q[adm] * nx + cand_db[adm]
        ubk = ub[adm]
        # best-ub-wins dedupe, then drop already-evaluated pairs
        ordk = np.lexsort((ubk, keys))
        keys, ubk = keys[ordk], ubk[ordk]
        fresh = np.ones(keys.shape[0], dtype=bool)
        fresh[1:] = keys[1:] != keys[:-1]
        keys, ubk = keys[fresh], ubk[fresh]
        if visited.size:
            pos = np.clip(
                np.searchsorted(visited, keys), 0, visited.shape[0] - 1
            )
            unseen = visited[pos] != keys
            keys, ubk = keys[unseen], ubk[unseen]
        if keys.size == 0:
            break
        if keys.size > share:
            # per-query fair share: global priority = (rank within
            # the query's ub-ordered slate, then ub)
            qb = keys // nx
            oq = np.lexsort((ubk, qb))
            qb_s = qb[oq]
            qstarts = np.searchsorted(qb_s, np.arange(nq))
            wrank = np.arange(qb_s.shape[0]) - qstarts[qb_s]
            pick = oq[np.lexsort((ubk[oq], wrank))[:share]]
            keys = keys[pick]
        new = np.sort(keys)
        cq = (new // nx).astype(np.int64)
        cdb = (new % nx).astype(np.int64)
        d = np.asarray(
            geq(ann.f, ann.X, Q, np.stack([cdb, cq], axis=1)),
            dtype=np.float64,
        )
        eq.append(cq)
        edb.append(cdb)
        ed.append(d)
        visited = np.sort(np.concatenate([visited, new]))
        spent += new.shape[0]
        # expansion pairs already in the candidate set become computed
        crow = cand_lookup(new)
        hit = crow >= 0
        QRA[crow[hit]] = d[hit]
        Qncm[crow[hit]] = False

    # ---- fill: leftover budget back on the error model --------------
    left = budget - spent
    rem = np.flatnonzero(Qncm)
    if left > 0 and rem.size:
        aq = np.concatenate(eq)
        ad = np.concatenate(ed)
        o, rank = _per_query_topk(aq, ad, nq, nn)
        cntf = np.bincount(aq, minlength=nq)
        kth = np.full(nq, np.inf)
        last = o[rank == np.minimum(nn - 1, cntf[aq[o]] - 1)]
        # a query with fewer than nn evaluations has no kth yet —
        # keep +inf (every remaining candidate attractive), same rule
        # as the expansion rounds' displacement screen
        kth[aq[last]] = np.where(
            cntf[aq[last]] >= nn, ad[last], np.inf
        )
        pm = kth[IJs[rem, 1]] - QRA[rem]
        pr = pair_ops.empirical_cdf_probs(
            pm, Qerrors[rem], ann.error_predictor.errs
        )
        sel = rem[np.lexsort((-pm, -pr))[:left]]
        d = np.asarray(geq(ann.f, ann.X, Q, IJs[sel]), dtype=np.float64)
        QRA[sel] = d
        Qncm[sel] = False
        eq.append(IJs[sel, 1].astype(np.int64))
        edb.append(IJs[sel, 0].astype(np.int64))
        ed.append(d)

    # ---- union: candidates + expansion pairs outside the filter -----
    aq = np.concatenate(eq)
    adb = np.concatenate(edb)
    ad = np.concatenate(ed)
    akeys = aq * nx + adb
    extra = cand_lookup(akeys) < 0
    if extra.any():
        ex_keys, ex_first = np.unique(akeys[extra], return_index=True)
        ex_q = aq[extra][ex_first]
        ex_db = adb[extra][ex_first]
        ex_d = ad[extra][ex_first]
        IJ_all = np.concatenate(
            [IJs, np.stack([ex_db, ex_q], axis=1)], axis=0
        )
        RA_all = np.concatenate([QRA, ex_d])
        ncm_all = np.concatenate(
            [Qncm, np.zeros(ex_q.shape[0], dtype=bool)]
        )
    else:
        IJ_all, RA_all, ncm_all = IJs, QRA, Qncm
    return IJ_all, RA_all, ncm_all


def query_dm(Q, P, DP, f, geq, k=0, alpha=1.2, init=0):
    """Landmark-descent query against an anchor set (the reference's
    legacy path, reference query_functions.py:262-338, re-designed as
    a masked batched descent so every metric call is one batch).

    Each query walks the anchor graph: evaluate the current anchor,
    extend the query's *anchor profile* — the per-anchor root sum of
    squared deviations lM[a] = sqrt(sum_t (d_t - DP[a_t, a])^2) over
    visited anchors a_t — and descend to the profile-minimising anchor
    until it revisits one.  Then every anchor whose profile norm is
    within ``alpha`` of the (k+1)-smallest is evaluated exactly.

    Q: queries; P: anchor objects; DP: (na, na) anchor-to-anchor
    distances; geq: batched evaluator geq(f, Q, P, IJ) over pairs
    (query index, anchor index).
    Returns (As, Ds, lMs, nevals): per-query anchor ids / exact
    distances sorted ascending, final profile norms, metric-call count.
    """
    nq, mp = len(Q), len(P)
    DP = np.asarray(DP, dtype=np.float64)

    visited = [[] for _ in range(nq)]
    dvis = [[] for _ in range(nq)]
    sq = np.zeros((nq, mp))  # running sum of squared profile deviations
    cur = np.full(nq, int(init))
    active = np.ones(nq, dtype=bool)
    nevals = 0

    for _ in range(mp):
        ids = np.nonzero(active)[0]
        if ids.size == 0:
            break
        IJ = np.stack([ids, cur[ids]], axis=1)
        d = np.asarray(geq(f, Q, P, IJ), dtype=np.float64)
        nevals += ids.size
        for i, di in zip(ids, d):
            visited[i].append(int(cur[i]))
            dvis[i].append(float(di))
        sq[ids] += (d[:, None] - DP[cur[ids], :]) ** 2
        lM = np.sqrt(sq[ids])
        nxt = np.argmin(lM, axis=1)
        for row, i in enumerate(ids):
            if int(nxt[row]) in visited[i]:
                active[i] = False
            else:
                cur[i] = int(nxt[row])

    lMs = {i: np.sqrt(sq[i]) for i in range(nq)}

    # expansion: all anchors within alpha of the (k+1)-smallest profile
    todo_per_q = []
    for i in range(nq):
        lm = lMs[i]
        radius = np.sort(lm)[min(k, mp - 1)] * alpha
        cand = np.nonzero(lm < radius)[0]
        todo_per_q.append(
            cand[~np.isin(cand, visited[i], assume_unique=True)]
        )
    flat = np.array(
        [[i, j] for i in range(nq) for j in todo_per_q[i]], dtype=np.int64
    ).reshape(-1, 2)
    if flat.shape[0]:
        dflat = np.asarray(geq(f, Q, P, flat), dtype=np.float64)
        nevals += flat.shape[0]
    else:
        dflat = np.zeros(0)
    offs = np.cumsum([0] + [len(t) for t in todo_per_q])

    As, Ds = {}, {}
    for i in range(nq):
        a = np.concatenate([visited[i], todo_per_q[i]]).astype(int)
        d = np.concatenate([dvis[i], dflat[offs[i] : offs[i + 1]]])
        order = np.argsort(d, kind="stable")
        As[i], Ds[i] = a[order], d[order]
    return As, Ds, lMs, nevals


def legacy_query_(ann, Z, get_exact_query_ijs=None, k=5, alpha=1.4, beta=1.4):
    """Legacy anchor-profile query (reference
    query_functions.py:218-259): rank database points by how well
    their anchor-distance profile matches the query's measured anchor
    distances, then exactly evaluate the beta-expanded head.

    Returns (indices (nz, k), distances (nz, k))."""
    if get_exact_query_ijs is not None:
        ann.get_exact_query_ijs = get_exact_query_ijs
    geq = ann._get_exact_query_ijs_for(ann.f)

    XA = _anchor_objects(ann.X, ann.A)
    DP = ann.D[np.asarray(ann.A, dtype=int)]  # (na, na)
    As, Ds, lMs, nevals = query_dm(
        Z, XA, DP, ann.f, geq, k=k, alpha=alpha, init=0
    )

    nz = len(Z)
    nx = ann.nx

    # pad the ragged per-query profiles (visited anchors + distances)
    # to a rectangle so the profile match vectorises across queries
    lens = np.array([len(As[i]) for i in range(nz)], dtype=np.int64)
    L = int(lens.max())
    rows = np.repeat(np.arange(nz, dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(rows.shape[0]) - starts[rows]
    A_pad = np.zeros((nz, L), dtype=np.int64)
    D_pad = np.zeros((nz, L))
    A_pad[rows, pos] = np.concatenate([As[i] for i in range(nz)])
    D_pad[rows, pos] = np.concatenate([Ds[i] for i in range(nz)])
    pmask = np.arange(L)[None, :] < lens[:, None]

    # chunked profile match: one (nx, chunk, L) gather per chunk keeps
    # the temp ~128 MB however many queries arrive at once
    qblk = max(1, (1 << 24) // max(nx * L, 1))
    head_q_parts, head_db_parts = [], []
    for s in range(0, nz, qblk):
        e = min(s + qblk, nz)
        cols = ann.D[:, A_pad[s:e].reshape(-1)].reshape(nx, e - s, L)
        diff = (cols - D_pad[None, s:e]) * pmask[None, s:e]
        DD = np.sqrt(np.einsum("xql,xql->xq", diff, diff))
        isort = np.argsort(DD, axis=0, kind="stable")  # (nx, q)
        dds = np.take_along_axis(DD, isort, axis=0)
        # beta-expanded head: every db point within ratio beta of the
        # (k+1)-smallest profile distance (same cut as the per-query
        # searchsorted on the sorted ratio)
        selq = dds < beta * dds[k][None, :]
        # degenerate profiles: >= k+1 db points match the query's
        # anchor profile exactly (dds[k] == 0), so the ratio cut
        # selects nothing — keep the zero-distance matches (a prefix
        # of the sort) instead of silently emitting an all-zero row
        zerok = dds[k] == 0
        if zerok.any():
            selq |= (dds == 0) & zerok[None, :]
        cut = selq.sum(axis=0)
        qq, rank = np.nonzero(
            np.arange(nx)[None, :] < cut[:, None]
        )
        head_db_parts.append(isort[rank, qq].astype(np.int64))
        head_q_parts.append((qq + s).astype(np.int64))
    head_q = np.concatenate(head_q_parts)
    head_db = np.concatenate(head_db_parts)

    # one exact batch for every query's head (the reference evaluates
    # per query; batching is where the wall-clock goes from minutes to
    # seconds at nq ~ 10^3)
    IJ = np.stack([head_db, head_q], axis=1)
    nd = np.asarray(geq(ann.f, ann.X, Z, IJ), dtype=np.float64)

    # per-query top-k of the evaluated heads, no per-query loop
    order = np.lexsort((nd, head_q))
    hq_s = head_q[order]
    qstarts = np.searchsorted(hq_s, np.arange(nz))
    rank = np.arange(hq_s.shape[0]) - qstarts[hq_s]
    sel = rank < k
    out_i = np.zeros((nz, k), dtype=np.int64)
    out_d = np.zeros((nz, k))
    out_i[hq_s[sel], rank[sel]] = head_db[order][sel]
    out_d[hq_s[sel], rank[sel]] = nd[order][sel]
    return out_i, out_d


def query_(ann, Q, nn=15, p_work=0.3, get_exact_query_ijs=None,
           loc_thresh=None, locality=None, seed_frac=0.5,
           expand_rounds=3):
    """Full query pipeline (reference query_functions.py:183-212).

    Returns (ngi, ngd): the nn nearest database indices/distances per
    query row.

    loc_thresh/locality override the fitted filter knobs for the
    QUERY-side candidate generation only (extension beyond the
    reference): a budget-capped scale fit tuned selective for build
    speed can widen its query candidate coverage without refitting —
    the eval budget is still p_work, wider candidates only give the
    ranking more to choose from.
    """
    if get_exact_query_ijs is not None:
        ann.get_exact_query_ijs = get_exact_query_ijs
    geq = ann._get_exact_query_ijs_for(ann.f)

    # scout/certify hybrid (see Annchor.get_ann): exploration through
    # the cheap engine, exact certification of the reported rows
    scouting = getattr(ann, "_scouting", False) and get_exact_query_ijs is None
    if scouting:
        scout_eng = ann.metric.scout

        def eval_geq(f, Xa, Z, IJ):
            return scout_eng(Xa, Z, np.asarray(IJ))

    else:
        eval_geq = geq

    # anchor columns use the same engine as the fit: the fitted D and
    # regression carry the scout's bias, and consistent features beat
    # absolutely-accurate-but-inconsistent ones (measured: exact query
    # anchors against a scout-fitted index LOWER recall)
    QD = get_query_anchor_dists(ann, Q, eval_geq)
    check = query_candidates(
        ann.S, QD,
        ann.locality if locality is None else locality,
        ann.loc_thresh if loc_thresh is None else loc_thresh,
    )
    IJs, P_idx, P_cnt, Qfeatures, Qncm = get_query_features(
        ann, Q, QD, check
    )

    Qpred = ann.regression.predict(Qfeatures, ann.feature_names)
    if ann.is_metric:
        ilb = ann.feature_names.index("lower bound")
        iub = ann.feature_names.index("upper bound")
        Qpred = np.clip(Qpred, Qfeatures[:, ilb], Qfeatures[:, iub])
    Qerrors = ann.error_predictor.predict(Qfeatures, ann.feature_names)
    QRA = Qpred.copy()

    IJ_all, RA_all, ncm_all = select_refine_candidate_query_pairs(
        ann, IJs, Q, P_idx, P_cnt, QRA, Qncm, Qerrors, p_work, nn,
        eval_geq, seed_frac=seed_frac, expand_rounds=expand_rounds,
    )
    if IJ_all.shape[0] != IJs.shape[0]:
        # graph expansion found pairs outside the locality candidates
        P_idx, _ = pair_ops.build_point_index_single(IJ_all[:, 1], len(Q))

    # reference quirk: the query graph carries nn+1 columns
    # (reference query_functions.py:210 calls get_nn with nn+1)
    nout = nn + 1
    nsel = nout + (ann.certify_pad if scouting else 0)
    ngi, ngd, _ = pair_ops.knn_from_pairs(RA_all, IJ_all, P_idx, ncm_all, nsel)
    if scouting:
        nq = len(Q)
        rows = np.repeat(np.arange(nq, dtype=np.int64), nsel)
        dbs = ngi.reshape(-1)
        valid = dbs >= 0
        IJq = np.stack([dbs[valid], rows[valid]], axis=1)
        exact = np.asarray(geq(ann.f, ann.X, Q, IJq), dtype=np.float64)
        dists = np.full(nq * nsel, np.inf)
        dists[valid] = exact
        dists = dists.reshape(nq, nsel)
        order = np.argsort(dists, axis=1, kind="stable")[:, :nout]
        ngi = np.take_along_axis(ngi, order, axis=1)
        ngd = np.take_along_axis(dists, order, axis=1)
    else:
        ngi, ngd = ngi[:, :nout], ngd[:, :nout]
    return ngi, ngd
