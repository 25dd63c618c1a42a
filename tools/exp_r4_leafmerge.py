"""r4: size the prize for merging adjacent collapsed leaves in the
device build (VERDICT r3 #5 — device tree within 5% of host SAH).

Device-collapse leaves partition the morton-sorted prim range, so
consecutive leaves are always range-adjacent; the packet kernel tests
all max_leaf slots of a drained row regardless of fill, so merging
leaves of the SAME wide parent up to max_leaf strictly removes rows
(and removes drains wherever a packet visited both halves).

This probe runs the topology on CPU at 1M tris and reports current
occupancy + post-greedy-merge occupancy/rows, split by merge policy:
  same-wide-parent (tree-shape preserving)  vs  unrestricted (upper
bound — what re-chunking the morton order could reach).

Run: python tools/exp_r4_leafmerge.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAXL = 9


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nanort_tpu.build.lbvh import MAX_DEPTH, _karras_topology, morton_codes
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene

    n_target = int(os.environ.get("LM_TRIS", 1_000_000))
    v, f = make_subdivided_sphere_scene(n_target)
    n = len(f)
    print(json.dumps({"tris": n}), flush=True)

    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    centers = 0.5 * (lo + hi)
    codes = np.asarray(morton_codes(jnp.asarray(centers),
                                    jnp.asarray(lo.min(0)),
                                    jnp.asarray(hi.max(0))))
    order = np.argsort(codes, kind="stable")
    first, last, split = (np.asarray(x) for x in _karras_topology(
        jnp.asarray(codes[order]), n))

    ni = n - 1
    iar = np.arange(ni)
    size = last - first + 1
    l_size = split - first + 1
    r_size = last - split
    keep = size > MAXL
    l_leaf = keep & (l_size <= MAXL)
    r_leaf = keep & (r_size <= MAXL)
    l_child, r_child = split, split + 1

    # parent links over kept tree + depth (pointer doubling)
    par = np.zeros(ni, np.int64)
    okl = keep & ~(l_size <= MAXL)
    okr = keep & ~(r_size <= MAXL)
    par[l_child[okl]] = iar[okl]
    par[r_child[okr]] = iar[okr]
    depth = np.where(iar == 0, 0, 1).astype(np.int64)
    jmp = par.copy()
    for _ in range(int(MAX_DEPTH).bit_length()):
        depth = depth + depth[jmp]
        jmp = jmp[jmp]

    K = 4  # width 16
    rem = depth % K
    anc = iar.copy()
    for j in range(K - 1):
        anc = np.where(j < rem, par[anc], anc)

    # leaf list in morton order
    la = np.concatenate([first[l_leaf], (split + 1)[r_leaf]])
    lc = np.concatenate([l_size[l_leaf], r_size[r_leaf]])
    lw = np.concatenate([anc[l_leaf], anc[r_leaf]])  # wide parent (binary id)
    o = np.argsort(la, kind="stable")
    la, lc, lw = la[o], lc[o], lw[o]
    assert (la[1:] == la[:-1] + lc[:-1]).all(), "leaves must tile [0, n)"
    rows0 = len(la)
    print(json.dumps({
        "rows": rows0, "occupancy": round(n / rows0, 3),
        "size_hist": np.bincount(lc, minlength=10).tolist(),
    }), flush=True)

    def greedy(counts, groups, cap=MAXL):
        """Sequential greedy merge of adjacent leaves within a group."""
        out = []
        cur, curg = 0, None
        for c, g in zip(counts, groups):
            if curg is not None and g == curg and cur + c <= cap:
                cur += c
            else:
                if curg is not None:
                    out.append(cur)
                cur, curg = c, g
        out.append(cur)
        return np.asarray(out)

    m_same = greedy(lc, lw)
    m_free = greedy(lc, np.zeros_like(lw))
    for name, m in (("same_wide_parent", m_same), ("unrestricted", m_free)):
        print(json.dumps({
            "policy": name, "rows": len(m),
            "occupancy": round(n / len(m), 3),
            "rows_saved_pct": round(100 * (1 - len(m) / rows0), 1),
        }), flush=True)

    # how many merge ROUNDS does pairwise contraction need to match
    # sequential greedy? (device impl does R odd-even rounds)
    cnt = lc.copy()
    grp = lw.copy()
    alive = np.ones(rows0, bool)
    for r in range(6):
        idx = np.flatnonzero(alive)
        c, g = cnt[idx], grp[idx]
        ok = (g[:-1] == g[1:]) & (c[:-1] + c[1:] <= MAXL)
        # run parity: merge i with i+1 when i is at even offset in its run
        start = np.ones(len(ok), bool)
        start[1:] = ~ok[:-1]
        run_id = np.cumsum(start) - 1
        run_first = np.flatnonzero(start)
        offs = np.arange(len(ok)) - run_first[run_id]
        do = ok & (offs % 2 == 0)
        cnt[idx[:-1][do]] += c[1:][do]
        alive[idx[1:][do]] = False
        print(json.dumps({"round": r, "rows": int(alive.sum())}),
              flush=True)


if __name__ == "__main__":
    main()
