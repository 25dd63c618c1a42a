"""Device-side DFS-preorder renumbering of collapsed wide tables
(build/device_collapse.preorder_device). Pure relabeling: node rows
land in DFS-preorder positions (a pop's child fetch address becomes
usually adjacent, like the host collapse's emission order —
nanort.h:1245-1430's recursive emission has the same property), leaf
rows in first-touch order, and per-slot payloads travel with their
rows bit-exactly.
"""
import numpy as np
import pytest

from nanort_tpu.build.device_collapse import (
    collapse_lbvh_device,
    preorder_device,
)
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_uv_sphere,
    merge_meshes,
)

pytestmark = pytest.mark.quick


def _dfs_walk(nodes, leafs):
    """Host DFS (slot 0 first) over a width-16 table; returns the node
    visit order, leaf first-touch order, and per-visit (box, meta-kind,
    leaf payload) signatures for equality checks."""
    NW = nodes.shape[0]
    valid = nodes[:, 0:96:6] <= nodes[:, 3:96:6]
    metas = nodes[:, 96:112].astype(np.int64)
    order, leaf_order, sig = [], [], []
    seen_leaf = set()
    stack = [0]
    while stack:
        i = stack.pop()
        order.append(i)
        kids = []
        for s in range(16):
            if not valid[i, s]:
                continue
            m = int(metas[i, s])
            box = nodes[i, 6 * s:6 * s + 6].tobytes()
            cnt = nodes[i, 112 + s]
            if m >= 0:
                kids.append(m)
                sig.append(("int", box, float(cnt)))
            else:
                row = -m - 1
                sig.append(("leaf", box, float(cnt),
                            leafs[row].tobytes()))
                if row not in seen_leaf:
                    seen_leaf.add(row)
                    leaf_order.append(row)
        stack.extend(reversed(kids))
    return order, leaf_order, sig


@pytest.fixture(scope="module")
def scene():
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(24, 48, 0.5))
    return collapse_lbvh_device(v, f, width=16, max_leaf=9)


def test_preorder_positions_are_dfs_order(scene):
    s2 = preorder_device(scene)
    nodes = np.asarray(s2.nodes)
    leafs = np.asarray(s2.leafs)
    order, leaf_order, _ = _dfs_walk(nodes, leafs)
    # DFS from the (renumbered) root must visit rows 0, 1, 2, ...
    assert order == list(range(len(order)))
    assert len(order) == scene.num_nodes
    # leaf rows in first-touch order too
    assert leaf_order == list(range(len(leaf_order)))
    assert len(leaf_order) == scene.num_leaf_rows


def test_preorder_is_pure_relabeling(scene):
    s2 = preorder_device(scene)
    _, _, sig_before = _dfs_walk(np.asarray(scene.nodes),
                                 np.asarray(scene.leafs))
    _, _, sig_after = _dfs_walk(np.asarray(s2.nodes),
                                np.asarray(s2.leafs))
    # same DFS visit sequence of (box, kind, count, leaf bytes):
    # traversal is bit-identical by induction over the walk
    assert sig_before == sig_after
    assert s2.num_nodes == scene.num_nodes
    assert s2.depth == scene.depth


def test_preorder_keeps_pad_rows_empty(scene):
    s2 = preorder_device(scene)
    nodes = np.asarray(s2.nodes)
    for i in range(scene.num_nodes, nodes.shape[0]):
        assert (nodes[i, 0:96:6] > nodes[i, 3:96:6]).all() or (
            nodes[i] == 0).all()


def test_preorder_woop_rows_travel_with_leafs():
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(10, 20, 0.5))
    s = collapse_lbvh_device(v, f, width=16, max_leaf=9, woop=True)
    s2 = preorder_device(s)
    # leaf row k's woop row must be the same pairing before and after
    lf0 = {np.asarray(s.leafs)[i].tobytes():
           np.asarray(s.leafs_woop)[i].tobytes()
           for i in range(s.num_leaf_rows)}
    for i in range(s2.num_leaf_rows):
        key = np.asarray(s2.leafs)[i].tobytes()
        assert lf0[key] == np.asarray(s2.leafs_woop)[i].tobytes()
