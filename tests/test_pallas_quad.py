"""4-wide Mosaic kernel ≡ brute force (interpreted on CPU).

Mirrors tests/test_pallas_wide.py for kernels/pallas_quad.py: exact
nearest-hit equality (SURVEY §4.3), any-hit parity, layout invariants,
the stack-depth hard guarantee, and end-to-end render parity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig
from dpt_tpu.accel.bvh import build_bvh_median, build_bvh_sah
from dpt_tpu.kernels.pallas_quad import pack_quad, quad_nearest, quad_occluded
from dpt_tpu.render.intersect import brute_force_nearest, brute_force_occluded
from dpt_tpu.scene.builder import procedural_scene

CFG = RenderConfig(packet_tile=1024, bvh_leaf_size=4, interleave=2)


def _rays(n=64, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)) * spread
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _pack(scene, builder="median", leaf_size=4):
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    if builder == "median":
        bvh = build_bvh_median(v, idx, leaf_size=leaf_size, use_native=False)
    else:
        bvh = build_bvh_sah(v, idx, leaf_size=leaf_size)
    v0 = v[idx[:, 0]]
    v1 = v[idx[:, 1]]
    v2 = v[idx[:, 2]]
    return pack_quad(bvh, v0, v1, v2)


def test_layout_invariants(box_scene):
    acc = _pack(box_scene)
    assert acc.nodes.shape[1] == 128
    assert acc.tris.shape[1] == 128
    trows = np.asarray(acc.tris).reshape(-1, 8, 16)
    assert int((trows[:, :, 10] > 0.5).sum()) == box_scene.n_triangles
    ids = trows[:, :, 9][trows[:, :, 10] > 0.5].astype(np.int64)
    assert sorted(ids.tolist()) == list(range(box_scene.n_triangles))
    # Every child pointer of every record is in range; empty slots carry
    # inverted boxes.
    recs = np.asarray(acc.nodes).reshape(-1, 32)
    for rec in recs:
        for s in range(4):
            if np.isnan(rec[6 * s]):  # empty slot: all-NaN box
                assert np.isnan(rec[6 * s:6 * s + 6]).all()
            else:
                p = rec[24 + s]
                if p >= 0:
                    assert p < acc.n_wide
                else:
                    assert -(p + 1) < acc.tris.shape[0]


@pytest.mark.parametrize("builder", ["median", "sah"])
def test_nearest_matches_brute(box_scene, builder):
    acc = _pack(box_scene, builder)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    qh, qt, qi = quad_nearest(o, d, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(qh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, qt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("leaf_size", [1, 8])
def test_nearest_procedural(leaf_size):
    scene = procedural_scene(n_tris_target=2_000)
    acc = _pack(scene, "sah", leaf_size=leaf_size)
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(512, seed=5, spread=1.5)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    qh, qt, qi = quad_nearest(o, d, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(qh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, qt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("builder,leaf_size", [
    ("median", 1), ("median", 4), ("sah", 8)
])
def test_vectorized_pack_matches_loop_pack(builder, leaf_size):
    """pack_quad (vectorized, level-order ids) ≡ pack_quad_loop (per-record
    spec, DFS ids): identical leaf table, identical record multiset up to
    the id permutation, identical quad depth, and — the property that
    matters — bit-identical traversal results (VERDICT r3 next #5)."""
    from dpt_tpu.kernels.pallas_quad import pack_quad_loop

    scene = procedural_scene(n_tris_target=3_000)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    if builder == "median":
        bvh = build_bvh_median(v, idx, leaf_size=leaf_size, use_native=False)
    else:
        bvh = build_bvh_sah(v, idx, leaf_size=leaf_size)
    v0, v1, v2 = v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]
    fast = pack_quad(bvh, v0, v1, v2)
    slow = pack_quad_loop(bvh, v0, v1, v2)

    assert fast.n_wide == slow.n_wide
    assert fast.max_depth == slow.max_depth
    np.testing.assert_array_equal(np.asarray(fast.tris), np.asarray(slow.tris))

    o, d = _rays(1024, seed=11, spread=1.5)
    fh, ft, fi = quad_nearest(o, d, fast, CFG)
    sh, st, si = quad_nearest(o, d, slow, CFG)
    np.testing.assert_array_equal(np.asarray(fh), np.asarray(sh))
    np.testing.assert_array_equal(np.asarray(ft), np.asarray(st))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
    md = jnp.full((o.shape[0],), 1.0, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(quad_occluded(o, d, md, fast, CFG)),
        np.asarray(quad_occluded(o, d, md, slow, CFG)),
    )


def test_occluded_matches_brute(box_scene):
    acc = _pack(box_scene)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256, seed=1)
    md = jnp.full((o.shape[0],), 2.5, jnp.float32)
    bo = brute_force_occluded(o, d, md, v0, v1, v2)
    qo = quad_occluded(o, d, md, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bo), np.asarray(qo))
    qo0 = quad_occluded(o, d, jnp.full_like(md, -1.0), acc, CFG)
    assert not bool(jnp.any(qo0))


def test_nearest_knot_scene():
    """Second mesh family (self-shadowing torus knot): quad kernel ≡ brute
    on a geometry whose BVH nodes overlap heavily along tube crossings."""
    from dpt_tpu.scene.builder import knot_scene

    scene = knot_scene(n_tris_target=2_000)
    acc = _pack(scene, "sah", leaf_size=8)
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(512, seed=13, spread=2.0)
    bh, bt, _, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    qh, qt, _ = quad_nearest(o, d, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(qh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, qt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_single_leaf_tree():
    """Degenerate scene small enough for one leaf (root is a leaf)."""
    scene = procedural_scene(n_tris_target=8)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    bvh = build_bvh_median(v, idx, leaf_size=8, use_native=False)
    acc = pack_quad(bvh, v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]])
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(128, seed=3, spread=1.5)
    bh, bt, _, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    qh, qt, _ = quad_nearest(o, d, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(qh))


def test_vmem_fallback_matches_smem(monkeypatch):
    """Node tables over the SMEM budget fall back to the VMEM row layout;
    both layouts must return identical hits.  (Test scenes always fit SMEM,
    so the fallback is forced by shrinking the budget to zero; a distinct
    ray count keeps the jit cache from serving the SMEM-trace.)"""
    import dpt_tpu.kernels.pallas_quad as pq

    scene = procedural_scene(n_tris_target=2_000)
    acc = _pack(scene, "sah", leaf_size=8)
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(384 + 1, seed=9, spread=1.5)
    qh0, qt0, _ = quad_nearest(o, d, acc, CFG)
    monkeypatch.setattr(pq, "_SMEM_NODE_BUDGET_BYTES", 0)
    o2, d2 = _rays(384 + 2, seed=9, spread=1.5)
    qh1, qt1, _ = quad_nearest(o2, d2, acc, CFG)
    bh, bt, _, _, _ = brute_force_nearest(o2, d2, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(qh1))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, qt1, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_stack_guard(box_scene):
    acc = _pack(box_scene)
    bad = CFG.replace(bvh_stack_depth=1)
    o, d = _rays(8)
    with pytest.raises(ValueError, match="stack_depth"):
        quad_nearest(o, d, acc, bad)


def test_end_to_end_render(box_scene, default_camera):
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_sample

    cfg_b = RenderConfig(width=32, height=32, max_depth=2, spp=1,
                         traversal="brute", enable_sss=True)
    cfg_q = cfg_b.replace(traversal="quad", bvh_builder="median",
                          bvh_leaf_size=4, ray_sort=True)
    accel = build_accel(box_scene, cfg_q)
    img_b = render_sample(box_scene, default_camera, cfg_b, jnp.uint32(0))
    img_q = render_sample(box_scene, default_camera, cfg_q, jnp.uint32(0),
                          accel)
    np.testing.assert_allclose(
        np.asarray(img_b), np.asarray(img_q), rtol=1e-4, atol=1e-5
    )


def test_refit_identity():
    """refit_quad with unchanged vertices must reproduce the packed accel
    bit-for-bit: min/max are order-independent, the builder's node boxes
    are exact unions of their triangle points, and leaf rows regather the
    same v0/e1/e2."""
    from dpt_tpu.kernels.pallas_quad import refit_quad

    scene = procedural_scene(n_tris_target=900)
    acc = _pack(scene, builder="sah", leaf_size=8)
    ref = refit_quad(acc, scene.vertices, scene.indices)
    np.testing.assert_array_equal(np.asarray(acc.tris), np.asarray(ref.tris))
    np.testing.assert_array_equal(np.asarray(acc.nodes), np.asarray(ref.nodes))
    np.testing.assert_array_equal(
        np.asarray(acc.nodes_flat), np.asarray(ref.nodes_flat)
    )


@pytest.mark.parametrize("scale", [0.02, 0.3])
def test_refit_moved_vertices_matches_brute(scale):
    """The vertex-SGD consistency guarantee (VERDICT r4 missing #2): after
    perturbing vertices, the REFIT accel's nearest hits must equal brute
    force on the moved geometry — i.e. hit selection tracks the moved
    vertices, with descent order allowed to go stale (boxes stay exact
    unions, so no hit can be missed)."""
    from dpt_tpu.kernels.pallas_quad import refit_quad

    scene = procedural_scene(n_tris_target=700)
    acc = _pack(scene, builder="sah", leaf_size=8)
    rng = np.random.default_rng(11)
    v = np.asarray(scene.vertices)
    v_new = jnp.asarray(
        v + (rng.normal(size=v.shape) * scale).astype(np.float32)
    )
    ref = refit_quad(acc, v_new, scene.indices)

    o, d = _rays(n=96, seed=3)
    hit_q, t_q, tri_q = quad_nearest(o, d, ref, CFG)
    idx = np.asarray(scene.indices)
    vn = np.asarray(v_new)
    hit_b, t_b, tri_b, _, _ = brute_force_nearest(
        o, d, jnp.asarray(vn[idx[:, 0]]), jnp.asarray(vn[idx[:, 1]]),
        jnp.asarray(vn[idx[:, 2]]), 1e-6,
    )
    np.testing.assert_array_equal(np.asarray(hit_q), np.asarray(hit_b))
    np.testing.assert_array_equal(np.asarray(tri_q), np.asarray(tri_b))
    np.testing.assert_allclose(
        np.asarray(t_q)[np.asarray(hit_b)], np.asarray(t_b)[np.asarray(hit_b)],
        rtol=1e-6,
    )


def test_refit_vertex_descent_consistent():
    """A 3-step vertex descent: refitting inside the loop keeps the quad
    accel's hits equal to a freshly host-built+packed accel's oracle
    (brute force) at every step — the dryrun's SGD walk no longer runs
    against stale baked geometry."""
    from dpt_tpu.kernels.pallas_quad import refit_quad

    scene = procedural_scene(n_tris_target=500)
    acc = _pack(scene, builder="sah", leaf_size=8)
    rng = np.random.default_rng(5)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    o, d = _rays(n=64, seed=9)
    for step in range(3):
        v = v + (rng.normal(size=v.shape) * 0.05).astype(np.float32)
        ref = refit_quad(acc, jnp.asarray(v), scene.indices)
        hit_q, t_q, tri_q = quad_nearest(o, d, ref, CFG)
        hit_b, _, tri_b, _, _ = brute_force_nearest(
            o, d, jnp.asarray(v[idx[:, 0]]), jnp.asarray(v[idx[:, 1]]),
            jnp.asarray(v[idx[:, 2]]), 1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(hit_q), np.asarray(hit_b), err_msg=f"step {step}"
        )
        np.testing.assert_array_equal(
            np.asarray(tri_q), np.asarray(tri_b), err_msg=f"step {step}"
        )


def test_streamed_tris_matches_resident(monkeypatch):
    """Leaf-row tables over the VMEM budget stream rows from HBM via DMA
    (stream_tris mode — the only way 260k/1M-tri scenes fit a 16 MB-VMEM
    chip); hits must equal the resident-table walk and brute force.  Forced
    by shrinking the budget to zero; distinct ray counts dodge the jit
    cache."""
    import dpt_tpu.kernels.pallas_quad as pq

    scene = procedural_scene(n_tris_target=2_000)
    acc = _pack(scene, "sah", leaf_size=8)
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(384 + 3, seed=9, spread=1.5)
    qh0, qt0, qi0 = quad_nearest(o, d, acc, CFG)
    monkeypatch.setattr(pq, "_VMEM_TRIS_BUDGET_BYTES", 0)
    o2, d2 = _rays(384 + 4, seed=9, spread=1.5)
    qh1, qt1, qi1 = quad_nearest(o2, d2, acc, CFG)
    bh, bt, bi, _, _ = brute_force_nearest(o2, d2, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(qh1))
    np.testing.assert_array_equal(
        np.asarray(jnp.where(bh, bi, 0)), np.asarray(qi1)
    )
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, qt1, 0.0)),
        rtol=1e-5, atol=1e-6,
    )
    # Any-hit in streamed mode too.
    md = jnp.full((o2.shape[0],), 2.5, jnp.float32)
    occ_s = quad_occluded(o2, d2, md, acc, CFG)
    occ_b = brute_force_occluded(o2, d2, md, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_s))
