"""Supertile-table kernel == pure-JAX oracle (interpret mode).

Colors are quantized to multiples of 1/64 and sizes to small ints so both
sides' f32 aggregations are exact (dot-product vs scatter-add order cannot
flip a merge test), making label equality exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_segment_tpu.ops import tile_table as tt


def _mk_case(rng, n=3, sr=4, k=6, frac_blocked=0.05):
    s = sr * tt.L
    labr = np.tile((np.arange(s, dtype=np.int32) // tt.L)[None], (n, 1))
    labc = np.tile((np.arange(s, dtype=np.int32) % tt.L)[None], (n, 1))
    size = rng.integers(1, 5, (n, s)).astype(np.float32)
    cols = rng.integers(0, 65, (3, n, s)).astype(np.float32) / 64.0
    c = [cols[i] * size for i in range(3)]
    fin = np.where(rng.random((n, s)) < 0.2,
                   rng.integers(0, 256, (n, s)),
                   tt.NUM_BUCKETS).astype(np.int32)
    blocked = (rng.random((n, s)) < frac_blocked).astype(np.int32)
    # Random intra-supertile edges: packed bucket << 12 | partner.
    ptn = rng.integers(0, s, (n, k, s)).astype(np.int32)
    bkt = rng.integers(0, 300, (n, k, s)).astype(np.int32)
    absent = rng.random((n, k, s)) < 0.3
    edges = np.where(absent, tt._I32MAX, (bkt << tt._PBITS) | ptn)
    return (labr, labc, size, c[0], c[1], c[2], fin, blocked,
            edges.astype(np.int32))


def _run_oracle(case, theta, rounds, mthr):
    labr, labc, size, c0, c1, c2, fin, blocked, edges = case
    lab = (labr * tt.L + labc).astype(np.int32)
    fn = jax.vmap(lambda la, sz, a0, a1, a2, fi, bl, ed:
                  tt.blocked_rounds_reference(
                      la, sz, a0, a1, a2, fi, bl, ed, theta,
                      rounds=rounds, merge_threshold=mthr,
                      force_merge_weight=0.001, metric="l2"))
    return np.asarray(fn(jnp.asarray(lab), jnp.asarray(size),
                         jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2),
                         jnp.asarray(fin), jnp.asarray(blocked) > 0,
                         jnp.asarray(edges)))


def _run_kernel(case, theta, rounds, mthr):
    labr, labc, size, c0, c1, c2, fin, blocked, edges = case
    n, s = size.shape
    sr = s // tt.L
    resh = lambda x: jnp.asarray(x).reshape(n, sr, tt.L)
    outr, outc = tt.tile_table_rounds(
        resh(labr), resh(labc), resh(size), resh(c0), resh(c1), resh(c2),
        resh(fin), resh(blocked),
        jnp.asarray(edges).reshape(n, -1, sr, tt.L),
        theta=theta, rounds=rounds, merge_threshold=mthr,
        force_merge_weight=0.001, metric="l2", interpret=True)
    return np.asarray(outr).reshape(n, s) * tt.L \
        + 0 * np.asarray(outc).reshape(n, s), \
        np.asarray(outr).reshape(n, s) * tt.L + np.asarray(
            outc).reshape(n, s)


@pytest.mark.parametrize("theta,mthr", [(64, 0.08), (256, 0.15), (16, 0.05)])
def test_kernel_matches_oracle(theta, mthr):
    rng = np.random.default_rng(7)
    case = _mk_case(rng)
    want = _run_oracle(case, theta, 5, mthr)
    _, got = _run_kernel(case, theta, 5, mthr)
    np.testing.assert_array_equal(got, want)


def test_kernel_matches_oracle_heavy_merging():
    rng = np.random.default_rng(11)
    case = _mk_case(rng, n=2, sr=4, k=8, frac_blocked=0.0)
    # All-identical colors: every edge passes the test; exercises hooking /
    # pointer-jump chains and idle termination.
    case = list(case)
    for i in (3, 4, 5):
        case[i] = np.zeros_like(case[i])
    case[6] = np.full_like(case[6], tt.NUM_BUCKETS)
    want = _run_oracle(tuple(case), 2047, 8, 0.05)
    _, got = _run_kernel(tuple(case), 2047, 8, 0.05)
    np.testing.assert_array_equal(got, want)


def test_st_kernel_matches_masked_rounds():
    """Full solve: Pallas supertile path == masked global rounds.

    Quantized colors (multiples of 1/64) make both paths' f32 statistics
    exact, so the gated levels' different aggregation order (one-hot dots
    vs incremental segment sums) cannot flip a merge test and the final
    labels are identical."""
    from video_segment_tpu.core import oversegmentation as ov

    rng = np.random.default_rng(5)
    t, h, w = 3, 32, 256
    # Flat quantized patches: neighbor contrasts are multiples of 1/32,
    # mixing sub-threshold (merge) and supra-threshold (fail) edges.
    base = (rng.integers(0, 33, (t, h // 8, w // 16, 3))
            .astype(np.float32) / 32.0)
    vol = np.repeat(np.repeat(base, 8, 1), 16, 2)
    volj = jnp.asarray(vol)
    n_pix = t * h * w
    common = dict(table_slots=n_pix, st_levels=3, st_h=16, st_w=128,
                  st_slots=2048, min_region_size=0)
    p_mask = ov.OversegParams(st_kernel=False, **common)
    p_kern = ov.OversegParams(st_kernel=True, **common)
    res_m = ov.oversegment(volj, params=p_mask)
    res_k = ov.oversegment(volj, params=p_kern)
    lab_m = np.asarray(res_m.label)
    lab_k = np.asarray(res_k.label)
    assert len(np.unique(lab_m)) < n_pix // 4  # merging actually happened
    np.testing.assert_array_equal(lab_k, lab_m)


def test_blocked_layout_roundtrip():
    rng = np.random.default_rng(3)
    nseg, n_sup, s_cap = 1000, 7, 192
    sup = rng.integers(0, n_sup, nseg).astype(np.int32)
    sup[-1] = n_sup  # sink slot: never blocked into a supertile
    g2b, b2g = tt.blocked_layout(jnp.asarray(sup), n_sup, s_cap)
    g2b, b2g = np.asarray(g2b), np.asarray(b2g)
    placed = np.nonzero(g2b >= 0)[0]
    # Roundtrip + supertile consistency + order preservation.
    assert (b2g[g2b[placed]] == placed).all()
    assert (g2b[placed] // s_cap == sup[placed]).all()
    for su in range(n_sup):
        mem = placed[sup[placed] == su]
        assert (np.sort(g2b[mem]) == g2b[mem]).all()
        assert (np.sort(mem) == mem).all()
    # Unplaced positions read the sink slot.
    empty = np.setdiff1d(np.arange(n_sup * s_cap), g2b[placed])
    assert (b2g[empty] == nseg - 1).all()
    # Overflow only when a supertile exceeds cap.
    cnt = np.bincount(sup[:-1], minlength=n_sup)
    lost = (g2b[:-1] < 0).sum()
    assert lost == np.maximum(cnt - s_cap, 0).sum()
