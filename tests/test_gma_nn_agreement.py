"""Quantify the GMA approximate-NN redesign against the reference algorithm.

The reference assigns each only-2D voxel a nearby 3D voxel via
FPS(fps_num) representatives + exact rep->key NN + ball-query group
broadcast (sparse_multimodal_encoder_painting.py:276-323). Our TPU-native
`approx_nn_3d` replaces FPS+ball_query with strided-subsample
representatives + nearest-representative assignment. This test measures,
at the four GMA stage scales, (a) assignment coverage relative to the
oracle and (b) the distance quality of the assigned keys — the silent-mAP
risk called out in round 1.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from msmdfusion_tpu.models.middle_encoders.gma_encoder import approx_nn_3d


def fps_numpy(pts, n):
    """Furthest point sampling (reference furthest_point_sample kernel)."""
    sel = np.zeros(n, np.int64)
    dist = np.full(len(pts), np.inf)
    cur = 0
    for i in range(n):
        sel[i] = cur
        d = np.sum((pts - pts[cur]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
    return sel


def fps_nn_oracle(query, key, fps_num, radius, max_cluster_samples,
                  dist_thresh):
    """Numpy re-implementation of the reference fps_NN_fast (single batch).

    query/key: [N, 3] float voxel coords. Returns [N] int64 (-1 missing).
    """
    nq = len(query)
    out = np.full(nq, -1, np.int64)
    if nq == 0 or len(key) == 0:
        return out
    if nq <= fps_num:
        d = np.linalg.norm(query[:, None] - key[None], axis=-1)
        nn = d.argmin(1)
        val = d.min(1)
        ok = val < dist_thresh
        out[ok] = nn[ok]
        return out
    rep_idx = fps_numpy(query, fps_num)
    reps = query[rep_idx]
    d_rk = np.linalg.norm(reps[:, None] - key[None], axis=-1)
    nn = d_rk.argmin(1)
    val = d_rk.min(1)
    ok = val < dist_thresh
    # ball query: first max_cluster_samples queries within radius per rep
    d_qr = np.linalg.norm(query[None, :, :] - reps[:, None, :], axis=-1)
    for r in range(fps_num):
        if not ok[r]:
            continue
        members = np.where(d_qr[r] <= radius)[0][:max_cluster_samples]
        out[members] = nn[r]
    return out


STAGES = [  # (fps_num, radius, max_cluster_samples, dist_thresh, n_query)
    (256, 6.0, 200, 13.3, 2000),
    (256, 3.0, 100, 6.6, 1500),
    (256, 2.0, 50, 3.3, 1000),
    (256, 1.0, 25, 1.6, 600),
]


@pytest.mark.parametrize('stage', range(4))
def test_approx_nn_matches_reference_algorithm(stage, rng):
    fps_num, radius, max_samples, dist_thresh, nq = STAGES[stage]
    # clustered queries around 3D key clusters (fg voxels concentrate
    # around objects that also have lidar hits)
    n_clusters = 40
    centers = rng.uniform(0, 300, (n_clusters, 3)).astype(np.float32)
    key = np.concatenate([
        c + rng.randn(60, 3) * 3 for c in centers]).astype(np.float32)
    query = np.concatenate([
        c + rng.randn(nq // n_clusters, 3) * 4
        for c in centers]).astype(np.float32)
    key = np.round(np.abs(key))
    query = np.round(np.abs(query))

    oracle = fps_nn_oracle(query, key, fps_num, radius, max_samples,
                           dist_thresh)

    qc = np.concatenate([np.zeros((len(query), 1), np.int32),
                         query.astype(np.int32)], axis=1)
    kc = np.concatenate([np.zeros((len(key), 1), np.int32),
                         key.astype(np.int32)], axis=1)
    ours = np.asarray(approx_nn_3d(
        jnp.asarray(qc), jnp.ones(len(query), bool), jnp.asarray(kc),
        jnp.ones(len(key), bool), fps_num, radius, dist_thresh))

    cov_oracle = float((oracle >= 0).mean())
    cov_ours = float((ours >= 0).mean())
    both = (oracle >= 0) & (ours >= 0)

    # distance quality: our assigned key should be about as close to the
    # query as the oracle's (both are rep-NN approximations)
    d_ours = np.linalg.norm(query[both] - key[ours[both]], axis=-1)
    d_oracle = np.linalg.norm(query[both] - key[oracle[both]], axis=-1)
    excess = float(np.mean(d_ours - d_oracle))

    print(f'stage {stage}: coverage oracle={cov_oracle:.3f} '
          f'ours={cov_ours:.3f} mean_excess_dist={excess:.2f} '
          f'(radius={radius})')
    # ours must cover >= 95% of what the oracle covers, and the assigned
    # keys must be no farther on average than one ball radius
    assert cov_ours >= 0.95 * cov_oracle, (cov_ours, cov_oracle)
    assert excess <= radius, excess


def test_masked_nn_kernel_matches_bruteforce(rng):
    """Fused distance+argmin (interpret + fallback) == numpy brute force,
    incl. batch separation, invalid keys, and first-index tie-breaks."""
    import jax.numpy as jnp
    from msmdfusion_tpu.ops.nn_argmin import masked_nn
    na, nb = 700, 900
    a = rng.randint(0, 40, (na, 3)).astype(np.float32)
    b = rng.randint(0, 40, (nb, 3)).astype(np.float32)
    ab = rng.randint(0, 2, na).astype(np.int32)
    bb = rng.randint(0, 2, nb).astype(np.int32)
    bv = rng.rand(nb) > 0.2

    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    ok = (ab[:, None] == bb[None, :]) & bv[None, :]
    d = np.where(ok, d, np.inf)
    ref_idx = np.where(np.isfinite(d.min(1)), d.argmin(1), -1)
    ref_d2 = d.min(1)

    for interp in (False, True):
        idx, d2 = masked_nn(jnp.asarray(a), jnp.asarray(ab), jnp.asarray(b),
                            jnp.asarray(bb), jnp.asarray(bv),
                            interpret=interp)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        np.testing.assert_array_equal(idx, ref_idx)
        finite = np.isfinite(ref_d2)
        np.testing.assert_allclose(d2[finite], ref_d2[finite], atol=1e-3)


@pytest.mark.slow
def test_approx_nn_flagship_scale(rng):
    """Flagship-scale agreement case (VERDICT r2 item 9): fps_num=2048,
    ~40k fg queries vs ~120k 3D keys — the stage-0 scales of
    configs/MSMDFusion_nusc_voxel_LC.py:109-113. Records coverage and
    excess distance where the claim actually matters."""
    fps_num, radius, max_samples, dist_thresh = 2048, 6.0, 200, 13.3
    nq, nk, n_clusters = 40000, 120000, 300
    centers = rng.uniform(0, 1400, (n_clusters, 3)).astype(np.float32)
    centers[:, 0] = np.abs(centers[:, 0]) % 41  # z stays in the 41-grid
    key = np.concatenate([
        c + rng.randn(nk // n_clusters, 3) * np.array([2, 8, 8])
        for c in centers]).astype(np.float32)
    query = np.concatenate([
        c + rng.randn(nq // n_clusters, 3) * np.array([2, 10, 10])
        for c in centers]).astype(np.float32)
    key = np.round(np.abs(key)).astype(np.float32)
    query = np.round(np.abs(query)).astype(np.float32)
    nq, nk = len(query), len(key)  # cluster split rounds the counts down

    # memory-conscious oracle (chunked rep->key NN; on-the-fly ball query)
    rep_idx = fps_numpy(query, fps_num)
    reps = query[rep_idx]
    nn = np.zeros(fps_num, np.int64)
    val = np.zeros(fps_num, np.float32)
    for lo in range(0, fps_num, 256):
        d = np.linalg.norm(reps[lo:lo + 256, None] - key[None], axis=-1)
        nn[lo:lo + 256] = d.argmin(1)
        val[lo:lo + 256] = d.min(1)
    ok = val < dist_thresh
    oracle = np.full(nq, -1, np.int64)
    for r in range(fps_num):
        if not ok[r]:
            continue
        d = np.linalg.norm(query - reps[r], axis=-1)
        members = np.where(d <= radius)[0][:max_samples]
        oracle[members] = nn[r]

    qc = np.concatenate([np.zeros((nq, 1), np.int32),
                         query.astype(np.int32)], axis=1)
    kc = np.concatenate([np.zeros((nk, 1), np.int32),
                         key.astype(np.int32)], axis=1)
    ours = np.asarray(approx_nn_3d(
        jnp.asarray(qc), jnp.ones(nq, bool), jnp.asarray(kc),
        jnp.ones(nk, bool), fps_num, radius, dist_thresh))

    cov_oracle = float((oracle >= 0).mean())
    cov_ours = float((ours >= 0).mean())
    both = (oracle >= 0) & (ours >= 0)
    d_ours = np.linalg.norm(query[both] - key[ours[both]], axis=-1)
    d_oracle = np.linalg.norm(query[both] - key[oracle[both]], axis=-1)
    excess = float(np.mean(d_ours - d_oracle))
    print(f'flagship scale: coverage oracle={cov_oracle:.3f} '
          f'ours={cov_ours:.3f} mean_excess_dist={excess:.2f}')
    assert cov_ours >= 0.95 * cov_oracle, (cov_ours, cov_oracle)
    assert excess <= radius, excess
