import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.models import init_params
from mccnn_tpu.parallel import make_dp_train_step, make_mesh, make_sharded_match, shard_batch
from mccnn_tpu.pipeline.match import match_pair
from mccnn_tpu.pipeline.train import make_optimizer, make_train_step
from mccnn_tpu.utils.config import MatchConfig, TrainConfig

TRAIN_CFG = TrainConfig(batch_size=16, learning_rate=0.01)
MATCH_CFG = MatchConfig(
    cbca_intensity=0.4, cbca_distance=3,
    cbca_num_iterations_1=1, cbca_num_iterations_2=1, sgm_d=0.4,
)


def test_mesh_uses_all_fake_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_train_step_matches_single_device(rng):
    mesh = make_mesh(8)
    params = init_params(jax.random.key(0))
    optimizer = make_optimizer(TRAIN_CFG)
    opt_state = optimizer.init(params)
    batch = tuple(
        jnp.asarray(rng.normal(size=(16, 11, 11, 1)).astype(np.float32))
        for _ in range(3)
    )

    single = make_train_step(TRAIN_CFG, optimizer)
    p_single, _, loss_single = single(params, opt_state, batch)

    dp = make_dp_train_step(TRAIN_CFG, mesh)
    sharded = shard_batch(batch, mesh)
    p_dp, _, loss_dp = dp(params, opt_state, sharded)

    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("cv_method,cbca_impl", [
    ("pallas", "fused"),   # shard_map-wrapped Pallas kernels (the default)
    ("matmul", "xla"),     # fully GSPMD-partitioned XLA fallback
])
def test_sharded_match_matches_unsharded(rng, cv_method, cbca_impl):
    """Sharded vs unsharded on the PRE-WTA volumes (deterministic — tie
    excuses don't apply upstream of argmin), WTA maps, and disparity."""
    mesh = make_mesh(4)
    params = init_params(jax.random.key(1))
    height, width, ndisp = 16, 24, 4
    left = rng.normal(size=(height, width)).astype(np.float32)
    right = rng.normal(size=(height, width)).astype(np.float32)

    plain = match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, MATCH_CFG,
        return_volumes=True,
    )
    sharded_fn = make_sharded_match(
        ndisp, MATCH_CFG, mesh,
        cost_volume_method=cv_method, cbca_impl=cbca_impl,
        return_volumes=True,
    )
    sharded = sharded_fn(params, jnp.asarray(left), jnp.asarray(right))

    for key, tol in (("left_volume", 1e-4), ("right_volume", 1e-4),
                     ("left_disparity", 0.0), ("right_disparity", 0.0),
                     ("disparity", 1e-5)):
        a, b = np.asarray(plain[key]), np.asarray(sharded[key])
        # rtol covers the BIG_COST (1e9) disparity-pad lanes, where one
        # f32 ulp is 64 and hooked-vs-plain program shapes reassociate
        np.testing.assert_allclose(b, a, atol=tol, rtol=1e-6, err_msg=key)


def test_sharded_volumes_exact_at_ci_scale(rng):
    """GSPMD row-sharded pipeline at a shape with real distance-14 crosses
    and ndisp 128 (the full-scale evidence at 512x768 lives in
    tools/multichip_midscale.py -> MULTICHIP_MIDSCALE.md; this is the CI
    regression guard at 1/12 the pixels). Pre-WTA volumes agree to fp
    tolerance, WTA maps exactly."""
    from mccnn_tpu.utils.scenes import scene_pair

    mesh = make_mesh(8)
    params = init_params(jax.random.key(2))
    height, width, ndisp = 128, 256, 128
    left, right, _, _, _ = scene_pair(
        "occlusion", np.random.default_rng(3), height, width, max_disparity=20
    )
    config = MatchConfig(cbca_num_iterations_1=1, cbca_num_iterations_2=1)

    plain = jax.jit(
        lambda p, l, r: match_pair(
            p, l, r, ndisp, config, cost_volume_method="matmul",
            cbca_impl="xla", return_volumes=True,
        )
    )(params, jnp.asarray(left), jnp.asarray(right))
    sharded_fn = make_sharded_match(
        ndisp, config, mesh, cost_volume_method="matmul", cbca_impl="xla",
        return_volumes=True,
    )
    sharded = sharded_fn(params, jnp.asarray(left), jnp.asarray(right))

    for key, tol in (("left_volume", 1e-4), ("right_volume", 1e-4),
                     ("left_disparity", 0.0), ("right_disparity", 0.0),
                     ("disparity", 1e-5)):
        a, b = np.asarray(plain[key]), np.asarray(sharded[key])
        np.testing.assert_allclose(b, a, atol=tol, rtol=1e-6, err_msg=key)


def test_sharded_pallas_path_volumes_at_ci_scale(rng):
    """The PRODUCTION sharded path (shard_map-wrapped Pallas band kernel +
    fused CBCA — make_sharded_match's defaults) at a shape with real
    distance-14 crosses and ndisp 128, against the unsharded exact XLA
    pipeline. Round-3 review: this path was only equality-tested end to
    end at 16x24/ndisp-4; here each of the 4 shards is 32 rows, so the
    radius-13 ppermute halo exchange and per-shard kernel tiling are all
    non-degenerate (interpret-mode Pallas on CPU). The full-scale variant
    lives in tools/multichip_midscale.py --impl pallas."""
    from mccnn_tpu.utils.scenes import scene_pair

    mesh = make_mesh(4)
    params = init_params(jax.random.key(2))
    height, width, ndisp = 128, 256, 128
    left, right, _, _, _ = scene_pair(
        "occlusion", np.random.default_rng(3), height, width, max_disparity=20
    )
    config = MatchConfig(cbca_num_iterations_1=1, cbca_num_iterations_2=1)

    plain = jax.jit(
        lambda p, l, r: match_pair(
            p, l, r, ndisp, config, cost_volume_method="matmul",
            cbca_impl="xla", return_volumes=True,
        )
    )(params, jnp.asarray(left), jnp.asarray(right))
    sharded_fn = make_sharded_match(
        ndisp, config, mesh, cost_volume_method="pallas", cbca_impl="fused",
        return_volumes=True,
    )
    sharded = sharded_fn(params, jnp.asarray(left), jnp.asarray(right))

    for key, tol in (("left_volume", 1e-4), ("right_volume", 1e-4),
                     ("left_disparity", 0.0), ("right_disparity", 0.0),
                     ("disparity", 1e-5)):
        a, b = np.asarray(plain[key]), np.asarray(sharded[key])
        np.testing.assert_allclose(b, a, atol=tol, rtol=1e-6, err_msg=key)


def test_shard_map_pallas_cbca_matches_unsharded_kernel(rng):
    """The shard_map fused-CBCA hook must equal the single-device kernel
    at a size where the kernel path (not the tiny-shape fallback) runs."""
    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.common import BIG_COST
    from mccnn_tpu.parallel.pallas_shard import make_sharded_cbca_fn

    mesh = make_mesh(2)
    height, width, ndisp, d_pad = 128, 160, 5, 128  # 64 rows/shard
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    tau, dist = 0.8, 14

    arms = compute_arms(jnp.asarray(image), tau, dist)
    expected = np.asarray(cbca(jnp.asarray(volume), arms, 1, dist))
    fn = make_sharded_cbca_fn(dist, mesh, impl="fused")
    sharded = np.asarray(fn(jnp.asarray(volume), arms, 1))
    np.testing.assert_allclose(sharded, expected, rtol=1e-4, atol=1e-4)


def test_shard_map_fused8_cbca_bitequal_to_unsharded(rng):
    """The int8-storage shard_map hook quantizes ONCE globally (all
    shards share the scale) and runs raw integer rounds per shard —
    sharded output must be BIT-EQUAL to the unsharded fused8 call."""
    from mccnn_tpu.ops.cbca import compute_arms
    from mccnn_tpu.ops.cbca_fused import cbca_fused
    from mccnn_tpu.ops.common import BIG_COST
    from mccnn_tpu.parallel.pallas_shard import make_sharded_cbca_fn

    mesh = make_mesh(2)
    height, width, ndisp, d_pad = 128, 160, 5, 128  # 64 rows/shard
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    tau, dist = 0.8, 14

    arms = compute_arms(jnp.asarray(image), tau, dist)
    expected = np.asarray(cbca_fused(jnp.asarray(volume), arms, 2, dist,
                                     int8_storage=True))
    fn = make_sharded_cbca_fn(dist, mesh, impl="fused8")
    sharded = np.asarray(fn(jnp.asarray(volume), arms, 2))
    np.testing.assert_array_equal(sharded, expected)


def test_shard_map_fused2_cbca_matches_unsharded_kernel(rng):
    """The two-round shard_map hook (halo = 2*radius, rounds_per_pass=2)
    must equal the exact stencil; 3 iterations exercises the odd-count
    remainder path (one 2-round pass + one single-round pass with a
    re-sliced radius halo)."""
    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.common import BIG_COST
    from mccnn_tpu.parallel.pallas_shard import make_sharded_cbca_fn

    mesh = make_mesh(2)
    height, width, ndisp, d_pad = 128, 160, 5, 128  # 64 rows/shard >= 26
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    tau, dist = 0.8, 14

    arms = compute_arms(jnp.asarray(image), tau, dist)
    expected = np.asarray(cbca(jnp.asarray(volume), arms, 3, dist))
    fn = make_sharded_cbca_fn(dist, mesh, impl="fused2")
    sharded = np.asarray(fn(jnp.asarray(volume), arms, 3))
    np.testing.assert_allclose(sharded, expected, rtol=1e-4, atol=1e-4)


def test_shard_map_cbca_matches_unsharded(rng):
    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.common import BIG_COST
    from mccnn_tpu.parallel.cbca import cbca_sharded

    mesh = make_mesh(8)
    height, width, ndisp, d_pad = 48, 20, 5, 8  # 6 rows/shard > radius 3
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    tau, dist = 0.8, 4

    arms = compute_arms(jnp.asarray(image), tau, dist)
    expected = np.asarray(cbca(jnp.asarray(volume), arms, 3, dist))
    sharded = np.asarray(
        cbca_sharded(jnp.asarray(volume), arms, 3, dist, mesh)
    )
    np.testing.assert_allclose(sharded, expected, rtol=1e-4, atol=1e-4)
