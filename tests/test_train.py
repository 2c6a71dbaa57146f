import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.models import init_params
from mccnn_tpu.pipeline.train import (
    hinge_loss,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from mccnn_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from mccnn_tpu.utils.config import TrainConfig

CFG = TrainConfig(batch_size=8, learning_rate=0.01, beta=0.9, margin=0.2)


def _batch(rng, n=8):
    return tuple(
        jnp.asarray(rng.normal(size=(n, 11, 11, 1)).astype(np.float32))
        for _ in range(3)
    )


def test_momentum_update_matches_tf_semantics(rng):
    """TF MomentumOptimizer: acc = beta*acc + g; w -= lr*acc."""
    params = init_params(jax.random.key(0))
    optimizer = make_optimizer(CFG)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)

    batch1, batch2 = _batch(rng), _batch(rng)
    g1 = jax.grad(hinge_loss)(params, batch1, CFG.margin)
    p1, opt_state, _ = step(params, opt_state, batch1)
    expected1 = jax.tree.map(lambda w, g: w - CFG.learning_rate * g, params, g1)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(expected1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g2 = jax.grad(hinge_loss)(p1, batch2, CFG.margin)
    p2, opt_state, _ = step(p1, opt_state, batch2)
    expected2 = jax.tree.map(
        lambda w, a, b: w - CFG.learning_rate * (CFG.beta * a + b), p1, g1, g2
    )
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(expected2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_loss_decreases(rng):
    params = init_params(jax.random.key(2))
    optimizer = make_optimizer(CFG)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)
    batch = _batch(rng, n=16)

    first = None
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_eval_step_matches_loss(rng):
    params = init_params(jax.random.key(0))
    batch = _batch(rng)
    eval_step = make_eval_step(CFG)
    np.testing.assert_allclose(
        float(eval_step(params, batch)),
        float(hinge_loss(params, batch, CFG.margin)),
        rtol=1e-6,
    )


def test_checkpoint_round_trip(tmp_path, rng):
    params = init_params(jax.random.key(0))
    optimizer = make_optimizer(CFG)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)
    params, opt_state, _ = step(params, opt_state, _batch(rng))

    directory = str(tmp_path / "ckpt")
    save_checkpoint(directory, 3, params, opt_state)
    assert latest_checkpoint(directory).endswith("model_epoch3.npz")

    template = {"params": init_params(jax.random.key(9)),
                "opt_state": optimizer.init(init_params(jax.random.key(9)))}
    restored = load_checkpoint(latest_checkpoint(directory), template)
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored["opt_state"]), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_checkpoint_loads_as_weights(tmp_path, rng):
    """A model_epochN.npz from save_checkpoint must load via load_any —
    match/serve/eval take --resume <training checkpoint> directly. This
    covers both the named params: format and the legacy flat leaf_{i}
    snapshots (whose momentum half mirrors the params half)."""
    from mccnn_tpu.models.params import load_any

    params = init_params(jax.random.key(0))
    optimizer = make_optimizer(CFG)
    opt_state = optimizer.init(params)

    directory = str(tmp_path / "ckpt")
    path = save_checkpoint(directory, 5, params, opt_state)
    loaded = load_any(path)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    legacy = str(tmp_path / "legacy" / "model_epoch5.npz")
    import os

    os.makedirs(os.path.dirname(legacy))
    leaves = jax.tree.leaves({"opt_state": opt_state, "params": params})
    np.savez(legacy,
             num_leaves=np.asarray(len(leaves)),
             **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})
    loaded = load_any(legacy)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_leaves_ten_plus_layers_named_by_flatten_order(tmp_path):
    """Legacy flat snapshots flatten params in sorted STRING key order
    (conv1 < conv10 < conv2); with >=10 layers the loader must assign pair
    j to the j-th sorted name, not to conv{j+1} (ADVICE round-4)."""
    from mccnn_tpu.models.params import load_any

    # distinct per-layer shapes (growing channel counts) so neither mirror
    # heuristic can trigger — the naming is what is under test here
    params = {
        f"conv{i}": {"b": np.full((2 + i,), i, np.float32),
                     "w": np.full((3, 3, 2, 2 + i), i, np.float32)}
        for i in range(1, 11)
    }
    leaves = jax.tree.leaves({"params": params})
    path = str(tmp_path / "model_epoch1.npz")
    np.savez(path, **{f"leaf_{i}": np.asarray(v)
                      for i, v in enumerate(leaves)})
    loaded = load_any(path)
    assert sorted(loaded) == sorted(params)
    for name in params:
        np.testing.assert_array_equal(loaded[name]["b"], params[name]["b"])
        np.testing.assert_array_equal(loaded[name]["w"], params[name]["w"])


def test_legacy_leaves_three_way_mirror_raises(tmp_path):
    """A 3-way mirrored leaf layout (adam-style mu/nu + params) must raise
    instead of parsing optimizer slots into plausible-but-wrong layers."""
    import pytest

    from mccnn_tpu.models.params import load_any

    params = init_params(jax.random.key(0))
    leaves = jax.tree.leaves({"mu": params, "nu": params, "params": params})
    path = str(tmp_path / "model_epoch1.npz")
    np.savez(path, **{f"leaf_{i}": np.asarray(v)
                      for i, v in enumerate(leaves)})
    with pytest.raises(ValueError, match="3-way mirror"):
        load_any(path)


def test_load_checkpoint_without_opt_state_raises_clearly(tmp_path):
    """Restoring a weights-only checkpoint into a template that expects
    optimizer state must raise a descriptive ValueError, not a bare
    KeyError('opt_leaf_0') (ADVICE round-4)."""
    import pytest

    params = init_params(jax.random.key(0))
    optimizer = make_optimizer(CFG)
    directory = str(tmp_path / "ckpt")
    path = save_checkpoint(directory, 1, params, opt_state=None)

    template = {"params": params, "opt_state": optimizer.init(params)}
    with pytest.raises(ValueError, match="no optimizer state"):
        load_checkpoint(path, template)

    # and a leaf-count mismatch (different optimizer) is also descriptive
    path2 = save_checkpoint(directory, 2, params,
                            opt_state=optimizer.init(params))
    with pytest.raises(ValueError, match="optimizer leaves"):
        load_checkpoint(path2, {"params": params,
                                "opt_state": [np.zeros(3, np.float32)]})

    # a hand-assembled archive carrying opt_leaf_* WITHOUT the
    # num_opt_leaves count key still restores (count derived from keys)
    opt_state = optimizer.init(params)
    with np.load(path2) as data:
        payload = {k: data[k] for k in data.files if k != "num_opt_leaves"}
    path3 = str(tmp_path / "ckpt" / "model_epoch3.npz")
    np.savez(path3, **payload)
    restored = load_checkpoint(path3, {"params": params,
                                       "opt_state": opt_state})
    for a, b in zip(jax.tree.leaves(restored["opt_state"]),
                    jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_pruning(tmp_path):
    params = {"conv1": {"w": np.zeros(3), "b": np.zeros(1)}}
    directory = str(tmp_path / "ckpt")
    for epoch in range(1, 6):
        save_checkpoint(directory, epoch, params, max_to_keep=3)
    import os

    kept = sorted(f for f in os.listdir(directory) if f.endswith(".npz"))
    assert kept == ["model_epoch3.npz", "model_epoch4.npz", "model_epoch5.npz"]
