"""Checkpoint save/restore: retention, sliced-save + merge (SURVEY §5
checkpoint/resume parity rows)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mindrec_tpu.io.checkpoint import (
    latest_checkpoint,
    merge_sliced,
    restore_checkpoint,
    save_checkpoint,
)


def _state(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "table": jax.random.normal(k, (64, 8)),
        "mlp": [{"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}],
        "step": jnp.asarray(7, jnp.int32),
    }


def test_roundtrip(tmp_path):
    s = _state()
    p = save_checkpoint(tmp_path, s, step=5)
    got = restore_checkpoint(p, jax.tree.map(jnp.zeros_like, s))
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_retention_keep_max(tmp_path):
    s = _state()
    for step in range(6):
        save_checkpoint(tmp_path, s, step=step, keep_max=3)
    files = sorted(f.name for f in tmp_path.iterdir())
    assert len(files) == 3
    assert files == [f"ckpt-{i:010d}-r0.npz" for i in (3, 4, 5)]
    path, step = latest_checkpoint(tmp_path)
    assert step == 5 and path.endswith("ckpt-0000000005-r0.npz")


def test_sliced_save_and_merge(tmp_path, mesh8):
    """Shard a table over the mesh, save sliced, merge back to full."""
    full = np.arange(64 * 16, dtype=np.float32).reshape(64, 16)
    sharding = NamedSharding(mesh8, P("data", None))
    table = jax.device_put(jnp.asarray(full), sharding)
    state = {"emb": table, "bias": jnp.ones((3,))}
    # force_sliced: on a single-process test mesh every array is fully
    # addressable, which would silently skip the shard path
    p = save_checkpoint(tmp_path, state, step=1, force_sliced=True)
    import json

    z = np.load(p, allow_pickle=False)
    assert json.loads(str(z["__index__"]))["emb"]["sliced"] is True
    assert sum(1 for n in z.files if n.startswith("emb@@shard")) >= 4

    like = {"emb": jnp.zeros((64, 16)), "bias": jnp.zeros((3,))}
    merged = merge_sliced([p], like)
    np.testing.assert_allclose(np.asarray(merged["emb"]), full)
    np.testing.assert_allclose(np.asarray(merged["bias"]), 1.0)

    restored = restore_checkpoint(p, like)
    np.testing.assert_allclose(np.asarray(restored["emb"]), full)


def test_async_save_matches_sync(tmp_path):
    """AsyncCheckpointer writes the same bytes-equal state as the sync
    path, snapshots BEFORE returning (later mutation of the source
    arrays must not leak into the file), and renames atomically (no
    .tmp ever visible under the final name)."""
    from mindrec_tpu.io.checkpoint import AsyncCheckpointer

    s = {"t": np.arange(12, dtype=np.float32).reshape(3, 4), "n": np.ones(2)}
    with AsyncCheckpointer() as ck:
        fut = ck.save(tmp_path / "a", s, step=3)
        s["t"][:] = -1.0  # post-save mutation: must not appear in file
        p_async = ck.wait_until_finished()
    assert fut.result() == p_async
    p_sync = save_checkpoint(
        tmp_path / "b",
        {"t": np.arange(12, dtype=np.float32).reshape(3, 4), "n": np.ones(2)},
        step=3,
    )
    za, zb = np.load(p_async), np.load(p_sync)
    assert set(za.files) == set(zb.files)
    for name in za.files:
        np.testing.assert_array_equal(za[name], zb[name])
    assert not list((tmp_path / "a").glob(".*"))  # no tmp leftovers
    got = restore_checkpoint(p_async, {"t": np.zeros((3, 4)), "n": np.zeros(2)})
    np.testing.assert_allclose(
        np.asarray(got["t"]), np.arange(12, dtype=np.float32).reshape(3, 4)
    )


def test_async_retention_and_latest(tmp_path):
    from mindrec_tpu.io.checkpoint import AsyncCheckpointer

    s = _state()
    with AsyncCheckpointer() as ck:
        for step in range(5):
            ck.save(tmp_path, s, step=step, keep_max=2)
    files = sorted(f.name for f in tmp_path.iterdir())
    assert files == [f"ckpt-{i:010d}-r0.npz" for i in (3, 4)]
    _, step = latest_checkpoint(tmp_path)
    assert step == 4


def test_checkpoint_callback_async(tmp_path):
    """CheckpointCallback(async_save=True): saves land, resolve to
    paths at train end, and restore cleanly."""
    from mindrec_tpu.train.callbacks import CheckpointCallback, RunContext

    cb = CheckpointCallback(str(tmp_path), save_steps=2, keep_max=5,
                            async_save=True)
    state = _state()
    ctx = RunContext()
    for i in range(1, 5):
        ctx.cur_step_num = i
        ctx.train_state = state
        cb.on_train_step_end(ctx)
    cb.on_train_end(ctx)
    assert all(isinstance(p, str) for p in cb.saved) and len(cb.saved) == 2
    got = restore_checkpoint(cb.saved[-1], jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(
        np.asarray(got["table"]), np.asarray(state["table"])
    )


def test_reshard_on_restore(tmp_path, mesh8):
    """Save sliced on an 8-device mesh, resume onto a 4-device mesh:
    restore_checkpoint(path, like, shardings=...) device_puts every
    leaf to the NEW topology and the forward output is identical
    (reference strategy-ckpt reload under auto-parallel,
    models/wide_deep/eval.py:84-105)."""
    from jax.sharding import Mesh

    full = np.arange(64 * 16, dtype=np.float32).reshape(64, 16)
    w = np.linspace(-1, 1, 16 * 4, dtype=np.float32).reshape(16, 4)
    state = {
        "emb": jax.device_put(jnp.asarray(full), NamedSharding(mesh8, P("data", None))),
        "w": jax.device_put(jnp.asarray(w), NamedSharding(mesh8, P())),
    }
    p = save_checkpoint(tmp_path, state, step=1, force_sliced=True)

    @jax.jit
    def fwd(st, ids):
        return st["emb"][ids] @ st["w"]

    ids = jnp.asarray([0, 5, 63, 17])
    want = np.asarray(fwd(state, ids))

    mesh4 = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("data",))
    like = {"emb": jnp.zeros((64, 16)), "w": jnp.zeros((16, 4))}
    shardings = {
        "emb": NamedSharding(mesh4, P("data", None)),
        "w": NamedSharding(mesh4, P()),
    }
    got_state = restore_checkpoint(p, like, shardings=shardings)
    assert got_state["emb"].sharding == shardings["emb"]
    assert {d.id for d in got_state["emb"].sharding.device_set} == {
        d.id for d in jax.devices()[:4]
    }
    np.testing.assert_allclose(np.asarray(fwd(got_state, ids)), want)

    # template-driven variant: a live sharded state as `like` supplies
    # the shardings itself
    live_like = jax.tree.map(
        lambda l, s: jax.device_put(np.zeros_like(l), s), like, shardings
    )
    got2 = restore_checkpoint(p, live_like)
    assert got2["emb"].sharding == shardings["emb"]
    np.testing.assert_allclose(np.asarray(fwd(got2, ids)), want)


def test_host_copy_owns_plain_ndarray():
    """Async snapshots must never alias a caller's live numpy array
    (mutating it before the background write lands would corrupt the
    checkpoint)."""
    from mindrec_tpu.io.checkpoint import _host_copy

    src = np.arange(6, dtype=np.float32)
    snap = _host_copy(src)
    src[:] = -1
    np.testing.assert_array_equal(snap, np.arange(6, dtype=np.float32))


def test_checkpoint_callback_reusable_across_runs(tmp_path):
    """One CheckpointCallback(async_save=True) serves several
    train()/online_train() invocations (online-learning per-window
    pattern) — on_train_end closes the executor, the next save
    self-heals."""
    from mindrec_tpu.train.callbacks import CheckpointCallback, RunContext

    cb = CheckpointCallback(str(tmp_path), save_steps=1, keep_max=10,
                            async_save=True)
    state = _state()
    for run in range(2):
        ctx = RunContext()
        ctx.cur_step_num = run + 1
        ctx.train_state = state
        cb.on_train_step_end(ctx)
        cb.on_train_end(ctx)
    assert len(list(tmp_path.glob("ckpt-*.npz"))) >= 1
    assert len(cb.saved) == 2
