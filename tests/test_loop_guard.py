"""Error-classification and retry semantics of the train-step guard
(train/loop.py): OOM shrink-and-persist, transient-relay retry, and the
poisoned-state canary in the metric drain (ADVICE r4 medium)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylish_tts_tpu.train import loop as L


def test_error_classification():
    oom = RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
    relay = RuntimeError(
        "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
        "response body closed before all bytes were read"
    )
    relay500 = RuntimeError(
        "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1"
    )
    oom500 = RuntimeError(
        "INTERNAL: http://x/remote_compile: HTTP 500: ... "
        "Ran out of memory in memory space hbm"
    )
    other = RuntimeError("INVALID_ARGUMENT: shapes do not match")
    assert L._is_oom(oom) and not L._is_transient_relay(oom)
    assert L._is_transient_relay(relay) and not L._is_oom(relay)
    assert L._is_transient_relay(relay500)
    # a compile-OOM wrapped in the relay's 500 is OOM, never "transient"
    assert L._is_oom(oom500) and not L._is_transient_relay(oom500)
    assert not L._is_oom(other) and not L._is_transient_relay(other)


class _BM:
    # the conftest mesh has 8 virtual devices: rows shard over 'data',
    # so batch sizes move on the divisor-8 grid like production
    divisor = 8

    def __init__(self, bs=8):
        self.sizes = {"3": bs}
        self.saved = []

    def get_batch_size(self, b):
        return self.sizes[str(b)]

    def set_batch_size(self, b, v):
        self.sizes[str(b)] = v
        self.saved.append((b, v))


def _batch(rows=8):
    return {
        "text": np.zeros((rows, 4), np.int32),
        "bin": 3,
        "global_batch_size": rows,
    }


@pytest.fixture
def mesh():
    from stylish_tts_tpu.parallel import make_mesh

    return make_mesh()


def test_guard_shrinks_and_persists_on_oom(mesh, monkeypatch):
    calls = []

    def step_fn(state, batch, rng, frozen):
        calls.append(batch["text"].shape[0])
        if batch["text"].shape[0] > 8:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return state, {"loss": jnp.zeros(())}

    bm = _BM(32)
    skip = set()
    state, metrics = L._guarded_step(
        step_fn, "STATE", _batch(32), jax.random.PRNGKey(0), None, bm,
        mesh, skip,
    )
    assert metrics is not None
    assert calls == [32, 16, 8]        # halved twice, then fits
    assert bm.sizes["3"] == 8          # persisted plan
    assert skip == set()


def test_guard_retries_transient_relay_without_shrinking(mesh, monkeypatch):
    monkeypatch.setattr(L.time, "sleep", lambda s: None)
    calls = []

    def step_fn(state, batch, rng, frozen):
        calls.append(batch["text"].shape[0])
        if len(calls) < 3:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:1/remote_compile: read body: "
                "response body closed before all bytes were read"
            )
        return state, {"loss": jnp.zeros(())}

    bm = _BM(8)
    skip = set()
    _, metrics = L._guarded_step(
        step_fn, "STATE", _batch(8), jax.random.PRNGKey(0), None, bm,
        mesh, skip,
    )
    assert metrics is not None
    assert calls == [8, 8, 8]          # full batch retried, never shrunk
    assert bm.saved == [] and skip == set()


def test_guard_compile_500_falls_back_to_shrink(mesh, monkeypatch):
    """A persistent compile-helper 500 (the relay hides the compiler's
    error body; compile-OOM surfaces this way) retries twice then enters
    the shrink path instead of exhausting the relay budget."""
    monkeypatch.setattr(L.time, "sleep", lambda s: None)
    calls = []

    def step_fn(state, batch, rng, frozen):
        calls.append(batch["text"].shape[0])
        if batch["text"].shape[0] > 16:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:1/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit code 1"
            )
        return state, {"loss": jnp.zeros(())}

    bm = _BM(32)
    _, metrics = L._guarded_step(
        step_fn, "STATE", _batch(32), jax.random.PRNGKey(0), None, bm,
        mesh, set(),
    )
    assert metrics is not None
    assert calls == [32, 32, 32, 16]   # 2 relay retries, then shrink fits
    assert bm.sizes["3"] == 16


def test_guard_recovers_runtime_oom_on_first_run(mesh, monkeypatch):
    """A runtime OOM (surfaces at the first-run block_until_ready, after
    the donated input state is void) restores the host snapshot, shrinks
    the bin, and retries — instead of poisoning the stage (ADVICE r4)."""
    import collections

    St = collections.namedtuple("St", ["step"])
    state0 = St(step=jnp.asarray(7, jnp.int32))
    calls, blocks = [], []

    def step_fn(state, batch, rng, frozen):
        calls.append(batch["text"].shape[0])
        return St(step=state.step + 1), {"loss": jnp.zeros(())}

    real_block = jax.block_until_ready

    def fake_block(x):
        blocks.append(1)
        if len(blocks) == 1:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: ran out of memory while executing"
            )
        return real_block(x)

    monkeypatch.setattr(L.jax, "block_until_ready", fake_block)
    bm = _BM(16)
    skip, validated = set(), set()
    state, metrics = L._guarded_step(
        step_fn, state0, _batch(16), jax.random.PRNGKey(0), None, bm,
        mesh, skip, validated=validated,
    )
    assert metrics is not None
    assert calls == [16, 8]            # runtime OOM shrank like compile OOM
    assert bm.sizes["3"] == 8          # persisted
    # pre-step snapshot (7) was restored before the successful retry
    assert int(state.step) == 8
    assert (3, 8) in validated and skip == set()


def test_guard_validated_shape_keeps_async_fast_path(mesh, monkeypatch):
    def step_fn(state, batch, rng, frozen):
        return state, {"loss": jnp.zeros(())}

    def boom(x):
        raise AssertionError("block_until_ready called on validated shape")

    monkeypatch.setattr(L.jax, "block_until_ready", boom)
    _, metrics = L._guarded_step(
        step_fn, "STATE", _batch(8), jax.random.PRNGKey(0), None, _BM(8),
        mesh, set(), validated={(3, 8)},
    )
    assert metrics is not None


def test_guard_raises_other_errors(mesh):
    def step_fn(state, batch, rng, frozen):
        raise RuntimeError("INVALID_ARGUMENT: bug")

    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        L._guarded_step(
            step_fn, "STATE", _batch(8), jax.random.PRNGKey(0), None,
            _BM(8), mesh, set(),
        )


def test_drain_metrics_healthy_and_canary():
    class State:
        step = jnp.zeros((), jnp.int32)

    logs = [{"loss": jnp.asarray(1.0), "mel": jnp.asarray(2.0)},
            {"loss": jnp.asarray(3.0), "mel": jnp.asarray(4.0)}]
    out = L._drain_metrics(logs, State())
    assert out == {"loss": 2.0, "mel": 3.0}
    assert L._drain_metrics([], State()) == {}
    # host-side programming errors must propagate, not be swallowed
    bad = [{"loss": jnp.asarray(1.0)}, {"other": jnp.asarray(1.0)}]
    with pytest.raises(KeyError):
        L._drain_metrics(bad, State())
