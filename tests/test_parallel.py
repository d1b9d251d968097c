"""Multi-device data parallelism on the 8-device virtual CPU mesh
(SURVEY §4(c)): the parallel train step must match the single-device step
on the same global batch, batches must shard/assemble losslessly, and the
alignment stage's CTC prior accumulators must reduce globally."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _stage_fixture(stage_name):
    from stylish_tts_tpu.config import Config
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import (
        build_train_state,
        init_model_variables,
        init_slm_params,
    )
    from stylish_tts_tpu.train.stages import StageContext, make_train_step
    from stylish_tts_tpu.utils.synthetic import tiny_model_config

    mc = tiny_model_config()
    models = build_models(mc)
    variables = init_model_variables(models, mc, jax.random.PRNGKey(0))
    state = build_train_state(variables, mc)
    ctx = StageContext(
        models=models, model_config=mc, config=Config(),
        mel_mean=-4.0, mel_std=4.0, step_limit=100,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {"slm": init_slm_params(jax.random.PRNGKey(7), mc), "ssl": None}
    step = make_train_step(stage_name, ctx, 1e-4)
    return mc, state, step, frozen


def _batch(mc, b=8, t=10, frames=12, seed=0):
    rng = np.random.default_rng(seed)
    align = np.zeros((b, t, frames), np.float32)
    # monotonic alignment: spread frames across tokens
    for i in range(b):
        bounds = np.linspace(0, frames, t + 1).astype(int)
        for j in range(t):
            align[i, j, bounds[j]:bounds[j + 1]] = 1.0
    return dict(
        text=np.asarray(rng.integers(1, 40, (b, t)), np.int32),
        text_length=np.full((b,), t, np.int32),
        alignment=align,
        pitch=np.asarray(
            120.0 + 30 * rng.random((b, frames)), np.float32
        ),
        audio_gt=np.asarray(
            0.1 * rng.standard_normal((b, frames * mc.hop_length)),
            np.float32,
        ),
    )


def test_mesh_has_eight_devices():
    assert len(jax.devices()) == 8


def test_shard_assemble_roundtrip():
    from stylish_tts_tpu.parallel import (
        global_batch_from_local,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh()
    batch = {
        "a": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "b": np.arange(16, dtype=np.int32).reshape(16),
    }
    for assemble in (shard_batch, global_batch_from_local):
        out = assemble(dict(batch), mesh)
        for k in batch:
            assert out[k].shape == batch[k].shape
            np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
            # rows actually sharded over the data axis
            assert len(out[k].sharding.device_set) == 8


@pytest.mark.slow
def test_acoustic_parallel_step_matches_single_device():
    from stylish_tts_tpu.parallel import (
        global_batch_from_local,
        make_mesh,
        make_parallel_train_step,
        replicate,
    )

    mc, state, step, frozen = _stage_fixture("acoustic")
    batch = _batch(mc)
    rng = jax.random.PRNGKey(3)

    # single device (default placement)
    single_state, single_metrics = jax.jit(step)(
        state, {k: jnp.asarray(v) for k, v in batch.items()}, rng, frozen
    )

    # 8-device DP
    mesh = make_mesh()
    pstep = make_parallel_train_step(step, mesh)
    pstate = replicate(state, mesh)
    pfrozen = replicate(frozen, mesh)
    pbatch = global_batch_from_local(batch, mesh)
    par_state, par_metrics = pstep(pstate, pbatch, rng, pfrozen)

    for k in single_metrics:
        np.testing.assert_allclose(
            np.asarray(par_metrics[k]), np.asarray(single_metrics[k]),
            rtol=2e-2, atol=2e-3, err_msg=f"metric {k}",
        )
    # parameter updates agree (spot-check one trained module)
    s_leaf = jax.tree_util.tree_leaves(
        single_state.params["speech_predictor"]
    )[0]
    p_leaf = jax.tree_util.tree_leaves(
        par_state.params["speech_predictor"]
    )[0]
    np.testing.assert_allclose(
        np.asarray(p_leaf), np.asarray(s_leaf), rtol=1e-3, atol=1e-5
    )


@pytest.mark.slow
def test_alignment_priors_reduce_globally():
    """Two alignment steps + the epoch-end prior update must agree between
    the 8-device mesh and a single device (the reference gathers priors
    across DDP ranks, losses.py:603-611; here GSPMD reduces them because
    the batch is one global array)."""
    from stylish_tts_tpu.parallel import (
        global_batch_from_local,
        make_mesh,
        make_parallel_train_step,
        replicate,
    )
    from stylish_tts_tpu.train.stages import end_alignment_epoch

    mc, state, step, frozen = _stage_fixture("alignment")
    b1 = _batch(mc, seed=1)
    b2 = _batch(mc, seed=2)
    rng = jax.random.PRNGKey(5)

    s = state
    jstep = jax.jit(step)
    for b in (b1, b2):
        s, m = jstep(s, {k: jnp.asarray(v) for k, v in b.items()}, rng, frozen)
    s = end_alignment_epoch(s)

    mesh = make_mesh()
    pstep = make_parallel_train_step(step, mesh)
    ps = replicate(state, mesh)
    pfrozen = replicate(frozen, mesh)
    for b in (b1, b2):
        ps, pm = pstep(ps, global_batch_from_local(b, mesh), rng, pfrozen)
    ps = end_alignment_epoch(ps)

    np.testing.assert_allclose(
        np.asarray(ps.log_priors), np.asarray(s.log_priors),
        rtol=1e-4, atol=1e-5,
    )
    assert bool(ps.priors_initialized)


def test_batch_manager_divisor_and_padding(tmp_path):
    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.data.batch_manager import BatchManager
    from stylish_tts_tpu.data.dataset import FilePathDataset, get_data_path_list
    from stylish_tts_tpu.text import TextCleaner
    from stylish_tts_tpu.utils.synthetic import make_synthetic_dataset

    make_synthetic_dataset(tmp_path, n_segments=10)
    mc = ModelConfig()
    ds = FilePathDataset(
        data_list=get_data_path_list(tmp_path / "train-list.txt"),
        root_path=tmp_path / "wav24",
        text_cleaner=TextCleaner(mc.symbol),
        model_config=mc,
        pitch_path=str(tmp_path / "pitch.safetensors"),
        alignment_path=str(tmp_path / "alignment.safetensors"),
    )
    bm = BatchManager(ds, tmp_path, "acoustic", divisor=8)
    # every effective batch size is a multiple of the data-axis width
    for key in bm.time_bins:
        assert bm.get_batch_size(key) % 8 == 0
    batches = list(bm.epoch_iterator(stage="acoustic", epoch=1))
    assert batches
    for b in batches:
        assert b["global_batch_size"] % 8 == 0
        assert b["text"].shape[0] == b["global_batch_size"]  # single process

    # steps_per_epoch is exact on perfect multiples (no +1 overcount)
    bm2 = BatchManager(ds, tmp_path / "x", "acoustic", divisor=1)
    bm2.time_bins = {5: list(range(6))}
    bm2.batch_sizes = {"5": 3}
    assert bm2.steps_per_epoch() == 2


def test_oom_guard_shrinks_and_retries(tmp_path):
    """Device OOM shrinks the bin's batch size persistently and retries the
    truncated batch (reference train/batch_manager.py:187-242 semantics)."""
    import json

    from stylish_tts_tpu.parallel import make_mesh
    from stylish_tts_tpu.train.loop import _guarded_step

    class FakeBM:
        divisor = 8

        def __init__(self, out):
            self.sizes = {"5": 32}
            self.out = out

        def get_batch_size(self, b):
            return self.sizes[str(b)]

        def set_batch_size(self, b, bs):
            self.sizes[str(b)] = bs
            (self.out / "sizes.json").write_text(json.dumps(self.sizes))

    mesh = make_mesh()
    bm = FakeBM(tmp_path)
    calls = []

    def step(state, batch, rng, frozen):
        rows = batch["text"].shape[0]
        calls.append(rows)
        if rows > 16:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on HBM")
        return state + 1, {"loss": jnp.zeros(())}

    batch = {
        "text": np.zeros((32, 4), np.int32),
        "bin": 5,
        "global_batch_size": 32,
        "paths": ["x"] * 32,
    }
    skip = set()
    state, metrics = _guarded_step(
        step, 0, batch, jax.random.PRNGKey(0), None, bm, mesh, skip,
    )
    assert metrics is not None and state == 1
    assert calls == [32, 16]
    assert bm.sizes["5"] == 16  # persisted shrink
    assert not skip

    # a bin that OOMs at the minimum latches as skipped
    def always_oom(state, batch, rng, frozen):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    bm.sizes["5"] = 8
    state, metrics = _guarded_step(
        always_oom, 0, batch, jax.random.PRNGKey(0), None, bm, mesh, skip,
    )
    assert metrics is None and 5 in skip
