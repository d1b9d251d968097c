"""Checkpoint save/restore + inference artifact packaging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylish_tts_tpu.train.checkpoint import (
    Manifest,
    NormalizationStats,
    checkpoint_name,
    save_model_safetensors,
    load_model_safetensors,
)


class TestManifest:
    def test_roundtrip(self):
        m = Manifest(current_epoch=3, stage="acoustic", best_loss=1.5)
        m2 = Manifest()
        m2.load_state_dict(m.state_dict())
        assert m2.current_epoch == 3 and m2.stage == "acoustic"

    def test_checkpoint_name(self):
        assert checkpoint_name(5, 12345) == "checkpoint_00005_step_000012345"


class TestSafetensorsRoundtrip:
    def test_model_params(self, tmp_path):
        params = {
            "dense": {"kernel": np.ones((3, 4), np.float32),
                      "bias": np.zeros((4,), np.float32)},
            "emb": {"embedding": np.full((5, 2), 2.0, np.float32)},
        }
        path = tmp_path / "m.safetensors"
        save_model_safetensors(path, params)
        template = jax.tree_util.tree_map(jnp.zeros_like, params)
        restored = load_model_safetensors(path, template)
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
class TestFullCheckpoint:
    def test_save_load_train_state(self, tmp_path):
        from stylish_tts_tpu.config import Config, ModelConfig
        from stylish_tts_tpu.models import build_models
        from stylish_tts_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )
        from stylish_tts_tpu.train.init import (
            build_train_state,
            init_model_variables,
        )

        mc = ModelConfig()
        mc.text_encoder.layers = 1
        mc.text_encoder.hidden_dim = 32
        mc.text_encoder.filter_channels = 64
        mc.inter_dim = 32
        mc.style_dim = 16
        mc.pitch_energy_predictor.inter_dim = 64
        mc.decoder.hidden_dim = 64
        mc.decoder.residual_dim = 16
        mc.generator.input_dim = 64
        mc.generator.hidden_dim = 64
        mc.generator.conv_intermediate_dim = 128
        mc.hubert.hidden_dim = 32
        mc.speaker_embedder.hidden_dim = 48
        models = build_models(mc)
        variables = init_model_variables(models, mc, jax.random.PRNGKey(0))
        state = build_train_state(variables, mc)
        manifest = Manifest(stage="acoustic", current_total_step=7)
        norm = NormalizationStats(mel_log_mean=-3.3)
        cfg = Config()
        path = save_checkpoint(
            tmp_path, "ckpt", state, manifest, norm,
            cfg.model_dump_json(), mc.model_dump_json(),
        )
        state2, manifest2, norm2, meta = load_checkpoint(path, state)
        assert manifest2.current_total_step == 7
        assert abs(norm2.mel_log_mean + 3.3) < 1e-9
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(state2.params)
        assert len(a) == len(b)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestOptLayoutMigration:
    def _tiny_state(self):
        from stylish_tts_tpu.train.state import TrainState
        from stylish_tts_tpu.train.optim import init_opt_states

        params = {
            "mod": {
                "dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))},
                "conv": {"kernel": jnp.full((2, 1, 4), 0.5)},
            }
        }
        return TrainState(
            params=params,
            opt_states=init_opt_states(params),
            batch_stats={},
            disc_ema={},
            log_priors=jnp.zeros((4,)),
            prior_sum=jnp.zeros((4,)),
            prior_frames=jnp.zeros(()),
            priors_initialized=jnp.zeros((), bool),
            step=jnp.zeros((), jnp.int32),
        )

    def test_flat_checkpoint_migrates_to_tree(self, tmp_path):
        """A round-2 checkpoint (flat adam moments) restores under the
        tree layout with moments unravelled onto the param trees."""
        from stylish_tts_tpu.train import optim
        from stylish_tts_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
            Manifest,
            NormalizationStats,
        )

        assert optim.get_layout() == "tree"
        optim.set_layout("flat")
        try:
            old = self._tiny_state()
            # give the flat moments distinguishable values
            inner = old.opt_states["mod"].inner_state
            adam = inner[0]
            n = adam.mu.shape[0]
            adam = adam._replace(
                mu=jnp.arange(n, dtype=jnp.float32),
                nu=jnp.arange(n, dtype=jnp.float32) * 2,
            )
            old = old.replace(
                opt_states={
                    "mod": old.opt_states["mod"]._replace(
                        inner_state=(adam,) + tuple(inner[1:])
                    )
                }
            )
            save_checkpoint(
                tmp_path, "ck", old, Manifest(), NormalizationStats(),
                "{}", "{}",
            )
        finally:
            optim.set_layout("tree")

        template = self._tiny_state()
        restored, _, _, _ = load_checkpoint(tmp_path / "ck", template)
        mu = restored.opt_states["mod"].inner_state[0].mu
        # tree-shaped moments now, matching params structure
        assert set(mu.keys()) == {"dense", "conv"}
        import jax.flatten_util

        flat_mu = jax.flatten_util.ravel_pytree(mu)[0]
        np.testing.assert_allclose(
            np.asarray(flat_mu), np.arange(flat_mu.shape[0], dtype=np.float32)
        )
