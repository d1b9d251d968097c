import jax.numpy as jnp
import numpy as np

from stylish_tts_tpu.config import Config, ModelConfig, load_model_config_json
from stylish_tts_tpu.duration import DurationProcessor, duration_to_alignment_np
from stylish_tts_tpu.text import TextCleaner


class TestConfig:
    def test_symbol_inventory_size(self):
        # reference model.yml text_encoder.tokens == 178 symbols
        mc = ModelConfig()
        cleaner = TextCleaner(mc.symbol)
        assert cleaner.n_symbols == mc.text_encoder.tokens == 178

    def test_json_roundtrip(self):
        mc = ModelConfig()
        mc2 = load_model_config_json(mc.model_dump_json())
        assert mc2 == mc
        c = Config()
        c2 = Config(**c.state_dict())
        assert c2 == c

    def test_generator_union_discriminates(self):
        mc = ModelConfig(**{"generator": {"type": "ringformer"}})
        assert mc.generator.type == "ringformer"
        mc = ModelConfig(**{"generator": {"type": "freegan", "hidden_dim": 256}})
        assert mc.generator.hidden_dim == 256

    def test_state_dict_shims(self):
        mc = ModelConfig()
        state = mc.state_dict()
        mc2 = ModelConfig(n_mels=128)
        mc2.load_state_dict(state)
        assert mc2.n_mels == 80


class TestTextCleaner:
    def test_basic_tokens(self):
        cleaner = TextCleaner()
        assert cleaner("$") == [0]
        # punctuation comes right after pad
        assert cleaner(";")[0] == 1
        ids = cleaner("Hello")
        assert len(ids) == 5 and all(i > 0 for i in ids)

    def test_unknown_dropped(self):
        cleaner = TextCleaner()
        assert cleaner("aΩb") == cleaner("ab")

    def test_encode_padded(self):
        cleaner = TextCleaner()
        tokens, lengths = cleaner.encode_padded(["ab", "abcd"], max_length=8)
        assert tokens.shape == (2, 8)
        # bracket pads included in length
        assert lengths.tolist() == [4, 6]
        assert tokens[0, 0] == 0 and tokens[0, 3] == 0 and tokens[0, 4] == 0


class TestDurationProcessor:
    def test_tables_inverse(self):
        dp = DurationProcessor()
        # class_to_dur then dur_to_class is identity on representative durs
        reps = np.asarray(dp.class_to_dur, dtype=np.int32)
        classes = np.asarray(dp.dur_to_class_ids(jnp.asarray(reps)))
        assert classes.tolist() == list(range(16))

    def test_align_to_class(self):
        dp = DurationProcessor()
        align = jnp.zeros((1, 3, 20)).at[0, 0, :2].set(1.0)
        align = align.at[0, 1, 2:9].set(1.0).at[0, 2, 9:20].set(1.0)
        classes = np.asarray(dp.align_to_class(align))[0]
        assert classes.tolist() == [1, 6, 8]  # durs 2, 7, 11

    def test_duration_to_alignment(self):
        dp = DurationProcessor()
        durs = jnp.asarray([2, 1, 3])
        a = np.asarray(dp.duration_to_alignment(durs, 8))
        expected = np.zeros((3, 8), np.float32)
        expected[0, 0:2] = 1
        expected[1, 2] = 1
        expected[2, 3:6] = 1
        np.testing.assert_array_equal(a, expected)
        # numpy variant matches
        np.testing.assert_array_equal(
            duration_to_alignment_np(np.array([2, 1, 3]), 8), expected
        )

    def test_prediction_to_duration_hard_vs_soft(self):
        dp = DurationProcessor()
        # strongly peaked logits at class 2 (dur 3): hard path
        logits = np.full((1, 16), -10.0, np.float32)
        logits[0, 2] = 10.0
        d = np.asarray(dp.prediction_to_duration(jnp.asarray(logits)))
        assert d[0] == 3.0
        # peaked at class 10 (dur 18 >= 7): soft expectation ~= 18
        logits = np.full((1, 16), -10.0, np.float32)
        logits[0, 10] = 10.0
        d = np.asarray(dp.prediction_to_duration(jnp.asarray(logits)))
        assert abs(d[0] - 18.0) <= 1.0
