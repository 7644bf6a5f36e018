"""Config layer tests: parity of values with the reference + parse overrides."""
import dataclasses

import pytest

from rtvc_tpu.config import (
    encoder_data,
    encoder_model,
    preprocessing,
    sp,
    sv2tts,
    tacotron,
    wavernn_fatchord,
    wavernn_geneing,
    wavernn_runtimeracer,
)


def test_signal_params_match_reference():
    # ref: config/hparams.py:38-51
    assert sp.sample_rate == 16000
    assert sp.n_fft == 1024
    assert sp.num_mels == 80
    assert sp.hop_size == 200
    assert sp.win_size == 800
    assert sp.fmin == 40 and sp.fmax == 8000
    assert sp.max_abs_value == 4.0
    assert sp.preemphasis == 0.97


def test_sv2tts_embedding_size():
    assert sv2tts.speaker_embedding_size == 768  # ref: config/hparams.py:33-35


def test_encoder_params():
    assert encoder_model.model_hidden_size == 768
    assert encoder_model.model_num_layers == 3
    assert encoder_data.partials_n_frames == 160
    assert encoder_data.mel_n_channels == 40


def test_wavernn_upsample_factorises_hop():
    # ref assertion: vocoder/models/base.py:27
    for cfg in (wavernn_fatchord, wavernn_geneing, wavernn_runtimeracer):
        assert cfg.total_upsample == sp.hop_size


def test_wavernn_variant_shapes():
    assert wavernn_fatchord.rnn_dims == 512
    assert wavernn_geneing.rnn_dims == 256 and wavernn_geneing.mode == "BITS"
    assert wavernn_runtimeracer.rnn_dims == 256
    assert wavernn_runtimeracer.gen_target == 6000
    assert wavernn_runtimeracer.gen_overlap == 1000


def test_tacotron_schedule():
    assert len(tacotron.tts_schedule) == 7
    assert tacotron.tts_schedule[0] == (7, 1, 112, 1e-3, 1e-7)
    assert tacotron.stop_threshold == -3.4


def test_parse_overrides():
    cfg = sp.parse("sample_rate=22050, hop_size=275")
    assert cfg.sample_rate == 22050 and cfg.hop_size == 275
    assert sp.sample_rate == 16000  # original untouched (frozen dataclass)


def test_parse_rejects_unknown_key():
    with pytest.raises(KeyError):
        sp.parse("bogus_key=1")


def test_configs_are_hashable():
    """Configs are jit static args — they must be hashable."""
    hash(sp)
    hash(preprocessing)
    hash(wavernn_fatchord)
    assert dataclasses.is_dataclass(sp)


class TestScanUnrollPolicy:
    """Backend-aware unroll default (ops/scanning.py): TPU gets the
    round-4 sweep optimum, everything else stays at 1 (a 4x scan body
    only slows CPU compiles), env var wins over both."""

    def test_env_override_wins(self, monkeypatch):
        from rtvc_tpu.ops.scanning import scan_unroll

        monkeypatch.setenv("RTVC_SCAN_UNROLL", "3")
        assert scan_unroll() == 3

    def test_cpu_default_is_one(self, monkeypatch):
        from rtvc_tpu.ops.scanning import scan_unroll

        monkeypatch.delenv("RTVC_SCAN_UNROLL", raising=False)
        import jax

        assert jax.default_backend() == "cpu"  # tests/conftest.py pins cpu
        assert scan_unroll() == 1

    def test_tpu_default_is_sweep_optimum(self, monkeypatch):
        import rtvc_tpu.ops.scanning as scanning

        monkeypatch.delenv("RTVC_SCAN_UNROLL", raising=False)
        # scan_unroll reads jax.default_backend() directly; emulate TPU by
        # patching jax within the module's import scope.
        import jax

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert scanning.scan_unroll() == scanning._DEFAULT_UNROLL
