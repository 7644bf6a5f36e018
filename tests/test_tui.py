"""Terminal toolbox UI: the TuiState controller drives the REAL toolbox
through the full interactive workflow (browse → embed → synthesize →
vocode → autotune) without curses."""
import numpy as np
import pytest

from rtvc_tpu.tui import TuiState, render_heatmap

pytestmark = pytest.mark.slow  # loads the full model triplet (~1 min)


class TestRenderHeatmap:
    def test_2d_shapes_and_glyphs(self):
        a = np.linspace(0, 1, 40).reshape(5, 8)
        rows = render_heatmap(a, width=16, height=4)
        assert len(rows) == 4 and all(len(r) == 16 for r in rows)
        # min maps to the lightest glyph, max to the darkest
        assert rows[0][0] == " " and rows[-1][-1] == "█"

    def test_1d_is_squared_up(self):
        rows = render_heatmap(np.arange(9.0), width=6, height=3)
        assert len(rows) == 3 and all(len(r) == 6 for r in rows)

    def test_constant_input_no_nan(self):
        rows = render_heatmap(np.ones((4, 4)), width=4, height=2)
        assert all(set(r) <= set(" ░▒▓█") for r in rows)


@pytest.fixture(scope="module")
def state(tmp_path_factory):
    """Real Toolbox with random-weight models + a synthetic dataset tree."""
    import jax

    from rtvc_tpu import toolbox as tb
    from rtvc_tpu.inference import encoder
    from rtvc_tpu.utils.io import save_wav_float

    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for spk, f0 in (("spk_a", 220.0), ("spk_b", 420.0)):
        d = root / spk
        d.mkdir()
        for u in range(2):
            t = np.arange(32000) / 16000
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)
                   + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
            save_wav_float(wav, d / f"utt_{u}.wav", 16000)

    import demo_cli

    box = tb.Toolbox(datasets_root=root,
                     out_dir=tmp_path_factory.mktemp("out"))
    encoder.init_random_model(seed=0)
    box.synthesizer = demo_cli.build_models_for_selftest()
    return TuiState(toolbox=box, datasets_root=root,
                    prompt_fn=lambda label: "hello from the terminal ui")


class TestWorkflow:
    def test_browser_lists_speakers_and_utterances(self, state):
        names = [p.name for p in state.speakers]
        assert "spk_a" in names and "spk_b" in names
        assert len(state.utterances) == 2

    def test_navigation_and_pane_switch(self, state):
        assert state.handle_key("TAB") and state.pane == 1
        i0 = state.utt_idx
        state.handle_key("DOWN")
        assert state.utt_idx != i0
        state.handle_key("UP")
        assert state.utt_idx == i0
        state.handle_key("TAB")

    def test_embed_synthesize_vocode_autotune(self, state):
        assert state.handle_key("ENTER")
        assert state.current is not None
        assert state.current.embed.shape == (768,)

        assert state.handle_key("s")
        assert state.last_spec is not None and state.last_spec.shape[0] == 80

        assert state.handle_key("v")
        assert state.last_rtf is not None and state.last_rtf > 0
        out = list(state.toolbox.out_dir.glob("tui_clone.wav"))
        assert out and out[0].stat().st_size > 1000

        assert state.handle_key("b")
        assert state.backend == "libwavernn"
        state.handle_key("b")

    def test_render_screen(self, state):
        lines = state.render(width=90, height=28)
        assert lines and all(len(l) <= 90 for l in lines)
        joined = "\n".join(lines)
        assert "spk_a" in joined
        assert "q=quit" in joined
        if state.current is not None:  # embed heatmap rendered
            assert any(c in joined for c in "░▒▓█")

    def test_quit(self, state):
        assert state.handle_key("q") is False
