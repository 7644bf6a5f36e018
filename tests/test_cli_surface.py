"""Entry-point surface tests: every CLI parses --help (imports + argparse
wiring) — catches breakage of the reference-compatible script surface."""
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

SCRIPTS = [
    "demo_cli.py",
    "demo_toolbox.py",
    "encoder_preprocess.py",
    "encoder_train.py",
    "synthesizer_preprocess_audio.py",
    "synthesizer_preprocess_embeds.py",
    "synthesizer_preprocess_alignments.py",
    "synthesizer_train.py",
    "vocoder_preprocess.py",
    "vocoder_train.py",
    "vocoder_convert_model.py",
    "vocoder_check_libwavernn.py",
    "bench.py",
    "bench_all.py",
    "scripts/vctk.py",
    "scripts/commonvoice_speakers.py",
    "scripts/librispeech_speakers.py",
    "scripts/textgrid_to_alignments.py",
    "scripts/convert_audio.py",
    "scripts/tedlium.py",
    "scripts/timit.py",
    "scripts/flatten_speakers.py",
    "scripts/nasjonalbank_speakers.py",
    "scripts/slr_speakers.py",
    "scripts/slr82_speakers.py",
    "scripts/clean_encoder_dataset.py",
    "scripts/merge_synthesizer_datasets.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_help_parses(script):
    if script in ("bench.py", "bench_all.py"):
        # benches have no argparse; just check they import
        res = subprocess.run(
            [sys.executable, "-c", f"import ast; ast.parse(open('{ROOT}/{script}').read())"],
            capture_output=True, text=True,
        )
        assert res.returncode == 0, res.stderr
        return
    res = subprocess.run(
        [sys.executable, str(ROOT / script), "--help"],
        capture_output=True, text=True, timeout=120,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": str(ROOT) + ":/root/.axon_site",
             "HOME": "/root"},
    )
    assert res.returncode == 0, f"{script}: {res.stderr[-500:]}"
    assert "usage" in res.stdout.lower()


def test_package_public_exports():
    import rtvc_tpu
    from rtvc_tpu import config, data, inference, models, ops, parallel, text, train, utils  # noqa: F401

    assert rtvc_tpu.__version__
